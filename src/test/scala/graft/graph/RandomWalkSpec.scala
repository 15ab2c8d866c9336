package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomWalkSpec extends SparkSpec {
  import spark.implicits._

  test("walks follow the only available edge and stop at dead ends") {
    // path 1→2→3; walks of length 4: walk(1) = 1,2,3 then stops.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val v = RandomWalk.walks(edges, steps = 4, seed = "s")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(v == Set(
      (1L, 0, 1L), (1L, 1, 2L), (1L, 2, 3L),
      (2L, 0, 2L), (2L, 1, 3L),
      (3L, 0, 3L)))
  }

  test("deterministic: same seed same walks; different seed may diverge") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(e => e._1 != e._2).distinct.toDF("src", "dst")
    def run(seed: String) =
      RandomWalk.walks(edges, steps = 3, seed = seed)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run("a") == run("a"))
    assert(run("a") != run("b")) // 12 walks x 3 choices: collision ~0
  }

  test("every step's choice is an actual out-neighbor of the previous vertex") {
    val rnd = new scala.util.Random(11)
    val edgeSeq = Seq.fill(40)((rnd.nextInt(10).toLong, rnd.nextInt(10).toLong))
      .filter(e => e._1 != e._2).distinct
    val adj = edgeSeq.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val walks = RandomWalk.walks(edgeSeq.toDF("src", "dst"), steps = 3, seed = "s")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (s, rows) =>
        s -> rows.sortBy(_._2).map(_._3).toSeq }
    walks.values.foreach { path =>
      path.zip(path.tail).foreach { case (a, b) =>
        assert(adj.getOrElse(a, Set.empty).contains(b), s"$a -> $b not an edge")
      }
    }
  }
}
