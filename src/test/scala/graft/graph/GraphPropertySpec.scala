package graft.graph

import graft.SparkSpec

/** Randomized cross-checks of the iterative graph operators against
  * straightforward driver-side reference algorithms — seeded, so
  * failures reproduce. Complements the golden specs: these sweep many
  * graph shapes (self-contained components, long chains, dense pockets)
  * the hand-built fixtures don't. */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomGraph(seed: Int, n: Int, m: Int): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    (1 to m).map { _ =>
      (s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}")
    }.filter { case (a, b) => a != b }.distinct
  }

  test("components match a driver-side union-find on random graphs") {
    for (seed <- Seq(1, 7, 42)) {
      val pairs = randomGraph(seed, n = 60, m = 80)
      if (pairs.nonEmpty) {
        // reference: union-find over the same undirected pairs
        val parent = scala.collection.mutable.Map[String, String]()
        def find(x: String): String = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(if (ra < rb) rb else ra) =
            if (ra < rb) ra else rb
        }
        val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        val expected = verts.groupBy(find).flatMap { case (_, vs) =>
          val canonical = vs.min
          vs.map(_ -> canonical)
        }
        // min-label propagation: component = MIN id, so re-canonicalize
        // the union-find roots by each class's minimum member
        val got = Components.run(pairs.toDF("a", "b"), maxRounds = 60)
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        assert(got === expected, s"seed=$seed")
      }
    }
  }

  test("shortest-path distances match driver-side Dijkstra on random graphs") {
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val edges = randomGraph(seed + 100, n = 40, m = 70)
        .map { case (a, b) => (a, b, (rnd.nextInt(9) + 1).toLong) }
      if (edges.nonEmpty) {
        val src = edges.map(_._1).min
        // reference: Dijkstra
        val adj = edges.groupBy(_._1)
          .map { case (k, es) => k -> es.map(e => (e._2, e._3)) }
          .withDefaultValue(Seq.empty)
        val dist = scala.collection.mutable.Map(src -> 0L)
        val pq = scala.collection.mutable.PriorityQueue((0L, src))(
          Ordering.by(-_._1))
        while (pq.nonEmpty) {
          val (d, u) = pq.dequeue()
          if (d == dist(u)) adj(u).foreach { case (v, w) =>
            if (dist.get(v).forall(_ > d + w)) {
              dist(v) = d + w; pq.enqueue((d + w, v))
            }
          }
        }
        val got = ShortestPath.run(edges.toDF("src", "dst", "w"), src,
            maxHops = 50)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got === dist.toMap, s"seed=$seed")
      }
    }
  }

  test("coloring is proper, total, and deterministic on random graphs") {
    for (seed <- Seq(4, 19)) {
      val es = randomGraph(seed + 200, n = 50, m = 120)
      if (es.nonEmpty) {
        val edges = es.toDF("src", "dst")
        val verts = es.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id")
        def colorMap() = Coloring.run(verts, edges)
          .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
        val c = colorMap()
        assert(c.keySet === es.flatMap(e => Seq(e._1, e._2)).toSet)
        es.foreach { case (a, b) =>
          assert(c(a) != c(b), s"seed=$seed edge ($a,$b) monochrome")
        }
        assert(colorMap() === c, s"seed=$seed nondeterministic")
      }
    }
  }

  test("pagerank conserves probability mass on random graphs") {
    for (seed <- Seq(6, 23)) {
      val es = randomGraph(seed + 300, n = 40, m = 60)
      val verts = (0 until 40).map(i => s"v$i").toDF("id")
      val r = PageRank.run(verts, es.toDF("src", "dst"),
        maxIter = 40, stopTol = Some(1e-9))
      val scores = r.scores.collect().map(_.getDouble(1))
      assert(scores.length == 40)
      assert(scores.forall(_ > 0))
      assert(math.abs(scores.sum - 1.0) < 1e-6, s"seed=$seed sum=${scores.sum}")
    }
  }

  test("reconstructed path cost equals the reported distance") {
    val rnd = new scala.util.Random(5)
    val edges = randomGraph(500, n = 30, m = 60)
      .map { case (a, b) => (a, b, (rnd.nextInt(5) + 1).toLong) }
    val src = edges.map(_._1).min
    val wOf = edges.groupBy(e => (e._1, e._2))
      .map { case (k, es) => k -> es.map(_._3).min }
    val st = ShortestPath.state(edges.toDF("src", "dst", "w")
      .groupBy("src", "dst").agg(org.apache.spark.sql.functions
        .min("w").as("w")), src, maxHops = 40)
    ShortestPath.paths(st, maxSteps = 40).collect().foreach { r =>
      val (id, dist, path) =
        (r.getString(0), r.getLong(1), r.getString(2).split("->").toSeq)
      assert(path.head == src && path.last == id, s"path endpoints for $id")
      val cost = path.sliding(2).collect { case Seq(a, b) => wOf((a, b)) }.sum
      assert(cost == dist, s"path cost $cost != dist $dist for $id ($path)")
    }
  }
}
