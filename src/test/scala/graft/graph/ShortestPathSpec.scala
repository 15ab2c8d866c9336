package graft.graph

import graft.SparkSpec

class ShortestPathSpec extends SparkSpec {
  import spark.implicits._

  test("relaxation finds multi-hop minimum, unreachable absent") {
    // a-1->b-1->c (cost 2) beats a-5->c; d unreachable.
    val e = Seq(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 5L),
      ("d", "a", 1L)).toDF("src", "dst", "w")
    val d = ShortestPath.run(e, "a", maxHops = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d === Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("early-stop equals fixed-point result") {
    val e = Seq(("a", "b", 3L), ("b", "c", 4L)).toDF("src", "dst", "w")
    val d10 = ShortestPath.run(e, "a", maxHops = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d10 === Map("a" -> 0L, "b" -> 3L, "c" -> 7L))
  }
}
