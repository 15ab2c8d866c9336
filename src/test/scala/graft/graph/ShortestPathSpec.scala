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

  test("paths rebuild the shortest route, not the direct edge") {
    val e = Seq(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 5L),
      ("d", "a", 1L)).toDF("src", "dst", "w")
    val st = ShortestPath.state(e, "a", maxHops = 5)
    val p = ShortestPath.paths(st, maxSteps = 5)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(p === Map("a" -> "a", "b" -> "a->b", "c" -> "a->b->c"))
    assert(ShortestPath.pathTo(st, "c", 5) === Some(Seq("a", "b", "c")))
    assert(ShortestPath.pathTo(st, "zzz", 5) === None)
  }

  test("equal-cost tie breaks to the smallest predecessor id") {
    // d is at distance 2 via b or via c: prev must be min("b","c") = b.
    val e = Seq(("a", "b", 1L), ("a", "c", 1L),
      ("b", "d", 1L), ("c", "d", 1L)).toDF("src", "dst", "w")
    val st = ShortestPath.state(e, "a", maxHops = 4)
    assert(ShortestPath.pathTo(st, "d", 4) === Some(Seq("a", "b", "d")))
  }

  test("negative edge weights are rejected up front") {
    val e = Seq(("a", "b", -1L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      ShortestPath.state(e, "a", maxHops = 3)
    }
  }
}
