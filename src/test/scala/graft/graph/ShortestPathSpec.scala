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

  test("zero-weight cycles cannot corrupt the predecessor tree") {
    // z-0->b, b-0->a, a-0->b: with prev-only tie-breaking, round 3's
    // candidate (dist 0, prev "a") would displace b's true prev "z"
    // ("a" < "z") and create an a<->b back-pointer cycle; the hop
    // tie-break keeps the earliest route, so walks always reach z.
    val e = Seq(("z", "b", 0L), ("b", "a", 0L), ("a", "b", 0L))
      .toDF("src", "dst", "w")
    val st = ShortestPath.state(e, "z", maxHops = 6)
    val p = ShortestPath.paths(st, maxSteps = 6)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(p === Map("z" -> "z", "b" -> "z->b", "a" -> "z->b->a"))
  }

  test("negative edge weights are rejected up front") {
    val e = Seq(("a", "b", -1L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      ShortestPath.state(e, "a", maxHops = 3)
    }
  }
}
