package graft.graph

import graft.SparkSpec

class CommunitiesSpec extends SparkSpec {
  import spark.implicits._

  private def lpa(es: Seq[(Long, Long)], rounds: Int = 4): Map[Long, Long] =
    Communities.labelPropagation(es.toDF("src", "dst"), rounds)
      .as[(Long, Long)].collect().toMap

  test("two triangles with a bridge resolve to two communities") {
    val es = Seq[(Long, Long)](
      (1, 2), (1, 3), (2, 3), // triangle A
      (4, 5), (4, 6), (5, 6), // triangle B
      (3, 4)) // bridge
    // Hand-traced: round 1 floods min labels (v4 briefly takes 3 via
    // the bridge), round 2 the triangle majorities win it back, round 3
    // is stable: A keeps label 1, B keeps label 4.
    assert(lpa(es, rounds = 3) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("a star collapses to the hub-rooted community in one round") {
    val es = Seq[(Long, Long)]((0, 1), (0, 2), (0, 3), (0, 4))
    assert(lpa(es, rounds = 2).values.toSet == Set(0L))
  }

  test("self-vote damps the bipartite oscillation on an even cycle") {
    // Pure synchronous LPA flips a 2-coloring of C4 forever; with the
    // self-vote the min label wins and the cycle unifies by round 2.
    val es = Seq[(Long, Long)]((1, 2), (2, 3), (3, 4), (4, 1))
    assert(lpa(es, rounds = 2).values.toSet == Set(1L))
    assert(lpa(es, rounds = 4).values.toSet == Set(1L)) // and stays put
  }

  test("disconnected components never share a label") {
    val m = lpa(Seq[(Long, Long)]((1, 2), (3, 4)), rounds = 3)
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("deterministic: repeated runs agree exactly") {
    val es = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (2, 7))
    assert(lpa(es) == lpa(es))
  }
}
