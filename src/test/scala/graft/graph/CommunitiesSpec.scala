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

  private def modOf(es: Seq[(Long, Long)],
                    labs: Seq[(Long, Long)]): (Long, Long, Long) = {
    val r = Communities.modularity(es.toDF("src", "dst"),
      labs.toDF("id", "community")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("modularity: two clean triangles under the perfect partition = 1/2") {
    // m = 6, each community: m_c = 3, d_c = 6 →
    // Q = 2·(4·6·3 − 36)/(4·36) = 72/144 = 0.5
    val es = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1),
      (4, 5), (5, 6), (6, 4))
    val labs = Seq[(Long, Long)](1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L)
    assert(modOf(es, labs) == ((6L, 2L, 500000L)))
  }

  test("modularity: the all-in-one partition scores exactly zero") {
    val es = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1), (3, 4))
    val labs = Seq[(Long, Long)](1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L)
    val (m, nc, q) = modOf(es, labs)
    assert(m == 4L && nc == 1L && q == 0L)
  }

  test("modularity: splitting a community across an edge scores negative") {
    // a single edge with each endpoint alone: m_c = 0 both sides,
    // d_c = 1 each → Q = 2·(0 − 1)/4 = −0.5
    val (_, _, q) = modOf(Seq((1L, 2L)),
      Seq[(Long, Long)](1L -> 1L, 2L -> 2L))
    assert(q == -500000L)
  }
}
