package graft.graph

import graft.SparkSpec

class BetweennessSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  rounds: Int = 4): Map[Long, Long] =
    Betweenness.landmark(
        edges.toDF("src", "dst"), seeds.toDF("id"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph from one end matches hand-computed Brandes deltas") {
    // a-b-c-d-e from seed a: delta(b)=3, delta(c)=2, delta(d)=1, delta(e)=0
    val bc = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), Seq(1L))
    assert(bc === Map(2L -> 3000000L, 3L -> 2000000L, 4L -> 1000000L,
      5L -> 0L))
  }

  test("diamond splits dependency across the two equal paths") {
    // a-{b,c}-d: sigma(d)=2, so delta(b)=delta(c)=1/2
    val bc = run(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), Seq(1L))
    assert(bc === Map(2L -> 500000L, 3L -> 500000L, 4L -> 0L))
  }

  test("multiple seeds accumulate and the seed's own dependency is dropped") {
    val bc = run(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), Seq(1L, 4L))
    assert(bc === Map(1L -> 0L, 2L -> 1000000L, 3L -> 1000000L, 4L -> 0L))
  }

  test("rounds bound truncates the horizon, not correctness within it") {
    // path a-b-c-d-e with rounds=2 from a: BFS stops at c.
    // delta(c)=0 (no deeper level), delta(b)=1*(1+0)=1.
    val bc = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), Seq(1L),
      rounds = 2)
    assert(bc === Map(2L -> 1000000L, 3L -> 0L))
  }
}
