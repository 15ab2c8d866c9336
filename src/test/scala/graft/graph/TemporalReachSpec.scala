package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalReachSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)],
                  seeds: Seq[(Long, Long)], rounds: Int = 3) =
    TemporalReach.earliestArrival(
        edges.toDF("src", "dst", "ts"),
        seeds.toDF("id", "arr"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("edges firing before arrival are not traversable") {
    // 1 →(t=5)→ 2 →(t=3)→ 3 : plain BFS reaches 3, temporal does not
    val got = run(Seq((1L, 2L, 5L), (2L, 3L, 3L)), Seq((1L, 0L)))
    assert(got === Map(1L -> 0L, 2L -> 5L))
  }

  test("earliest arrival wins across alternative paths") {
    // two routes to 4: via 2 (arrive 10) and via 3 (arrive 7)
    val got = run(Seq(
      (1L, 2L, 2L), (2L, 4L, 10L),
      (1L, 3L, 5L), (3L, 4L, 7L)), Seq((1L, 0L)))
    assert(got(4L) === 7L)
  }

  test("equal-time hop is allowed (ts >= arrival) and seeds keep " +
    "their start time") {
    val got = run(Seq((1L, 2L, 4L), (2L, 3L, 4L)), Seq((1L, 4L)))
    assert(got === Map(1L -> 4L, 2L -> 4L, 3L -> 4L))
  }

  test("a later-seeded vertex does not lower an earlier arrival") {
    // 2 is seeded at 9 but also reached at 5 via 1 — min wins
    val got = run(Seq((1L, 2L, 5L)), Seq((1L, 0L), (2L, 9L)))
    assert(got(2L) === 5L)
  }

  test("hop bound limits propagation") {
    val chain = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (4L, 5L, 4L))
    val got = run(chain, Seq((1L, 0L)), rounds = 2)
    assert(got.keySet === Set(1L, 2L, 3L))
  }
}
