package graft.graph

import graft.SparkSpec

class HitsSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-computed reference on a 4-vertex graph:
    * edges 1→3, 2→3, 2→4, 3→4.
    * h0 = 1 everywhere.
    * a1: 3 ← h(1)+h(2) = 2; 4 ← h(2)+h(3) = 2.
    * h1: 1 ← a(3) = 2; 2 ← a(3)+a(4) = 4; 3 ← a(4) = 2.
    * a2: 3 ← h(1)+h(2) = 6; 4 ← h(2)+h(3) = 6.
    * h2: 1 ← 6; 2 ← 12; 3 ← 6.
    */
  test("two exact integer iterations match hand computation") {
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val got = Hits.run(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(
      1L -> (6L, 0L), 2L -> (12L, 0L), 3L -> (6L, 6L), 4L -> (0L, 6L)))
  }

  test("bipartite graph: sources have auth 0, sinks have hub 0") {
    val edges = Seq((0L, 11L), (0L, 12L), (2L, 11L), (4L, 12L), (4L, 13L))
      .toDF("src", "dst")
    val rows = Hits.run(edges, iters = 3).collect()
    rows.foreach { r =>
      val (id, hub, auth) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (id < 10) { assert(auth === 0L); assert(hub > 0L) }
      else { assert(hub === 0L); assert(auth > 0L) }
    }
    // popular dst (11: in-deg 2 from hubs 0,2) outranks 13 (one weak hub)
    val byId = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(11L) > byId(13L))
  }

  test("overflow guard rejects an iteration count the degrees cannot carry") {
    // star: 1 hub fanning to 40 dsts, 40 srcs feeding one dst → growth
    // bound is large; 40 iterations must be rejected, 3 accepted.
    val fan = (1 to 40).map(i => (100L, i.toLong)) ++
      (1 to 40).map(i => (i.toLong + 200L, 500L))
    val edges = fan.toDF("src", "dst")
    intercept[IllegalArgumentException] { Hits.run(edges, iters = 40) }
    assert(Hits.run(edges, iters = 3).count() > 0)
  }
}
