package graft.graph

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains and cliques collapse to min-id components") {
    // chain 1-2-3-4, pair 10-11, isolated-pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L))
      .toDF("a", "b")
    val got = Components.run(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("resume from a converged snapshot matches the cold fixpoint — " +
    "including a delta edge that merges two settled components") {
    // G0: chain 1-2-3, chain 10-11-12, pair 20-21 (three components).
    val g0 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (20L, 21L))
      .toDF("a", "b")
    // Delta: 3-10 merges the first two components (label 1 must travel
    // through the whole settled 10-11-12 chain), and 30-31 introduces
    // two brand-new vertices absent from the snapshot.
    val delta = Seq((3L, 10L), (30L, 31L)).toDF("a", "b")
    val all = g0.union(delta)
    val snapshot = Components.run(g0)
    val warm = Components.resume(all, snapshot, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold = Components.run(all)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm === cold)
    assert(warm(12L) === 1L, "merged component must carry the global min")
    assert(warm(31L) === 30L, "new vertices must label from the delta")
  }

  test("fixed-round lazy mode matches early-stop mode") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val lazyRun = Components.run(pairs, maxRounds = 6, earlyStop = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val eager = Components.run(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lazyRun === eager)
  }
}
