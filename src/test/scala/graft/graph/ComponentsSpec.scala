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

  test("fixed-round lazy mode matches early-stop mode") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val lazyRun = Components.run(pairs, maxRounds = 6, earlyStop = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val eager = Components.run(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lazyRun === eager)
  }
}
