package graft.graph

import graft.SparkSpec

class ButterfliesSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed butterflies on a tiny bipartite graph") {
    // l1-{r1,r2,r3}, l2-{r1,r2}, l3-{r2,r3}:
    // shared(r1,r2)=2 (l1,l2) → C(2,2)=1 butterfly
    // shared(r2,r3)=2 (l1,l3) → 1 butterfly; shared(r1,r3)=1 → 0
    // wedges from left (cheaper: 3+1+1=5 ≤ right 1+3+1=5, tie → left)
    val e = Seq(
      (1L, 101L), (1L, 102L), (1L, 103L),
      (2L, 101L), (2L, 102L),
      (3L, 102L), (3L, 103L)).toDF("l", "r")
    val row = Butterflies.count(e).collect().head
    assert(row.getLong(0) === 7L)          // n_edges
    assert(row.getString(1) === "left")
    assert(row.getLong(2) === 5L)          // wedges
    assert(row.getLong(3) === 2L)          // butterflies
  }

  test("side selection flips when the right side is cheaper, count " +
    "is side-independent") {
    // one hub on the left (degree 4) vs all right degrees ≤ 2:
    // left wedges C(4,2)=6, right wedges 2 → enumerate from right
    val e = Seq(
      (1L, 101L), (1L, 102L), (1L, 103L), (1L, 104L),
      (2L, 101L), (2L, 102L)).toDF("l", "r")
    val row = Butterflies.count(e).collect().head
    assert(row.getString(1) === "right")
    // butterflies: lefts 1,2 share {101,102} → exactly 1
    assert(row.getLong(3) === 1L)
  }

  test("duplicate incidences and no shared pairs → zero butterflies") {
    val e = Seq((1L, 101L), (1L, 101L), (2L, 102L)).toDF("l", "r")
    val row = Butterflies.count(e).collect().head
    assert(row.getLong(0) === 2L && row.getLong(3) === 0L)
  }
}
