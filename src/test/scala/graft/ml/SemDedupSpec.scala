package graft.ml

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated centroids on the first two axes.
  private def cents = Seq(
    (0L, Array(1.0, 0.0, 0.0, 0.0)),
    (1L, Array(0.0, 1.0, 0.0, 0.0))).toDF("cluster", "centroid")

  private def emb = Seq(
    (1L, Array(1.0f, 0.01f, 0.0f, 0.0f)),   // cluster 0
    (2L, Array(0.99f, 0.012f, 0.0f, 0.0f)), // cluster 0, ~dup of 1
    (3L, Array(0.5f, 0.5f, 0.5f, 0.5f)),    // cluster 0 (tie → min id)
    (4L, Array(0.0f, 1.0f, 0.0f, 0.0f)),    // cluster 1
    (5L, Array(0.0f, 0.999f, 0.01f, 0.0f)), // cluster 1, ~dup of 4
    (6L, Array(0.71f, 0.70f, 0.0f, 0.0f)),  // cluster 0 ┐ near pair split
    (7L, Array(0.70f, 0.71f, 0.0f, 0.0f))   // cluster 1 ┘ across clusters
  ).toDF("vec_id", "embedding")

  test("drops the larger id of each intra-cluster near-dup pair") {
    val out = SemDedup.prune(emb, cents, minCos = 0.9).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((0L, true)))
    assert(out(2L) == ((0L, false))) // near-dup of 1, larger id
    assert(out(3L) == ((0L, true))) // same cluster but not near
    assert(out(4L) == ((1L, true)))
    assert(out(5L) == ((1L, false))) // near-dup of 4, larger id
  }

  test("a near pair split across clusters is kept — the method's recall boundary") {
    val out = SemDedup.prune(emb, cents, minCos = 0.9).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(6L) == ((0L, true)))
    assert(out(7L) == ((1L, true)))
  }

  test("pair generation is cluster-keyed — never a cartesian") {
    val plan = SemDedup.prune(emb, cents, minCos = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
