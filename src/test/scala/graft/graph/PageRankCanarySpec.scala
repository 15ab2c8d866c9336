package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's convergence canary transcribed
  * (`pagerank/calculator_test.go:141-143,197-251`): 100,000 vertices
  * with up to 7 random out-links each (seeded), 32-way parallelism —
  * must converge under the default SAD < 1e-3, scores must sum to 1. */
class PageRankCanarySpec extends SparkSpec {
  import spark.implicits._

  test("100k-vertex canary converges with mass conserved") {
    val n = 100000
    val verts = spark.range(n).select(col("id").cast("string").as("id"))
    // ≤7 deterministic pseudo-random out-links per vertex
    val edges = spark.range(n)
      .select(col("id"), explode(sequence(lit(1),
        (pmod(xxhash64(col("id")), lit(7)) + 1).cast("int"))).as("j"))
      .select(col("id").cast("string").as("src"),
        pmod(xxhash64(concat(col("id"), lit(":"), col("j"))), lit(n))
          .cast("string").as("dst"))
      .filter(col("src") =!= col("dst"))
    val t0 = System.nanoTime()
    val r = PageRank.run(verts, edges, maxIter = 60, stopTol = Some(1e-3))
    val total = r.scores.agg(sum("score")).first().getDouble(0)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"converged in ${r.iterations} supersteps, $secs%.1f s, " +
      f"SAD=${r.sad}%.2e, mass=$total%.6f")
    assert(r.sad < 1e-3, "did not converge")
    assert(r.iterations < 60)
    assert(math.abs(total - 1.0) < 1e-3)
  }
}
