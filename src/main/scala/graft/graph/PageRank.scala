package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank with dead-end (dangling) mass redistribution and
  * sum-of-absolute-differences convergence — the reference semantics of
  * uSearch's BSP implementation (`pagerank/compute.go:24-103`: damped
  * formula `(1-d)/N + d·Σmsgs + d·residual` where the residual is the
  * dangling-vertex mass spread over all N vertices; convergence when
  * `SAD < tol` — `pagerank/calculator.go:99-111`). Scores sum to 1.
  *
  * NOT GraphX's built-in PageRank: that variant neither redistributes
  * dead-end mass nor normalizes to Σ=1.
  *
  * Pure-DataFrame loop, designed distributed-first:
  *  - edges + out-degrees are computed once and persisted;
  *  - each superstep is one shuffle: contributions grouped by dst
  *    (map-side partial aggregation applies);
  *  - the only driver-side values are scalars (N, dangling mass, SAD);
  *  - lineage is cut with `localCheckpoint` every `checkpointEvery`
  *    iterations so long runs don't blow the plan stack.
  *
  * `gridSnap = Some(g)` snaps every score to the 1/g grid each iteration
  * (`floor(x·g + 0.5)/g`) making results bit-reproducible across engines
  * (used by the DuckDB oracle; harmless 1e-9 perturbation otherwise).
  */
object PageRank {

  final case class Result(scores: DataFrame, iterations: Int, sad: Double)

  def run(vertices: DataFrame, edges: DataFrame,
          damping: Double = 0.85,
          maxIter: Int = 20,
          stopTol: Option[Double] = Some(1e-3),
          gridSnap: Option[Double] = None,
          checkpointEvery: Int = 5): Result = {

    def snap(c: Column): Column =
      gridSnap.map(g => floor(c * g + 0.5) / g).getOrElse(c)

    val v = vertices.select(col("id")).persist(StorageLevel.MEMORY_AND_DISK)
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy("src")
      .agg(count(lit(1)).cast("double").as("od"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val n = v.count().toDouble

    var scores = v.withColumn("score", snap(lit(1.0) / lit(n)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var sad = Double.MaxValue
    var done = false

    while (iter < maxIter && !done) {
      // Σ over in-edges of score(src)/outdeg(src) — one shuffle keyed by dst.
      val contribs = e
        .join(scores.withColumnRenamed("id", "src"), Seq("src"))
        .join(outDeg, Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("score") / col("od")).as("contrib"))

      // Dangling mass: total score sitting on vertices with no out-edges.
      val dm = scores
        .join(outDeg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
        .agg(coalesce(sum("score"), lit(0.0))).first().getDouble(0)

      val next0 = v.join(contribs, Seq("id"), "left")
        .withColumn("score", snap(
          lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) + lit(dm / n))))
        .select("id", "score")
      val next = (if ((iter + 1) % checkpointEvery == 0) next0.localCheckpoint()
                  else next0).persist(StorageLevel.MEMORY_AND_DISK)

      stopTol.foreach { tol =>
        sad = next.join(scores.withColumnRenamed("score", "prev"), Seq("id"))
          .agg(sum(abs(col("score") - col("prev")))).first().getDouble(0)
        if (iter > 0 && sad < tol) done = true
      }
      scores.unpersist()
      scores = next
      iter += 1
    }
    v.unpersist(); e.unpersist(); outDeg.unpersist()
    Result(scores, iter, sad)
  }
}
