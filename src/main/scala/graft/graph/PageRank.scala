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
  *  - the dangling-mass scalar is a 1-row aggregate folded into the
  *    superstep's own plan via a broadcast cross join — with
  *    `stopTol = None` the whole run is ONE lazy plan with zero
  *    per-iteration driver actions;
  *  - with a tolerance, the only driver-side value per step is the SAD
  *    scalar (one action), and generations are cached so each step
  *    reads the previous step's materialized scores;
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
    val e0 = edges.select(col("src"), col("dst"))
    val outDeg = e0.groupBy("src")
      .agg(count(lit(1)).cast("double").as("od"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // out-degree is static — join it into the edge table ONCE, so each
    // superstep pays a single shuffle (scores⋈edges), not two; and
    // hash-partition the result by the join key so the cached layout
    // (InMemoryRelation preserves it) lets each superstep shuffle only
    // the V-sized score frame, never the E-sized edge table.
    val e = e0.join(outDeg, Seq("src"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val n = v.count().toDouble
    val tracking = stopTol.isDefined

    var scores = v.withColumn("score", snap(lit(1.0) / lit(n)))
      .localCheckpoint(false)
    var iter = 0
    var sad = Double.MaxValue
    var done = false

    while (iter < maxIter && !done) {
      // Σ over in-edges of score(src)/outdeg(src) — one shuffle keyed by dst.
      val contribs = e
        .join(scores.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("score") / col("od")).as("contrib"))

      // Dangling mass: total score on vertices with no out-edges — a
      // 1-row frame cross-joined into the plan (no driver collect).
      val dangling = scores
        .join(outDeg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
        .agg(coalesce(sum("score"), lit(0.0)).as("dm"))

      // The id universe never changes, so the new generation grows from
      // the previous one (not from v) and carries the previous score
      // along: SAD becomes a pure aggregate over the frame this
      // iteration materializes anyway — no extra join per iteration.
      val next0 = scores.select(col("id"), col("score").as("prev"))
        .join(contribs, Seq("id"), "left")
        .crossJoin(dangling)
        .withColumn("score", snap(
          lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
              col("dm") / lit(n))))
        .select("id", "prev", "score")

      // Lazy localCheckpoint: truncates the logical plan (which would
      // otherwise nest the previous generation 2x per step and grow
      // exponentially) to an RDD leaf without forcing execution; the
      // generation materializes at its first action and is stored.
      val next = next0.localCheckpoint(false)

      if (tracking) {
        sad = next.agg(sum(abs(col("score") - col("prev"))))
          .first().getDouble(0)
        if (iter > 0 && sad < stopTol.get) done = true
      }
      scores = next.select("id", "score")
      iter += 1
    }
    Result(scores, iter, sad)
  }
}
