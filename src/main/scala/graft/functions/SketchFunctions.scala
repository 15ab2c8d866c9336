package graft.functions

import org.apache.spark.sql.Column

/** Engine-facing sketch aggregates backed by native Catalyst
  * `TypedImperativeAggregate`s (see
  * `org.apache.spark.sql.graftagg.HllSketchAgg`). */
object SketchFunctions {
  /** One-pass mergeable HyperLogLog distinct estimate of a STRING
    * column; returns struct(nonzero_regs, zero_regs, est_micros),
    * bit-identical to `Sketches.hllDistinct` and its DuckDB oracle.
    * Use under `.agg(...)`, grouped or global. */
  def hllDistinct(c: Column, p: Int = 10): Column =
    org.apache.spark.sql.graftagg.AggBridge.hllDistinct(c, p)

  /** One-pass mergeable k-minimum-values distinct estimate of a STRING
    * column; returns struct(k_used, kth_h, est_distinct), bit-identical
    * to `Sketches.kmvDistinct`. */
  def kmvDistinct(c: Column, k: Int = 1024): Column =
    org.apache.spark.sql.graftagg.AggBridge.kmvDistinct(c, k)

  /** One-pass mergeable DDSketch quantiles of a DOUBLE column at
    * relative-error alpha; returns array<struct(q_pct, bucket,
    * est_micros)> (explode to rows), bit-identical to
    * `Sketches.ddQuantiles`. */
  def ddQuantiles(c: Column, alpha: Double, pcts: Seq[Int]): Column =
    org.apache.spark.sql.graftagg.AggBridge.ddQuantiles(c, alpha, pcts)
}
