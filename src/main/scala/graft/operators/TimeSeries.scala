package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series densification (gap filling): expand a sparse per-key
  * integer time series to one row per tick in the key's own observed
  * [min(t), max(t)] span, filling the missing ticks — the resample /
  * "make the series dense" pass every downstream window, EWMA, or
  * day-over-day computation silently assumes (a lag() over a sparse
  * series compares non-adjacent days).
  *
  * Shape: one bounds agg per key + a per-key `sequence` explode + one
  * co-keyed left join — no window. Emitted volume is Σ spans (keys ×
  * their tick ranges), linear and known up front; the explode is
  * bounded by the calendar span, never by |rows|. At 100 TB each stage
  * shuffles on (keys) or (keys, t) — plain hash exchanges.
  */
object TimeSeries {

  /** One row per key per tick in the key's observed span. Measures
    * carry through where the tick existed; `fill` supplies values for
    * the synthesized ticks (column → fill expression, typically 0);
    * `gapCol` (when set) names a boolean column marking synthesized
    * rows. */
  def gapFill(series: DataFrame, keys: Seq[String], timeCol: String,
              fill: Map[String, Column] = Map.empty,
              gapCol: Option[String] = Some("is_gap")): DataFrame = {
    val marked = series.withColumn("__present", lit(true))
    val bounds = series.groupBy(keys.map(col): _*)
      .agg(min(col(timeCol)).as("__t0"), max(col(timeCol)).as("__t1"))
    val dense = bounds.select(keys.map(col) :+
      explode(sequence(col("__t0"), col("__t1"))).as(timeCol): _*)
    val joined = dense.join(marked, keys :+ timeCol, "left")
    val flagged = gapCol.fold(joined)(g =>
      joined.withColumn(g, col("__present").isNull))
    fill.foldLeft(flagged) { case (df, (c, v)) =>
      df.withColumn(c, coalesce(col(c), v))
    }.drop("__present")
  }

  /** Peak concurrency per key: the maximum number of intervals
    * simultaneously open, by the classic sweep-line — each interval
    * becomes (+1 at start, −1 past end), deltas are pre-summed per
    * (key, instant) so equal timestamps carry no ordering ambiguity,
    * and the answer is the max prefix sum. Ends are INCLUSIVE: the −1
    * lands at `endExclusive` = end + one tick, supplied by the caller
    * (so an interval ending exactly when another starts still counts
    * as overlapping at that instant).
    *
    * Scale shape: JOIN-FREE — where the naive formulation self-joins
    * intervals (quadratic under skew), this is one union, one
    * (key, t) pre-agg, one per-key window, one max agg: every stage a
    * plain hash exchange on the key, linear in |intervals|. The window
    * partition is a key's DISTINCT event instants (≤ 2 per interval),
    * so even a hot key with millions of intervals collapses to its
    * timeline before the sort.
    */
  def peakConcurrency(intervals: DataFrame, keys: Seq[String],
                      startCol: String, endExclusiveCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deltas = intervals
      .select(keys.map(col) :+ col(startCol).as("__t") :+
        lit(1L).as("__d"): _*)
      .unionAll(intervals.select(keys.map(col) :+
        col(endExclusiveCol).as("__t") :+ lit(-1L).as("__d"): _*))
    val perInstant = deltas.groupBy(keys.map(col) :+ col("__t"): _*)
      .agg(sum("__d").as("__d"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perInstant.withColumn("__run", sum("__d").over(w))
      .groupBy(keys.map(col): _*)
      .agg(max("__run").as("peak"))
  }

  /** Time-weighted average of an irregularly-sampled integer measure
    * per key — trapezoidal integration over the key's observed span,
    * the correct "average sensor reading / average balance / average
    * queue depth" when samples are NOT equally spaced (a plain avg()
    * over-weights bursts):
    *   twa = Σᵢ (vᵢ + vᵢ₊₁)·(tᵢ₊₁ − tᵢ) / (2·(t_n − t₀))
    * The numerator is EXACT integer arithmetic (value units × µs,
    * DECIMAL(38,0) sums); the single final divide runs on bit-identical
    * operands, so the micros snap is engine-portable.
    *
    * Shape: one keyed window (lead) + one keyed agg — both on the same
    * key exchange. Keys with one sample (zero span) return NULL.
    * Ordering ties break on `tieCol` so duplicate timestamps are
    * deterministic on both engines.
    *
    * @return (keys…, n_samples, span_us, twa_micros)
    */
  def timeWeightedAvg(series: DataFrame, keys: Seq[String],
                      timeUsCol: String, value: Column,
                      tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val stepped = series
      .select(keys.map(col) ++ Seq(col(timeUsCol).as("__t"),
        value.as("__v"), col(tieCol).as("__tie")): _*)
      .withColumn("__tn", lead("__t", 1).over(
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__t"), col("__tie"))))
      .withColumn("__vn", lead("__v", 1).over(
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__t"), col("__tie"))))
    stepped.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_samples"),
        (max("__t") - min("__t")).as("span_us"),
        sum(((col("__v") + col("__vn")).cast(dec) *
          (col("__tn") - col("__t")).cast(dec))).as("__num"))
      .select(keys.map(col) ++ Seq(col("n_samples"), col("span_us"),
        when(col("span_us") > 0,
          graft.util.Exact.micros(col("__num").cast("double") /
            (lit(2).cast(dec) * col("span_us").cast(dec)).cast("double")))
          .as("twa_micros")): _*)
  }
}
