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

  /** Total covered duration per key: the LENGTH of the union of the
    * key's (possibly overlapping) intervals — the SLA-uptime /
    * busy-time / sensor-coverage measure that a plain Σ(end − start)
    * over-counts wherever intervals overlap. Same join-free sweep-line
    * as [[peakConcurrency]]: signed deltas, per-(key, instant) pre-agg,
    * then one keyed window that both runs the prefix sum and leads to
    * the next instant — a segment [t, next_t) counts iff the running
    * open-count is positive. Intervals are half-open [start, end);
    * zero-length inputs contribute nothing. All integer arithmetic.
    */
  def coveredDuration(intervals: DataFrame, keys: Seq[String],
                      startCol: String, endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deltas = intervals
      .select(keys.map(col) :+ col(startCol).as("__t") :+
        lit(1L).as("__d"): _*)
      .unionAll(intervals.select(keys.map(col) :+
        col(endCol).as("__t") :+ lit(-1L).as("__d"): _*))
    val perInstant = deltas.groupBy(keys.map(col) :+ col("__t"): _*)
      .agg(sum("__d").as("__d"))
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"))
    perInstant
      .withColumn("__run", sum("__d").over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__next", lead(col("__t"), 1).over(byKey))
      .groupBy(keys.map(col): _*)
      .agg(sum(when(col("__run") > 0 && col("__next").isNotNull,
        col("__next") - col("__t")).otherwise(0L)).as("covered"))
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

  /** Lag-k autocorrelation of a regularly-ticked integer series —
    * the seasonality / burst-memory probe (does yesterday predict
    * today?). Pearson r between (x_t, x_{t+lag}) for each requested
    * lag, in the exact-integer-moment discipline of
    * [[Stats.corrMatrix]]: the lagged pairing is an EQUI-join
    * (t + lag = t'), never a window over a global ordering — the
    * series (already aggregated to ticks) shuffles once on the tick
    * key with the lag set exploded alongside, so k lags cost one join
    * and one k-row aggregation, and the float tail is IEEE ops on
    * bit-identical BIGINT moments.
    *
    * @param series one row per tick: (tick: long, x: long)
    * @return (lag, n_pairs, acf_micros), one row per lag
    */
  def autocorr(series: DataFrame, tickCol: String, xCol: String,
               lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0), s"positive lags: $lags")
    val dec = "decimal(38,0)"
    val left = series.select(col(tickCol).as("__t"), col(xCol).as("__x"))
      .withColumn("lag", explode(array(lags.map(lit(_)): _*)))
      .withColumn("__tj", col("__t") + col("lag"))
    val right = series.select(col(tickCol).as("__tj"),
      col(xCol).as("__y"))
    val m = left.join(right, "__tj")
      .groupBy("lag")
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum((col("__x") * col("__x")).cast(dec)).as("__sxx"),
        sum((col("__y") * col("__y")).cast(dec)).as("__syy"),
        sum((col("__x") * col("__y")).cast(dec)).as("__sxy"))
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val dx = sqrt((col("__n") * col("__sxx") -
      col("__sx") * col("__sx")).cast("double"))
    val dy = sqrt((col("__n") * col("__syy") -
      col("__sy") * col("__sy")).cast("double"))
    m.select(col("lag"), col("__n").cast("long").as("n_pairs"),
      graft.util.Exact.micros(num / (dx * dy)).as("acf_micros"))
  }

  /** CUSUM change-point statistic over an ordered integer series, in
    * FULLY integer arithmetic — zero floats anywhere: the classic
    * centered cumulative sum S_t = Σ_{i≤t}(x_i − x̄) is rescaled by n
    * to dodge the float mean,
    *   S'_t = n·P_t − t·T   (P_t = prefix sum, T = total, t = rank),
    * which preserves the arg-max exactly. The biggest |S'_t| marks the
    * most likely level-shift boundary (Page 1954 / Taylor's CUSUM
    * change detection).
    *
    * Shape note: the prefix sum is ONE window over the series — which
    * by contract is already aggregated to ticks (days, hours), so the
    * window partition is calendar-bounded, the [[peakConcurrency]]
    * argument, not |rows|-bounded. DECIMAL(38,0) keeps n·P_t exact at
    * any realistic scale.
    *
    * @return one row per tick: (tick, x, cusum_scaled: long)
    */
  def cusum(series: DataFrame, tickCol: String, xCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val w = Window.orderBy(col(tickCol))
    val totals = series.agg(
      sum(col(xCol).cast(dec)).as("__tot"),
      count(lit(1)).cast(dec).as("__n"))
    series.select(col(tickCol), col(xCol))
      .withColumn("__p", sum(col(xCol).cast(dec)).over(w))
      .withColumn("__r", row_number().over(w).cast(dec))
      .crossJoin(broadcast(totals))
      .select(col(tickCol), col(xCol),
        (col("__n") * col("__p") - col("__r") * col("__tot"))
          .cast("long").as("cusum_scaled"))
  }

  /** Mann–Kendall trend test over an ordered integer series — the
    * distribution-free "is this metric drifting?" monitor (no slope
    * model assumed, outlier-robust):
    *   S = Σ_{i<j} sign(x_j − x_i),
    *   Var(S) = [n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)] / 18,
    *   Z = (S ∓ 1)/√Var(S)  (continuity-corrected, 0 when S = 0).
    * S and the tie-corrected variance numerator are EXACT integers
    * (the pair sum is over sign values; ties group by exact x); the
    * float tail is one sqrt + one divide on bit-identical operands.
    *
    * The i<j pairing is a self-join on the TICK-AGGREGATED series —
    * O(n²) pairs where n is calendar-bounded (#ticks, not #rows), with
    * the smaller side broadcast; at 100 TB the raw events never join,
    * only their per-tick rollup does.
    *
    * @return one row: (n_ticks, s_stat, z_micros)
    */
  def mannKendall(series: DataFrame, tickCol: String,
                  xCol: String): DataFrame = {
    val a = series.select(col(tickCol).as("__ti"), col(xCol).as("__xi"))
    val b = series.select(col(tickCol).as("__tj"), col(xCol).as("__xj"))
    val s = a.crossJoin(broadcast(b))
      .filter(col("__ti") < col("__tj"))
      .agg(coalesce(sum(signum(col("__xj") - col("__xi")).cast("long")),
        lit(0L)).as("s_stat"))
    val ties = series.groupBy(col(xCol).as("__x"))
      .agg(count(lit(1)).as("__t"))
      .agg(coalesce(sum(col("__t") * (col("__t") - 1) *
        (lit(2) * col("__t") + 5)), lit(0L)).as("tie_num"),
        sum("__t").as("n_ticks"))
    val joined = s.crossJoin(broadcast(ties))
    val n = col("n_ticks")
    val varS = ((n * (n - 1) * (lit(2) * n + 5) - col("tie_num"))
      .cast("double")) / 18d
    val zNum = when(col("s_stat") > 0, col("s_stat") - 1)
      .when(col("s_stat") < 0, col("s_stat") + 1)
      .otherwise(lit(0L)).cast("double")
    joined.select(n.as("n_ticks"), col("s_stat"),
      when(varS > 0, graft.util.Exact.micros(zNum / sqrt(varS)))
        .otherwise(lit(0L)).as("z_micros"))
  }
}
