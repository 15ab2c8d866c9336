package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass exact correlation matrix over integer-snapped measures —
  * the q55 integer-moment trick (variance from (n, Σx, Σx²) BIGINT
  * sums) extended to every PAIRWISE second moment: ONE scan accumulates
  * n, Σxᵢ, Σxᵢ², and Σxᵢxⱼ for all pairs, then Pearson r falls out of
  * pure arithmetic on exact sums,
  *   r = (nΣxy − ΣxΣy) / (sqrt(nΣx² − (Σx)²) · sqrt(nΣy² − (Σy)²)).
  *
  * Cross-engine determinism: every sum is integer-exact (per-row
  * products fit a long; sums are DECIMAL(38,0) on Spark, HUGEINT in
  * DuckDB), and the float tail is two casts, two sqrts (correctly
  * rounded by IEEE 754 — bit-identical in any conforming engine), one
  * multiply and one divide — so even the DIVISION's operands are
  * bit-equal and the micros snap is stable.
  *
  * At 100 TB: k measures cost one map-side-combinable aggregation of
  * k(k+3)/2 + 1 counters — a single row out, no shuffle of data rows,
  * vs k² separate corr() passes. Feature-correlation triage over a
  * training corpus (length vs quality vs dup-count …) is this exact
  * shape.
  */
object Stats {

  /** Pairwise Pearson correlations of the named integer measures:
    * (pair, n, corr_micros) for every i < j pair, one scan. */
  def corrMatrix(df: DataFrame, measures: Seq[(String, Column)]): DataFrame = {
    require(measures.size >= 2, "need at least two measures")
    val names = measures.map(_._1)
    require(names.distinct.size == names.size, "measure names must be unique")
    val dec = "decimal(38,0)"
    val sums =
      measures.flatMap { case (nm, c) =>
        Seq(sum(c).as(s"s_$nm"),
          sum((c * c).cast(dec)).as(s"ss_$nm"))
      } ++
        measures.combinations(2).map { case Seq((na, ca), (nb, cb)) =>
          sum((ca * cb).cast(dec)).as(s"sp_${na}_$nb")
        }
    val one = df.agg(count(lit(1)).as("n"), sums: _*)

    def corr(na: String, nb: String): Column = {
      val n = col("n").cast(dec)
      val num = (n * col(s"sp_${na}_$nb") -
        (col(s"s_$na").cast(dec) * col(s"s_$nb").cast(dec)))
        .cast("double")
      def dev(x: String) =
        sqrt((n * col(s"ss_$x") -
          col(s"s_$x").cast(dec) * col(s"s_$x").cast(dec)).cast("double"))
      num / (dev(na) * dev(nb))
    }

    val pairRows = measures.combinations(2).map { case Seq((na, _), (nb, _)) =>
      struct(lit(s"$na~$nb").as("pair"), col("n").as("n"),
        graft.util.Exact.micros(corr(na, nb)).as("corr_micros"))
    }.toSeq
    one.select(explode(array(pairRows: _*)).as("r"))
      .select(col("r.pair").as("pair"), col("r.n").as("n"),
        col("r.corr_micros").as("corr_micros"))
  }

  /** Exponential time-decay aggregation in EXACT integer arithmetic —
    * the recency-weighted engagement/quality score of every feature
    * pipeline (EWMA-style), with the float-sum nondeterminism designed
    * out: weight(age) = 2^(maxAge − clamp(age, 0, maxAge)), a power of
    * two (halving per age unit, floored at weight 1), so the decayed
    * sum is a plain integer hash-agg — map-side combinable, insertion-
    * order independent, engine-portable bit-for-bit.
    *
    * At 100 TB this is ONE aggregation pass keyed by `keys` — the same
    * shape as any rollup; no window, no per-key ordering. Overflow
    * headroom: |values| · 2^maxAge must fit DECIMAL(38,0), i.e.
    * maxAge ≤ 62 enforced, and row values should keep
    * value · 2^maxAge within ~10^38/rows. */
  def decayedSum(df: DataFrame, keys: Seq[String], value: Column,
                 age: Column, maxAge: Int): DataFrame = {
    require(maxAge >= 0 && maxAge <= 62, s"maxAge in [0,62], got $maxAge")
    // 2^k is exact in double for any k here; the cast back is exact.
    val weight = pow(lit(2.0),
      lit(maxAge) - least(greatest(age, lit(0)), lit(maxAge))).cast("long")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum((value * weight).cast("decimal(38,0)")).cast("long")
          .as("decayed"))
  }

  /** Per-group z-score standardization of an integer measure — the
    * feature-normalization pass of every training pipeline — in the
    * division-free integer-moment form:
    *   z = (n·x − Σx) / sqrt(n·Σx² − (Σx)²) · 1   (population σ),
    * i.e. the NUMERATOR is exact integer arithmetic and the float tail
    * is one cast, one IEEE sqrt and one divide — bit-identical in any
    * conforming engine (same trick as [[corrMatrix]]). Degenerate
    * groups (σ = 0, incl. singletons) standardize to 0.
    *
    * Shape: one map-side-combinable moments agg per group + one keyed
    * join back — no window, no per-group sort; at 100 TB the group
    * stats side is |groups| rows and broadcasts (AQE) when small. */
  def zscore(df: DataFrame, keys: Seq[String], measure: Column,
             outCol: String = "z_micros"): DataFrame = {
    val dec = "decimal(38,0)"
    val stats = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(measure.cast(dec)).as("__sx"),
        sum((measure * measure).cast(dec)).as("__sxx"))
    val varNum = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val z = (col("__n") * measure.cast(dec) - col("__sx")).cast("double") /
      sqrt(varNum)
    df.join(stats, keys)
      .withColumn(outCol,
        when(varNum > 0, graft.util.Exact.micros(z)).otherwise(lit(0L)))
      .drop("__n", "__sx", "__sxx")
  }

  /** Equal-frequency (quantile) binning against EXACT interpolated
    * percentile cutoffs computed once and broadcast back — the
    * scale-safe form of a global ntile(): no global sort, the cutoff
    * side is ONE row, and the per-row label is scan-stage arithmetic.
    * bucket(x) = #{cutoffs c : x > c} (boundary values fall low).
    * Engine-exact: interpolated percentiles of integer inputs are
    * bit-identical across engines (the q50 parity), so the cutoffs —
    * and hence every comparison — agree. Spark's exact percentile
    * buffers value→count per group: bounded by the value DOMAIN, fine
    * for length-like integers; use DDSketch for unbounded doubles. */
  def quantileBuckets(df: DataFrame, valueCol: String, probs: Seq[Double],
                      outCol: String = "bucket"): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p < 1),
      s"probs must sit strictly inside (0,1): $probs")
    val arr = probs.map(p => s"${p}D").mkString("array(", ", ", ")")
    val cuts = df.agg(expr(s"percentile(`$valueCol`, $arr)").as("__cuts"))
    df.crossJoin(broadcast(cuts))
      .withColumn(outCol,
        probs.indices.map(i =>
          when(col(valueCol) > element_at(col("__cuts"), i + 1), 1L)
            .otherwise(0L))
          .reduce(_ + _))
      .drop("__cuts")
  }

  /** Grouped ordinary-least-squares fit y = slope·x + intercept with
    * R², in the [[corrMatrix]] exact-integer-moment form: ONE map-side-
    * combinable aggregation accumulates (n, Σx, Σy, Σx², Σy², Σxy) as
    * DECIMAL(38,0) ≡ HUGEINT, then
    *   slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    *   intercept = (Σy − slope·Σx) / n
    *   R²        = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    * fall out of casts + IEEE multiply/divide on bit-identical exact
    * operands — micros-snap stable cross-engine. The trend-line /
    * drift-detection primitive of every metrics pipeline (bytes vs
    * docs, loss vs step, price vs quantity), at the cost of a 6-counter
    * rollup — no window, no second scan, no MLlib dependency.
    * Degenerate groups (zero x-variance) return NULLs. */
  def linearFit(df: DataFrame, keys: Seq[String],
                x: Column, y: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val g = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(x.cast(dec)).as("__sx"), sum(y.cast(dec)).as("__sy"),
        sum((x * x).cast(dec)).as("__sxx"),
        sum((y * y).cast(dec)).as("__syy"),
        sum((x * y).cast(dec)).as("__sxy"))
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val den = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val dny = (col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .cast("double")
    val slope = num / den
    val intercept = (col("__sy").cast("double") -
      slope * col("__sx").cast("double")) / col("__n").cast("double")
    val r2 = num * num / (den * dny)
    g.select(keys.map(col) ++ Seq(
      col("__n").cast("long").as("n"),
      when(den > 0, graft.util.Exact.micros(slope)).as("slope_micros"),
      when(den > 0, graft.util.Exact.micros(intercept))
        .as("intercept_micros"),
      when(den > 0 && dny > 0, graft.util.Exact.micros(r2))
        .as("r2_micros")): _*)
  }

  /** Shannon entropy (nats) of a categorical column per group — the
    * distribution-collapse / diversity probe of data-quality suites
    * (mode coverage of event types, languages, sources). Two hash-aggs
    * — (keys, cat) counts then a per-key sum — no window. Per-term
    * micros snap of p·ln p before the sum keeps the float tail
    * order-free and engine-portable (the q62/q79 ln discipline):
    * H_micros = −Σ_cat micros((c/n)·ln(c/n)). */
  def entropy(df: DataFrame, keys: Seq[String], cat: Column): DataFrame = {
    val counts = df.groupBy(keys.map(col) :+ cat.as("__cat"): _*)
      .agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(keys.map(col): _*)
      .agg(sum("__c").as("__t"))
    val p = col("__c").cast("double") / col("__t").cast("double")
    counts.join(totals, keys)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_cats"),
        (-sum(graft.util.Exact.micros(p * log(p)))).as("entropy_micros"))
  }

  /** Robust per-group outlier detection via the modified z-score
    * (Iglewicz & Hoaglin 1993): flag x when
    * 0.6745·|x − median| > threshold·MAD, with MAD the median absolute
    * deviation — resistant to the very outliers a mean/σ rule (q55)
    * lets distort the fence. Two exact-percentile aggs + two keyed
    * joins; comparisons are engine-exact because both medians inherit
    * the q50 interpolation parity. Degenerate groups (MAD = 0) flag
    * nothing. Adds med, mad, is_outlier. */
  def madOutliers(df: DataFrame, keys: Seq[String], valueCol: String,
                  threshold: Double = 3.5): DataFrame = {
    val med = df.groupBy(keys.map(col): _*)
      .agg(expr(s"percentile(`$valueCol`, 0.5D)").as("med"))
    val dev = df.join(med, keys)
      .withColumn("__adev", abs(col(valueCol) - col("med")))
    val mad = dev.groupBy(keys.map(col): _*)
      .agg(expr("percentile(`__adev`, 0.5D)").as("mad"))
    dev.join(mad, keys)
      .withColumn("is_outlier",
        col("mad") > 0 && lit(0.6745) * col("__adev") >
          lit(threshold) * col("mad"))
      .drop("__adev")
  }
}
