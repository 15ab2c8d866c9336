package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics WITHOUT a global sort.
  *
  * `percentile_disc`-style exact quantiles are usually computed by either
  * sorting the whole relation (a full range-shuffle — the thing to avoid
  * at 100 TB) or by an in-memory aggregate that buffers every value per
  * group (Spark's builtin `percentile`, which OOMs at fact-table scale).
  * This operator instead runs the classic two-pass rank localization:
  *
  *  1. one scan → (count, min, max) — three scalars;
  *  2. one scan → fixed-width histogram of `buckets` integer-arithmetic
  *     bins, collected to the driver (bounded by construction: ≤`buckets`
  *     rows regardless of data size) and cumulated, which pins each
  *     requested rank to a single bin and a residual rank inside it;
  *  3. one narrow scan per quantile, filtered to that bin's VALUE RANGE —
  *     a plain `v BETWEEN lo AND hi` predicate that pushes into the
  *     parquet scan (row-group min/max pruning, so pass 3 reads a small
  *     fraction of the files) — followed by a TakeOrdered of the residual
  *     rank (≈ n/buckets rows, never the relation).
  *
  * All bin math is integer-exact (no float widths), so the same ranks are
  * derivable in any engine. Heavily-skewed value distributions can
  * overload one bin; the general fix is recursing the histogram inside
  * the hot bin — a second level multiplies the effective resolution to
  * `buckets²`, enough for any real distribution, and falls out of the
  * same code by re-invoking on the filtered frame.
  */
object Quantiles {

  /** Exact values at ranks ceil(q·n) of an integral column.
    *
    * @param qs  (label, q) pairs, 0 < q ≤ 1
    * @return one row per label: (ql, rank, val) — deterministic: the
    *         rank-k order statistic is unique even under ties.
    */
  def exact(df: DataFrame, value: Column, qs: Seq[(String, Double)],
            buckets: Int = 8192): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val vals = df.select(value.cast("long").as("v"))
    val Array(nRow) = vals
      .agg(count(lit(1)), min(col("v")), max(col("v"))).collect()
    val (n, lo, hi) =
      (nRow.getLong(0), nRow.getLong(1), nRow.getLong(2))
    require(n > 0, "exact quantiles of an empty relation")

    val width = hi - lo + 1 // value span; bin b covers an exact sub-range
    // (v-lo)*buckets must not wrap Long — raw 60-bit-hash-sized spans at
    // the default 8192 buckets would overflow SILENTLY into wrong bins.
    // The caller's fix is fewer buckets or pre-scaling the value.
    require(width > 0 && width <= Long.MaxValue / buckets,
      s"value span $width * $buckets buckets overflows Long; " +
        "reduce `buckets` or rescale the value column")
    // Pass 2: histogram on integer bin ids — ((v-lo)*B) div W is exact
    // long arithmetic (no float bin widths to disagree over).
    val hist = vals
      .groupBy(expr(s"((v - $lo) * $buckets) div $width").as("bin"))
      .agg(count(lit(1)).as("c"))
      .orderBy("bin")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // Driver-side cumulation over ≤`buckets` rows: rank → (bin, residual
    // rank within bin, count of rows strictly below the bin).
    val targets = qs.map { case (label, q) =>
      require(q > 0 && q <= 1, s"quantile $q out of (0,1]")
      val rank = math.ceil(q * n).toLong
      var cum = 0L
      val (bin, below) = hist.collectFirst {
        case (bn, c) if { val ok = cum + c >= rank; if (!ok) cum += c; ok } =>
          (bn, cum)
      }.get
      (label, rank, bin, rank - below)
    }

    // Pass 3: per target, a value-range-filtered TakeOrdered of the
    // residual rank. The BETWEEN bounds are the bin's exact value range
    // (inverse of the bin function), so the predicate reaches parquet.
    targets.map { case (label, rank, bin, kInBin) =>
      val binLo = lo + ceilDiv(bin * width, buckets)
      val binHi = lo + ceilDiv((bin + 1) * width, buckets) - 1
      // limit() takes an Int; a residual rank past 2^31 means one bin
      // holds >2G rows — recurse the histogram into [binLo, binHi]
      // (doc header) rather than truncate silently.
      require(kInBin <= Int.MaxValue,
        s"residual rank $kInBin exceeds Int range in bin $bin; " +
          "increase `buckets` or recurse into the bin's value range")
      vals.filter(col("v").between(binLo, binHi))
        .orderBy("v").limit(kInBin.toInt)
        .agg(max(col("v")).as("value"))
        .select(lit(label).as("ql"), lit(rank).as("rank"), col("value"))
    }.reduce(_ unionAll _)
  }

  /** Per-group exact quantiles — the same histogram rank-localization,
    * with the per-group narrow pass fused into ONE distributed job:
    * group stats and histograms collect (bounded by |groups| and
    * |groups|·buckets respectively — group cardinality must be
    * metric-sized, which is what per-group reporting means), then a
    * single broadcast join of (group, bin range, residual rank) targets
    * against the data + a row_number window whose partitions are
    * bucket-sized by construction picks every group's order statistic
    * at once.
    *
    * @return (group, ql, rank, value) sorted by (group, ql). */
  def exactByGroup(df: DataFrame, group: String, value: Column,
                   qs: Seq[(String, Double)],
                   buckets: Int = 8192): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val vals = df.select(col(group).as("g"), value.cast("long").as("v"))
    val stats = vals.groupBy("g")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    stats.foreach { case (g, (_, lo, hi)) =>
      val w = hi - lo + 1
      require(w > 0 && w <= Long.MaxValue / buckets,
        s"group '$g' value span $w * $buckets buckets overflows Long; " +
          "reduce `buckets` or rescale the value column")
    }
    val statsDf = broadcast(stats.toSeq
      .map { case (g, (_, lo, hi)) => (g, lo, hi - lo + 1) }
      .toDF("g", "lo", "w"))
    val hist = vals.join(statsDf, Seq("g"))
      .groupBy(col("g"), expr(s"((v - lo) * $buckets) div w").as("bin"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap

    val targets = stats.keys.toSeq.sorted.flatMap { g =>
      val (n, lo, hi) = stats(g)
      val width = hi - lo + 1
      qs.map { case (label, q) =>
        require(q > 0 && q <= 1, s"quantile $q out of (0,1]")
        val rank = math.ceil(q * n).toLong
        var cum = 0L
        val (bin, below) = hist(g).collectFirst {
          case (bn, c) if { val ok = cum + c >= rank; if (!ok) cum += c; ok } =>
            (bn, cum)
        }.get
        val binLo = lo + ceilDiv(bin * width, buckets)
        val binHi = lo + ceilDiv((bin + 1) * width, buckets) - 1
        // row_number() is IntegerType — a residual rank past 2^31 can't
        // be matched; fail loudly instead of never matching the window.
        require(rank - below <= Int.MaxValue,
          s"group '$g' residual rank ${rank - below} exceeds Int range; " +
            "increase `buckets` or recurse into the bin's value range")
        (g, label, rank, rank - below, binLo, binHi)
      }
    }.toDF("tg", "ql", "rank", "k_in_bin", "bin_lo", "bin_hi")

    vals.join(broadcast(targets),
        col("g") === col("tg") &&
          col("v").between(col("bin_lo"), col("bin_hi")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g"), col("ql")).orderBy(col("v"))))
      .filter(col("rn") === col("k_in_bin"))
      .select(col("g").as(group), col("ql"), col("rank"),
        col("v").as("value"))
  }

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b
}
