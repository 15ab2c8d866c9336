package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Exact

/** Classifier evaluation: exact ROC-AUC via the Mann-Whitney rank-sum
  * identity — AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻), tie-corrected with
  * average ranks. This is how a pipeline scores its quality filters
  * (Gopher rules, LogReg, perplexity) against held-out labels without
  * ever materializing the O(n⁺·n⁻) pair space.
  *
  * Determinism: ranks, tie counts, and the rank-sum are exact integers
  * (2·avgrank = 2·rank + tiecount − 1 keeps everything integral); the
  * single double division at the end is snapped to micros.
  *
  * Scale: one shuffle keyed by the group column; ranking is a
  * sort-based window within each group, the aggregation on top is
  * hash-based. Groups with a missing class are dropped (AUC undefined).
  */
object Eval {

  /** ROUGE-N-style n-gram overlap between (candidate, reference) text
    * pairs (Lin 2004) — the summarization/caption/near-copy eval
    * metric, and at corpus scale the "how much of the eval set leaked
    * into this candidate" readout that pairs with q59's decontaminate
    * gate. Per pair: clipped overlap = Σ_g min(count_cand(g),
    * count_ref(g)) — exact integers — then precision = clip/|cand
    * grams|, recall = clip/|ref grams|, and the Dice/F1
    * 2·clip/(|cand|+|ref|), each ONE double divide snapped to micros.
    *
    * Scale shape: two token-explode hash-aggs keyed (pair, gram) and a
    * full-outer gram join INSIDE the pair key — per-pair work tracks
    * the pair's own text, never the corpus; everything is map-side
    * combinable and no state outlives a pair.
    *
    * Output: (idCol, clip, cand_grams, ref_grams, p_micros, r_micros,
    * f_micros); a pair whose side has no grams scores 0 (guarded
    * divides), matching the metric's convention. */
  def rougeN(pairs: DataFrame, n: Int, idCol: String = "pair_id",
             candCol: String = "cand", refCol: String = "ref")
      : DataFrame = {
    def grams(c: String, out: String) = pairs
      .select(col(idCol),
        explode(graft.text.Analyzer.shingles(col(c), n)).as("g"))
      .groupBy(idCol, "g").agg(count(lit(1)).as(out))
    val joined = grams(candCol, "cc")
      .join(grams(refCol, "rc"), Seq(idCol, "g"), "full_outer")
      .groupBy(idCol).agg(
        sum(least(coalesce(col("cc"), lit(0L)),
          coalesce(col("rc"), lit(0L)))).as("clip"),
        sum(coalesce(col("cc"), lit(0L))).as("cand_grams"),
        sum(coalesce(col("rc"), lit(0L))).as("ref_grams"))
    // re-join onto the pair table so gram-less pairs still report a row
    val ratio = (num: Column, den: Column) =>
      when(den > 0, Exact.micros(num.cast("double") / den.cast("double")))
        .otherwise(0L)
    pairs.select(col(idCol)).join(joined, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clip"), lit(0L)).as("clip"),
        coalesce(col("cand_grams"), lit(0L)).as("cand_grams"),
        coalesce(col("ref_grams"), lit(0L)).as("ref_grams"))
      .withColumn("p_micros", ratio(col("clip"), col("cand_grams")))
      .withColumn("r_micros", ratio(col("clip"), col("ref_grams")))
      .withColumn("f_micros", ratio(lit(2L) * col("clip"),
        col("cand_grams") + col("ref_grams")))
  }

  /** Per-group AUC of `scoreCol` predicting binary `labelCol`:
    * (groupCol, auc_micros). */
  def groupedAuc(df: DataFrame, groupCol: String, scoreCol: String,
                 labelCol: String): DataFrame = {
    val wRank = Window.partitionBy(groupCol).orderBy(scoreCol)
    val wTie = Window.partitionBy(groupCol, scoreCol)
    val ranked = df
      .select(col(groupCol), col(scoreCol),
        col(labelCol).cast("long").as("y"))
      .withColumn("r2",
        lit(2L) * rank().over(wRank) + count(lit(1)).over(wTie) - 1L)
    ranked.groupBy(groupCol)
      .agg(sum(when(col("y") === 1L, col("r2")).otherwise(0L)).as("s2"),
        sum(col("y")).as("npos"),
        (count(lit(1)) - sum(col("y"))).as("nneg"))
      .filter(col("npos") > 0 && col("nneg") > 0)
      .select(col(groupCol), Exact.micros(
        (col("s2") - col("npos") * (col("npos") + 1)).cast("double") /
          (lit(2.0) * (col("npos") * col("nneg")).cast("double")))
        .as("auc_micros"))
  }
}
