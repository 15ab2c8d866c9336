package graft.ml

import org.apache.spark.sql.DataFrame
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
