package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.Analyzer
import graft.util.Exact

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"): score every raw
  * document by how target-like its unigram distribution is —
  * `w(doc) = Σ_t count_doc(t) · ln( p̂_target(t) / p̂_raw(t) )` with
  * add-one smoothing — then keep the top slice. The marker of the
  * technique is that the model is *the corpus itself*: no external
  * artifact, one vocabulary-sized ratio table.
  *
  * Determinism: each token's log-ratio is snapped to integer micros
  * once (a single `ln` of a ratio of exact integer counts, fixed
  * parenthesization — the q79 PMI discipline), so document weights are
  * exact integer dot products and reassociate freely across partitions.
  *
  * Scale: two token-keyed hash-aggregations build the counts (map-side
  * combinable); the ratio table is vocabulary-sized and broadcasts back
  * — the corpus shuffles only on (doc, token) for its own term counts,
  * never on the model. At 100 TB the ratio table is still MBs.
  */
object Dsir {

  /** Per-token smoothed log probability ratio, snapped to micros:
    * (token, lr_micros). `isTarget` marks the rows whose distribution
    * is the target; raw = all rows. */
  def logRatios(docs: DataFrame, isTarget: Column,
                textCol: String = "text"): DataFrame = {
    val tok = docs.select(isTarget.cast("long").as("is_t"),
      explode(Analyzer.tokenize(col(textCol))).as("token"))
    val counts = tok.groupBy("token")
      .agg(count(lit(1)).as("rc"), sum(col("is_t")).as("tc"))
    val totals = counts.agg(sum("rc").as("rtot"), sum("tc").as("ttot"),
      count(lit(1)).as("v"))
    counts.crossJoin(broadcast(totals))
      .select(col("token"), Exact.micros(log(
        ((col("tc") + 1).cast("double") /
          (col("ttot") + col("v")).cast("double")) /
        ((col("rc") + 1).cast("double") /
          (col("rtot") + col("v")).cast("double"))))
        .as("lr_micros"))
  }

  /** Per-document importance weight in 1e-6 units (exact long):
    * (doc_id, weight_p6). */
  def importanceWeights(docs: DataFrame, isTarget: Column,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val lr = logRatios(docs, isTarget, textCol)
    val docTok = docs
      .select(col(idCol), explode(Analyzer.tokenize(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("c"))
    docTok.join(broadcast(lr), "token")
      .groupBy(idCol)
      .agg(sum(col("c") * col("lr_micros")).as("weight_p6"))
  }
}
