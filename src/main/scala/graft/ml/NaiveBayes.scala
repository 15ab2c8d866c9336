package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Exact

/** Multinomial Naive Bayes (McCallum & Nigam 1998) as a pure relational
  * pipeline — the lang-id / document-routing classifier of a
  * training-data pipeline, trained and applied with joins and
  * aggregations only.
  *
  * Cross-engine exactness: every log term (class prior, Laplace-smoothed
  * word likelihood) is snapped to integer micros PER TERM before any
  * summation, so document scores are exact integer sums — immune to
  * float accumulation order — and the argmax (ties to the
  * lexicographically smallest label) is deterministic in both engines.
  *
  * Scale shape: the likelihood table is vocab × |labels| (broadcast
  * range for real vocabularies); scoring joins each document token once
  * per candidate label, so the widest intermediate is |token rows| ×
  * |labels| — linear in the corpus, never quadratic. All scalars
  * (corpus size, vocab size) ride along as 1-row cross joins, keeping
  * the whole thing one lazy plan with no driver actions.
  */
object NaiveBayes {

  /** Train on the full corpus and classify the same corpus (the
    * deterministic self-consistency setup the oracle can replay).
    *
    * @param docs   one row per document
    * @param id     document id column
    * @param label  class column (e.g. lang)
    * @param tokens array-of-string feature column
    * @return (id, actual, predicted) per document. */
  def selfClassify(docs: DataFrame, id: Column, label: Column,
                   tokens: Column): DataFrame = {
    val base = docs.select(id.as("doc_id"), label.as("actual"),
      tokens.as("toks"))
    val tok = base.select(col("doc_id"), col("actual"),
      explode(col("toks")).as("word"))
    val dw = tok.groupBy("doc_id", "actual", "word")
      .agg(count(lit(1)).as("cnt"))

    val v = tok.select("word").distinct()
      .agg(count(lit(1)).as("v")) // vocab size, 1 row
    val nd = base.agg(count(lit(1)).as("n")) // corpus size, 1 row
    val priors = base.groupBy(col("actual").as("cand"))
      .agg(count(lit(1)).as("ndocs"))
      .crossJoin(nd)
      .select(col("cand"), Exact.micros(
        log(col("ndocs").cast("double") / col("n"))).as("prior_micros"))
    val ctot = tok.groupBy(col("actual").as("cand"))
      .agg(count(lit(1)).as("ntok"))
    val wc = tok.groupBy(col("word"), col("actual").as("cand"))
      .agg(count(lit(1)).as("wcnt"))

    // Score every document against every candidate label: per (doc
    // word, cand) the Laplace likelihood ln((wcnt+1)/(ntok+V)) snaps to
    // micros, multiplies by the in-doc count, and sums exactly.
    val scored = dw
      .crossJoin(broadcast(ctot.select("cand")))
      .join(wc, Seq("word", "cand"), "left")
      .join(broadcast(ctot), Seq("cand"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("actual"), col("cand"),
        (col("cnt") * Exact.micros(log(
          (coalesce(col("wcnt"), lit(0L)) + lit(1L)).cast("double") /
            (col("ntok") + col("v"))))).as("term"))
      .groupBy("doc_id", "actual", "cand")
      .agg(sum(col("term")).as("ll_sum"))
      .join(broadcast(priors), Seq("cand"))
      .select(col("doc_id"), col("actual"), col("cand"),
        (col("ll_sum") + col("prior_micros")).as("score_micros"))

    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_micros").desc, col("cand").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("actual"), col("cand").as("predicted"))
  }
}
