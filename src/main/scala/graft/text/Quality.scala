package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, Appendix A —
  * the rule family FineWeb/Dolma/RefinedWeb re-use): cheap per-document
  * heuristics that gate a raw web corpus before any model-based
  * filtering. Each rule is reported separately (per-rule accounting is
  * what lets a pipeline tune thresholds from one profiling pass) plus
  * the conjunctive `keep` verdict.
  *
  * Determinism: every ratio threshold is cross-multiplied into integer
  * arithmetic (`mean_len >= 3`  ⇔  `sum_len >= 3·n`), so the verdicts
  * involve no floating point at all and the SQL oracle replays them
  * exactly.
  *
  * Scale: one narrow projection over the corpus — no shuffle, no join;
  * at 100 TB this fuses into the ingest scan's whole-stage codegen.
  */
object Quality {

  /** Stop-word presence list (rule: a real document mentions at least
    * `minStopwords` distinct entries — Gopher uses a similar 8-word
    * English list). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "to", "in", "of", "and", "is", "with")

  /** Per-document rule flags (1/0) + conjunctive keep.
    *
    * Columns: doc_id, n_tokens, sum_len, r_count, r_meanlen, r_alpha,
    * r_symbol, r_stop, keep.
    */
  def gopherRules(docs: DataFrame,
                  minWords: Int = 10,
                  maxWords: Int = 100000,
                  minMeanLen: Int = 3,
                  maxMeanLen: Int = 10,
                  minStopwords: Int = 2,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val toks = Analyzer.tokenize(col(textCol))
    val flag = (c: Column) => c.cast("int")
    val base = docs.select(col(idCol), toks.as("t"))
      .select(col(idCol),
        size(col("t")).cast("long").as("n_tokens"),
        aggregate(transform(col("t"), x => length(x).cast("long")),
          lit(0L), _ + _).as("sum_len"),
        size(filter(col("t"), _.rlike("[a-z]"))).cast("long").as("n_alpha"),
        size(filter(col("t"), _.rlike("[#…]"))).cast("long").as("n_symbol"),
        size(filter(array(Stopwords.map(lit(_)): _*),
          s => array_contains(col("t"), s))).cast("long").as("n_stop"))
    base.select(col(idCol), col("n_tokens"), col("sum_len"),
      flag(col("n_tokens") >= minWords && col("n_tokens") <= maxWords)
        .as("r_count"),
      flag(col("sum_len") >= lit(minMeanLen.toLong) * col("n_tokens") &&
           col("sum_len") <= lit(maxMeanLen.toLong) * col("n_tokens"))
        .as("r_meanlen"),
      // >= 80% of words contain an alphabetic character
      flag(lit(10L) * col("n_alpha") >= lit(8L) * col("n_tokens"))
        .as("r_alpha"),
      // <= 10% of words are symbol-ish (#, ellipsis)
      flag(lit(10L) * col("n_symbol") <= col("n_tokens")).as("r_symbol"),
      flag(col("n_stop") >= minStopwords).as("r_stop"))
      .withColumn("keep",
        (col("r_count") * col("r_meanlen") * col("r_alpha") *
          col("r_symbol") * col("r_stop")).cast("int"))
  }
}
