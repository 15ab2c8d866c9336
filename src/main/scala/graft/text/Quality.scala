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

  /** Gopher repetition rules (Rae et al. 2021, Table A1's "repetition
    * removal" band): per-document duplicate-line fractions and
    * top-n-gram character fractions, each a 1/0 flag plus conjunctive
    * keep — the filter that drops boilerplate-heavy and
    * degenerate-loop pages before training.
    *
    * Exact integer arithmetic throughout (every threshold is a percent
    * cross-multiplied against integer counts — zero FP):
    *  - r_dupline:     occurrences of duplicated lines ≤ pct of lines
    *  - r_duplinechar: characters in duplicated lines ≤ pct of line chars
    *  - r_top2/3/4:    chars covered by the most frequent word n-gram
    *                   (count × gram chars) ≤ pct of token chars —
    *                   Gopher's top-2/3/4-gram character fraction
    *  - r_dupgram:     occurrences of duplicated 2-grams ≤ pct of 2-gram
    *                   positions (the occurrence-fraction variant of
    *                   Gopher's duplicate-n-gram character fraction:
    *                   char occupancy needs interval union over
    *                   overlapping matches, which no engine replays
    *                   exactly; occurrence fraction is the same signal
    *                   and integer-exact)
    *
    * Scale shape: three (doc, gram) and one (doc, line) hash-aggs, all
    * map-side combinable, joined back doc-keyed — cost is the token
    * explode, the same class as every shingle operator here; nothing is
    * corpus-quadratic and no window runs wider than a document. */
  def repetitionRules(docs: DataFrame,
                      maxDupLinePct: Int = 30,
                      maxDupLineCharPct: Int = 20,
                      maxTop2Pct: Int = 20,
                      maxTop3Pct: Int = 18,
                      maxTop4Pct: Int = 16,
                      maxDupGramPct: Int = 10,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val flag = (c: Column) => c.cast("int")
    val toks = Analyzer.tokenize(col(textCol))
    val base = docs.select(col(idCol), toks.as("t"))
      .select(col(idCol), col("t"),
        size(col("t")).cast("long").as("n_tokens"),
        aggregate(transform(col("t"), x => length(x).cast("long")),
          lit(0L), _ + _).as("n_chars"))

    def ngramStats(n: Int) = base
      .select(col(idCol),
        explode(Analyzer.shinglesOf(col("t"), n)).as("g"))
      .groupBy(idCol, "g").agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(
        max(col("c") * (length(col("g")) - lit(n - 1).cast("long")))
          .as(s"top$n"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as(s"dup$n"),
        sum(col("c")).as(s"occ$n"))

    val lineStats = docs
      .select(col(idCol), explode(filter(
        transform(split(col(textCol), "\n"), x => trim(x)),
        x => x =!= "")).as("line"))
      .groupBy(idCol, "line").agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(sum("c").as("n_lines"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_lines"),
        sum(col("c") * length(col("line")).cast("long")).as("line_chars"),
        sum(when(col("c") > 1, col("c") * length(col("line")).cast("long"))
          .otherwise(0L)).as("dup_line_chars"))

    val joined = Seq(lineStats, ngramStats(2), ngramStats(3),
      ngramStats(4)).foldLeft(base.drop("t")) { (acc, f) =>
        acc.join(f, Seq(idCol), "left")
      }
    def z(c: String): Column = coalesce(col(c), lit(0L))
    joined.select(col(idCol), col("n_tokens"), col("n_chars"),
      flag(lit(100L) * z("dup_lines") <=
        lit(maxDupLinePct.toLong) * z("n_lines")).as("r_dupline"),
      flag(lit(100L) * z("dup_line_chars") <=
        lit(maxDupLineCharPct.toLong) * z("line_chars"))
        .as("r_duplinechar"),
      flag(lit(100L) * z("top2") <=
        lit(maxTop2Pct.toLong) * col("n_chars")).as("r_top2"),
      flag(lit(100L) * z("top3") <=
        lit(maxTop3Pct.toLong) * col("n_chars")).as("r_top3"),
      flag(lit(100L) * z("top4") <=
        lit(maxTop4Pct.toLong) * col("n_chars")).as("r_top4"),
      flag(lit(100L) * z("dup2") <=
        lit(maxDupGramPct.toLong) * z("occ2")).as("r_dupgram"))
      .withColumn("keep",
        (col("r_dupline") * col("r_duplinechar") * col("r_top2") *
          col("r_top3") * col("r_top4") * col("r_dupgram")).cast("int"))
  }
}
