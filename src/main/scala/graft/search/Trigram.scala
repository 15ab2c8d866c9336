package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trigram substring index (the pg_trgm design): arbitrary `%pat%`
  * wildcard search without a full-corpus scan per query. The reference
  * engine answers only tokenized keyword/phrase queries
  * (`textindexer/index/es.go`) — a substring match inside a token is
  * invisible to it; a trigram posting table is the standard index that
  * closes that gap.
  *
  * Query algebra: a document can contain the pattern only if it
  * contains EVERY trigram of the pattern, so
  *   candidates = docs whose posting rows cover all pattern trigrams
  *   result     = candidates ∩ exact contains() verify
  * The index prunes, the verify step restores exactness — the result is
  * bit-identical to the naive LIKE scan (which is precisely what the
  * oracle runs).
  *
  * At 100 TB: the posting table is built ONCE (one explode + distinct,
  * shuffled by trigram — ~len(text) rows per doc) and each query then
  * touches only the ≤ len(pattern) trigram posting lists plus the
  * candidate documents for verification; the corpus itself is never
  * rescanned. The candidate agg counts DISTINCT trigram hits per doc,
  * so posting duplication cannot fake coverage.
  */
object Trigram {

  /** Distinct lowercase trigram postings (tri, idCol). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), lower(col(textCol)).as("__lc"))
      .filter(length(col("__lc")) >= 3)
      .select(col(idCol), explode(array_distinct(transform(
        sequence(lit(1), length(col("__lc")) - 2),
        i => col("__lc").substr(i, lit(3))))).as("tri"))

  /** Exact substring search through the index: candidate docs covering
    * all pattern trigrams, then a contains() verify on candidates only.
    * `pattern` is a literal (case-insensitive), min length 3. */
  def wildcardSearch(docs: DataFrame, idCol: String, textCol: String,
                     pattern: String): DataFrame = {
    val pat = pattern.toLowerCase
    require(pat.length >= 3,
      s"pattern must be >= 3 chars for a trigram index, got '$pattern'")
    val tris = pat.sliding(3).toSeq.distinct
    val cand = postings(docs, idCol, textCol)
      .filter(col("tri").isin(tris: _*))
      .groupBy(idCol).agg(countDistinct("tri").as("__hits"))
      .filter(col("__hits") === tris.size)
      .select(idCol)
    docs.join(cand, Seq(idCol))
      .filter(lower(col(textCol)).contains(pat))
      .select(idCol)
  }
}
