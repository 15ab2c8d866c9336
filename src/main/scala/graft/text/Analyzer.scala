package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-owned text analyzer (reference T4: uSearch delegates analysis to
  * Elasticsearch's `text` analyzer / bleve's default mapping —
  * `textindexer/store/es/es.go:35-36`, `textindexer/store/memory/memory.go:38-39`.
  * The conformance corpus only requires lowercase word tokenization, see
  * SURVEY.md §7 "Analyzer fidelity").
  *
  * Built from codegen'd `org.apache.spark.sql.functions` only — no UDFs —
  * so tokenization stays inside whole-stage codegen at scale.
  */
object Analyzer {
  /** Lowercased whitespace tokens, empty tokens dropped. */
  def tokenize(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), _ =!= "")

  /** Tokens normalized harder: strip non-alphanumerics (BPE-ish word regex),
    * for free-form text rather than the pre-clean testdata corpus. */
  def tokenizeStrict(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), _ =!= "")

  /** Number of tokens. */
  def tokenCount(text: Column): Column = size(tokenize(text))

  /** Contiguous word n-grams (shingles) as space-joined strings; empty
    * array for texts shorter than n tokens (guarded — Spark's `sequence`
    * would otherwise count DOWN for start > stop).
    *
    * The token array is bound ONCE per row as a lambda variable (the
    * single-element-array + transform + flatten wrap): referencing the
    * `tokenize` expression directly inside the inner lambda would
    * re-run the regex split once PER SHINGLE INDEX — subexpression
    * elimination is disabled inside higher-order-function lambdas, and
    * that O(tokens²) regex work dominated the whole minhash pipeline
    * (6.1s of q15's 7.5s at sf0.1). */
  def shingles(text: Column, n: Int): Column =
    shinglesOf(tokenize(text), n)

  /** Shingles over an already-tokenized array — for callers that reuse
    * one tokenization across several gram sizes. */
  def shinglesOf(tokens: Column, n: Int): Column =
    flatten(transform(array(tokens), toks =>
      // k-th shingle = tokens[k..k+n-1]; count = size - n + 1
      when(size(toks) >= n,
        transform(
          sequence(lit(0), size(toks) - n),
          k => array_join(slice(toks, k + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))))
}
