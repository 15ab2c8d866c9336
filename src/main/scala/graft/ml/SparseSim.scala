package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.search.Search
import graft.util.Exact

/** All-pairs sparse TF-IDF cosine similarity over an inverted index —
  * document-level near-duplicate / related-document detection WITHOUT
  * embeddings (the term-vector twin of [[Similarity]]'s dense path),
  * after Bayardo et al. 2007's "Scaling Up All Pairs Similarity Search"
  * candidate-pruning idea in its simplest robust form: candidate pairs
  * are generated ONLY through terms with df ≤ maxDf.
  *
  * Semantics: vectors live over the FULL vocabulary (every term keeps
  * its tf·ln(N/df) weight in the norm), but hub terms (df > maxDf)
  * are excluded from pair generation AND from the dot product — the
  * classic stopword-pruning contract: a term shared by half the corpus
  * carries ~zero idf weight yet would alone produce O(N²) candidates.
  * The reported score is therefore a LOWER bound on full cosine that
  * converges to it as idf(hub) → 0; the cutoff is part of the operator
  * contract, applied identically in the oracle.
  *
  * Shape: postings explode → (doc, term) tf hash-agg → vocabulary-sized
  * df table (broadcast) → self-equi-join on term restricted to probe
  * terms → (pair)-keyed hash-agg → two |docs|-row norm joins. At
  * 100 TB: candidate volume is Σ_{df(t)≤maxDf} df(t)² ≤ maxDf·|postings|
  * — linear in corpus size with the cutoff as the knob; the corpus
  * never crosses a cartesian, and every exchange is keyed (term or
  * pair or doc).
  *
  * Cross-engine determinism: per-term w² and w_a·w_b products are
  * micros-snapped BEFORE their integer sums (order-independent); the
  * float tail is one divide per norm (s/1e6), IEEE sqrt, one multiply
  * and one divide — fixed parenthesization mirrored in the SQL twin.
  */
object SparseSim {

  /** Pairs (id_a < id_b) with TF-IDF cosine ≥ minCosMicros/1e6:
    * (id_a, id_b, shared_terms, cos). */
  def tfidfCosinePairs(docs: DataFrame, maxDf: Long, minCosMicros: Long,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val toks = Search.postings(docs, idCol, textCol)
      .select(col(idCol).as("id"), col("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"), col("df"),
        (col("tf") * log(col("n").cast("double") / col("df"))).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = w.groupBy("id")
      .agg(sum(Exact.micros(col("w") * col("w"))).as("nsq_micros"))
      .select(col("id"),
        sqrt(col("nsq_micros").cast("double") / 1e6).as("norm"))
    // df >= 2 is pure pruning (a df=1 term cannot form an id_a < id_b
    // pair); df <= maxDf is the semantic hub cutoff documented above.
    val probe = w.filter(col("df") <= maxDf && col("df") >= 2)
    val dots = probe.select(col("term"), col("id").as("id_a"), col("w").as("w_a"))
      .join(probe.select(col("term"), col("id").as("id_b"), col("w").as("w_b")),
        Seq("term"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_terms"),
        sum(Exact.micros(col("w_a") * col("w_b"))).as("dot_micros"))
    dots
      .join(norms.select(col("id").as("id_a"), col("norm").as("norm_a")), "id_a")
      .join(norms.select(col("id").as("id_b"), col("norm").as("norm_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("shared_terms"),
        ((col("dot_micros").cast("double") / 1e6) /
          (col("norm_a") * col("norm_b"))).as("cos"))
      .filter(Exact.micros(col("cos")) >= minCosMicros)
  }
}
