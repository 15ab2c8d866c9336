package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Exact

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
  * greedily pick k results maximizing
  * `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` — the standard diversity
  * pass over an ANN candidate page (and, in a curation pipeline, the
  * "don't fill the batch with near-clones" selection step).
  *
  * The candidate set is page-sized BY CONSTRUCTION (top-n of an ANN
  * probe), so the greedy argmax runs on the collected page — the same
  * cardinality class as Search.paginate. The corpus-scale work
  * (candidate generation, pairwise candidate similarities) stays in
  * Spark plans; the collect is O(n²) over n = page size.
  *
  * Determinism: relevance and pairwise similarities are snapped to
  * integer micros IN THE PLAN (same cosine expression the oracles
  * unroll), λ is an integer micro weight, so every greedy comparison is
  * exact long arithmetic with a min-id tie-break.
  */
object Mmr {

  /** Greedy-select `k` of the candidates. `cands` must have columns
    * (vec_id, rel_micros, embedding). Returns (step, vec_id, mmr_p12)
    * where mmr_p12 = λμ·rel_micros − (1e6−λμ)·maxsim_micros (units of
    * 1e-12). */
  def select(spark: SparkSession, cands: DataFrame, k: Int,
             lambdaMicros: Long): DataFrame = {
    import spark.implicits._
    val page = cands.select(col("vec_id"), col("rel_micros")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = cands.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = cands.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val sims = a.join(b, col("va") =!= col("vb"))
      .select(col("va"), col("vb"),
        Exact.micros(Similarity.cosine(col("ea"), col("eb"))).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val remaining = scala.collection.mutable.SortedSet[Long]() ++ page.keys
    val selected = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    for (step <- 1L to math.min(k.toLong, page.size.toLong)) {
      var bestId = -1L
      var bestSc = Long.MinValue
      for (id <- remaining) {
        val maxSim =
          if (selected.isEmpty) 0L
          else selected.map(s => sims((id, s._2))).max
        val sc = lambdaMicros * page(id) - (1000000L - lambdaMicros) * maxSim
        if (sc > bestSc || (sc == bestSc && id < bestId)) {
          bestSc = sc; bestId = id
        }
      }
      selected += ((step, bestId, bestSc))
      remaining -= bestId
    }
    selected.toSeq.toDF("step", "vec_id", "mmr_p12")
  }
}
