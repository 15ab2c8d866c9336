package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.Similarity
import graft.util.Exact

/** Embedding similarity queries over `embeddings` (64-dim float
  * vectors). The oracles unroll the 64-element dot products as chained
  * `+` so the left-to-right double accumulation matches Spark's
  * `aggregate` fold bit-for-bit.
  */
object MlQueries {

  private val Dim = 64

  /** a·b with both sides widened to double per element, left-to-right. */
  private def dotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")

  private def normSql(a: String): String =
    "sqrt(" + (1 to Dim)
      .map(i => s"CAST($a[$i] AS DOUBLE) * CAST($a[$i] AS DOUBLE)")
      .mkString(" + ") + ")"

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / (${normSql(a)} * ${normSql(b)})"

  /** DuckDB: per-(vector, plane) signed projection onto the
    * deterministic hash-derived hyperplane (= Similarity.lshBuckets). */
  private def bucketCte(src: String, out: String): String =
    s"""$out AS (
      SELECT vec_id, embedding,
             sum(CASE WHEN proj > 0
                 THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END)
               AS bucket
      FROM (
        SELECT e.vec_id, e.embedding, p.p,
               sum(CAST(e.embedding[d.d + 1] AS DOUBLE) *
                   (CAST(CAST(('0x' || substring(md5(p.p || ':' || d.d), 1, 15))
                         AS BIGINT) AS DOUBLE) / 1152921504606846976.0 - 0.5))
                 AS proj
        FROM $src e
        CROSS JOIN (SELECT unnest(range(0, 8)) AS p) p
        CROSS JOIN (SELECT unnest(range(0, $Dim)) AS d) d
        GROUP BY e.vec_id, e.embedding, p.p)
      GROUP BY vec_id, embedding)"""

  private def queryVec(s: org.apache.spark.sql.SparkSession,
                       dir: String): Seq[Float] =
    Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select("embedding").first()
      .getSeq[Float](0)

  def specs: Seq[QuerySpec] = Seq(

    // Brute-force exact cosine top-k against a query vector — the ANN
    // baseline. Spark plans TakeOrderedAndProject (no global sort).
    QuerySpec("q18_cosine_topk",
      (s, dir) => {
        Similarity.bruteForceTopK(Tables.embeddings(s, dir),
            queryVec(s, dir), 20)
          .select(col("vec_id"), Exact.micros(col("cos")).as("cos_micros"))
      },
      Some(s"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, ${Exact.microsSql(cosSql("e.embedding", "q.qv"))}
                 AS cos_micros
        FROM embeddings e CROSS JOIN q
        ORDER BY ${cosSql("e.embedding", "q.qv")} DESC, e.vec_id
        LIMIT 20""")),

    // LSH-bucketed approximate top-k: sign-random-projection buckets
    // (8 deterministic hyperplanes), bucket-local exact re-rank — the
    // 100 TB path where all-pairs is impossible.
    QuerySpec("q19_ann_lsh_topk",
      (s, dir) => {
        Similarity.lshTopK(Tables.embeddings(s, dir),
            queryVec(s, dir), 10, planes = 8)
          .select(col("vec_id"), Exact.micros(col("cos")).as("cos_micros"))
      },
      Some(s"""
        WITH ${bucketCte("embeddings", "be")},
        qb AS (SELECT bucket, embedding AS qv FROM be WHERE vec_id = 0)
        SELECT e.vec_id, ${Exact.microsSql(cosSql("e.embedding", "q.qv"))}
                 AS cos_micros
        FROM be e CROSS JOIN qb q
        WHERE e.bucket = q.bucket
        ORDER BY ${cosSql("e.embedding", "q.qv")} DESC, e.vec_id
        LIMIT 10"""))
  )
}
