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
  private def bucketCte(src: String, out: String,
                        planes: Int = 8): String =
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
        CROSS JOIN (SELECT unnest(range(0, $planes)) AS p) p
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
        LIMIT 10""")),

    // Embedding-cosine near-dup detection, bucket-local: the corpus has
    // no organic near-dups (max pairwise cos ≈ 0.51), so perturbed
    // copies are planted at vec_id+100000 (element 1 replaced by a
    // constant — no float arithmetic, exact cross-engine parity) and
    // the operator must recover exactly the planted pairs that share a
    // 4-plane LSH bucket, verified by exact cosine ≥ 0.85.
    QuerySpec("q38_embedding_neardup",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val aug = emb.unionAll(emb.filter(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 100000).as("vec_id"),
            concat(array(lit(0.5f)),
              slice(col("embedding"), 2, Dim - 1)).as("embedding")))
        Similarity.nearPairs(aug, planes = 4, minCos = 0.85)
          .select(col("a"), col("b"), Exact.micros(col("cos")).as("cos_micros"))
          .orderBy("a", "b")
      },
      Some(s"""
        WITH aug AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 100000,
                 [CAST(0.5 AS FLOAT)] || embedding[2:$Dim]
          FROM embeddings WHERE vec_id % 20 = 0),
        ${bucketCte("aug", "ba", planes = 4)}
        SELECT l.vec_id AS a, r.vec_id AS b,
               ${Exact.microsSql(cosSql("l.embedding", "r.embedding"))}
                 AS cos_micros
        FROM ba l JOIN ba r
          ON l.bucket = r.bucket AND l.vec_id < r.vec_id
        WHERE ${cosSql("l.embedding", "r.embedding")} >= 0.85
        ORDER BY a, b"""))
  )
}
