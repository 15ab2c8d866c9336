package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Embedding similarity search over an `array<float>` column — the
  * approximate-nearest-neighbour surface of the training-data pipeline.
  *
  * Everything is codegen'd `functions._` (zip_with / aggregate folds, no
  * UDFs):
  *  - [[cosine]] is an exact left-to-right fold, bit-reproducible across
  *    engines (floats widened to double per element);
  *  - [[bruteForceTopK]] is the exact baseline: one pass over N rows,
  *    top-k via orderBy+limit (Spark plans TakeOrderedAndProject — no
  *    full sort materialization);
  *  - [[lshBuckets]]/[[lshTopK]] is the scale path: sign-random-
  *    projection buckets with deterministic hash-derived hyperplanes —
  *    candidate set shrinks by ~2^planes, then exact cosine re-ranks.
  *    At 100 TB the bucketed variant turns an all-pairs scan into a
  *    bucket-local join.
  */
object Similarity {

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Reference implementation: lambda fold. Kept as the spec oracle for
    * the native expression; same left-to-right double accumulation. */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _),
      lit(0.0), _ + _)

  /** Hot path: native codegen'd expression, bit-identical to the fold
    * (VecExpressionsSpec) at ~2× the throughput. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VecFunctions.dotFF(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Fold-based cosine, for benchmarking against the native path. */
  def cosineFold(a: Column, b: Column): Column =
    dotFold(a, b) / (sqrt(dotFold(a, a)) * sqrt(dotFold(b, b)))

  /** Exact top-k by cosine against one query vector. */
  def bruteForceTopK(emb: DataFrame, query: Seq[Float], k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = array(query.map(lit(_)): _*)
    emb.select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * portable 60-bit hash mapped into [-0.5, 0.5). */
  private def planeComponent(plane: Column, dim: Column): Column =
    Dedup.portableHash(concat(plane, lit(":"), dim))
      .cast("double") / lit((1L << 60).toDouble) - lit(0.5)

  /** Sign-random-projection bucket id for each vector: one bit per
    * hyperplane. `planes` ≤ 30. */
  def lshBuckets(emb: DataFrame, planes: Int,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val sig = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(asDouble(col(vecCol)),
          transform(sequence(lit(0), size(col(vecCol)) - 1),
            d => planeComponent(lit(p), d)),
          _ * _),
        lit(0.0), _ + _)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
    emb.withColumn("bucket", sig)
  }

  /** Approximate top-k: restrict to the query's LSH bucket (plus exact
    * re-rank). Falls back to nothing if the bucket is empty — callers
    * can lower `planes` for higher recall. */
  def lshTopK(emb: DataFrame, query: Seq[Float], k: Int, planes: Int = 8,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val withB = lshBuckets(emb, planes, idCol, vecCol)
    val qB = lshBuckets(Seq(Tuple1(query)).toDF(vecCol), planes, idCol, vecCol)
      .select("bucket").first().getLong(0)
    val q = array(query.map(lit(_)): _*)
    withB.filter(col("bucket") === qB)
      .select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs near neighbours above a cosine threshold, bucket-local:
    * only pairs sharing an LSH bucket are compared. */
  def nearPairs(emb: DataFrame, planes: Int, minCos: Double,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val b = lshBuckets(emb, planes, idCol, vecCol)
    val l = b.select(col("bucket"), col(idCol).as("a"),
      col(vecCol).as("va"))
    val r = b.select(col("bucket"), col(idCol).as("b"),
      col(vecCol).as("vb"))
    l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
