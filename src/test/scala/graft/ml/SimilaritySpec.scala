package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1f, 0f, 0f)),
    (1L, Seq(0.9f, 0.1f, 0f)),
    (2L, Seq(0f, 1f, 0f)),
    (3L, Seq(-1f, 0f, 0f)),
    (4L, Seq(0.5f, 0.5f, 0f))).toDF("vec_id", "embedding")

  test("cosine equals hand computation") {
    val c = vecs.filter(col("vec_id") === 4)
      .select(Similarity.cosine(col("embedding"),
        array(lit(1f), lit(0f), lit(0f)))).as[Double].head()
    assert(math.abs(c - 0.5 / math.sqrt(0.5)) < 1e-12)
  }

  test("brute force top-k orders by cosine desc") {
    val top = Similarity.bruteForceTopK(vecs, Seq(1f, 0f, 0f), 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(top === Seq(0L, 1L, 4L))
  }

  test("identical vectors share an LSH bucket; opposite vectors don't") {
    val b = Similarity.lshBuckets(vecs, planes = 12, dim = 3)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(b(0L) != b(3L)) // antipodal: all projection signs flip
  }

  test("lshTopK finds the query's own bucket and ranks exactly") {
    val top = Similarity.lshTopK(vecs, Seq(1f, 0f, 0f), 5, planes = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(top.nonEmpty)
    assert(top.head == 0L) // the query vector itself ranks first
  }

  test("nearPairs respects the threshold within buckets") {
    val p = Similarity.nearPairs(vecs, planes = 2, minCos = 0.99, dim = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // only (0,1) has cos ≥ 0.99 among bucket-mates
    assert(p.subsetOf(Set((0L, 1L))))
  }

  test("lsh recall on the real embeddings table") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") === 1).select("embedding")
      .as[Seq[Float]].head()
    val exact = Similarity.bruteForceTopK(emb, q, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.lshTopK(emb, q, 10, planes = 4)
      .select("vec_id").as[Long].collect().toSet
    // 4 planes → 16 buckets over 500 vecs; the query itself must appear
    assert(approx.contains(1L))
    assert((exact & approx).nonEmpty)
  }
}
