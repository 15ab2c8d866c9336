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

  test("nearPairs recall floor ≥0.9 on the planted q38 corpus") {
    // Same corpus + parameters as the driver's q38: every 20th vector
    // re-planted with its first component set to 0.5, 24 planes in 4
    // bands of 6 bits, cos ≥ 0.85. The banding was tuned for ~90%
    // planted-pair recall — this pins that as a floor so a parameter
    // regression fails loudly instead of silently shipping worse recall.
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val dim = 64
    val aug = emb.unionAll(emb.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        concat(array(lit(0.5f)),
          slice(col("embedding"), 2, dim - 1)).as("embedding")))
    val l = aug.select(col("vec_id").as("a"), col("embedding").as("va"))
    val r = aug.select(col("vec_id").as("b"), col("embedding").as("vb"))
    val truth = l.crossJoin(r).filter(col("a") < col("b"))
      .filter(Similarity.cosine(col("va"), col("vb")) >= 0.85)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val found = Similarity.nearPairs(aug, planes = 24, minCos = 0.85,
        bands = 4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    assert(found.subsetOf(truth)) // exact verify: no false positives
    val recall = (found & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall < 0.9 " +
      s"(${(found & truth).size}/${truth.size})")
  }

  test("multi-probe lshTopK strictly widens the candidate set") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") === 1).select("embedding")
      .as[Seq[Float]].head()
    val exact = Similarity.bruteForceTopK(emb, q, 10)
      .select("vec_id").as[Long].collect().toSet
    def recallAt(probe: Int): Double = {
      val approx = Similarity.lshTopK(emb, q, 10, planes = 8,
          multiProbe = probe)
        .select("vec_id").as[Long].collect().toSet
      (exact & approx).size.toDouble / exact.size
    }
    val r0 = recallAt(0)
    val r8 = recallAt(8)
    assert(r8 >= r0) // probing more buckets can only add candidates
    // with all 9 buckets probed the top hit must still rank first
    val top = Similarity.lshTopK(emb, q, 10, planes = 8, multiProbe = 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(top.head == 1L)
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

  test("blocked kNN graph keeps mutual pairs only and respects blocks") {
    import spark.implicits._
    // block A: v1 ≈ v2 (mutual top-1); v3's nearest is v2, but v2's
    // top-1 is v1, so (2,3) is one-sided at k=1 → filtered.
    // block B: v4 ≈ v5 mutual. Cross-block near-identical vectors
    // (v1 vs v4) must NOT pair — blocking is the contract.
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f), 0),
      (2L, Seq(0.99f, 0.1f, 0.0f), 0),
      (3L, Seq(0.6f, 0.75f, 0.0f), 0),
      (4L, Seq(1.0f, 0.0f, 0.0f), 1),
      (5L, Seq(0.98f, 0.05f, 0.1f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.blockedKnnGraph(rows, col("label"), k = 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (4L, 5L)))
  }

  test("blocked kNN graph at full k is symmetric-complete within a block") {
    import spark.implicits._
    // k = block size − 1 makes every pair mutual: C(3,2) pairs
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f), 7), (2L, Seq(0.9f, 0.1f), 7),
      (3L, Seq(0.0f, 1.0f), 7))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.blockedKnnGraph(rows, col("label"), k = 2)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
