package graft.functions

import graft.SparkSpec
import graft.ml.Similarity
import org.apache.spark.sql.functions._

class VecExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native dot is bit-identical to the fold on real embeddings") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .as[Seq[Float]].head()
    val qc = array(q.map(lit(_)): _*)
    val both = emb.select(col("vec_id"),
      Similarity.dotFold(col("embedding"), qc).as("fold"),
      VecFunctions.dotFF(col("embedding"), qc).as("native"))
    val mismatches = both.filter(col("fold") =!= col("native")).count()
    assert(mismatches == 0L)
  }

  test("native cosine is bit-identical to the fold cosine") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") === 9).select("embedding")
      .as[Seq[Float]].head()
    val qc = array(q.map(lit(_)): _*)
    val m = emb.select(
      (Similarity.dotFold(col("embedding"), qc) / (sqrt(Similarity.dotFold(col("embedding"), col("embedding"))) * sqrt(Similarity.dotFold(qc, qc)))).as("fold"),
      VecFunctions.cosineFF(col("embedding"), qc).as("native"))
      .filter(col("fold") =!= col("native")).count()
    assert(m == 0L)
  }

  test("signProjection is bit-identical to per-plane fold buckets") {
    // the bucket value lshBuckets used to build from per-plane
    // zip_with/aggregate folds, for small AND codegen-cliff plane
    // counts (44 chained folds is where whole-stage codegen bails)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    for (planes <- Seq(8, 24, 44)) {
      val m = Similarity.planeMatrix(planes, 64)
      val foldBucket = (0 until planes).map { p =>
        val plane = array(m(p).map(lit(_)): _*)
        val v = transform(col("embedding"), _.cast("double"))
        when(aggregate(zip_with(v, plane, _ * _), lit(0.0), _ + _) > 0,
          lit(1L << p)).otherwise(0L)
      }.reduce(_ + _)
      val mismatches = emb.select(
          foldBucket.as("fold"),
          VecFunctions.signProjection(col("embedding"), m).as("native"))
        .filter(col("fold") =!= col("native")).count()
      assert(mismatches == 0L, s"planes=$planes")
    }
  }

  test("signProjection rejects wrong-length vectors loudly") {
    import spark.implicits._
    val m = Similarity.planeMatrix(4, 8)
    val bad = Seq(Seq(1f, 2f)).toDF("v")
    val e = intercept[Exception] {
      bad.select(VecFunctions.signProjection(col("v"), m)).collect()
    }
    assert(e.getMessage.contains("expected 8-dim") ||
      e.getCause.getMessage.contains("expected 8-dim"))
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    val a = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val got = a.select(VecFunctions.dotFF(col("a"), col("b")))
      .as[Double].head()
    assert(got == (4.0 + 10.0 + 18.0))
    // mismatched lengths raise (never silently truncate — the contract
    // is equal-length non-null embeddings)
    val short = Seq((Seq(1f, 2f), Seq(3f))).toDF("a", "b")
    val e = intercept[Exception] {
      short.select(VecFunctions.dotFF(col("a"), col("b")))
        .as[Double].head()
    }
    assert(e.getMessage.contains("equal-length") ||
      Option(e.getCause).exists(_.getMessage.contains("equal-length")))
  }
}
