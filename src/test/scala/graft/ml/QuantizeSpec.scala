package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
    (2L, Seq(-0.003f, 0.002f, 0.001f, -0.001f)),
    (3L, Seq(2.0f, 2.0f, -2.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("codes stay in [-127, 127] and extremes map to ±127") {
    val codes = vecs.select(col("vec_id"),
        Quantize.quantize(col("embedding"),
          Quantize.scaleOf(col("embedding"))).as("q"))
      .as[(Long, Seq[Byte])].collect().toMap
    codes.values.flatten.foreach(b => assert(b >= -127 && b <= 127))
    assert(codes(1L)(1) === (-127: Byte)) // x = -scale
    assert(codes(3L)(0) === (127: Byte))  // x = +scale
  }

  test("round-trip error is bounded by scale/254 (+ fp slack)") {
    val rows = vecs.select(col("vec_id"),
      Quantize.scaleOf(col("embedding")).as("s"),
      array_max(Quantize.dequantize(
        Quantize.quantize(col("embedding"),
          Quantize.scaleOf(col("embedding"))),
        Quantize.scaleOf(col("embedding")))).as("dq_max"))
    Quantize.roundtripStats(vecs).collect().foreach { r =>
      val scale = r.getAs[Long]("scale_micros") / 1e6
      val err = r.getAs[Long]("max_err_micros") / 1e6
      assert(err <= scale / 254.0 + 1e-9,
        s"vec ${r.get(0)}: err=$err bound=${scale / 254.0}")
    }
    assert(rows.count() === 3)
  }

  test("neighbor ordering survives quantization on separated vectors") {
    // 3 well-separated directions: nearest neighbor by dot product must
    // be unchanged after the int8 round trip.
    val base = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (12L, Seq(0.0f, 0.0f, 1.0f, 0.2f))
    ).toDF("vec_id", "embedding")
    val deq = base.select(col("vec_id"),
      Quantize.dequantize(
        Quantize.quantize(col("embedding"), Quantize.scaleOf(col("embedding"))),
        Quantize.scaleOf(col("embedding"))).as("d"))
      .as[(Long, Seq[Double])].collect().toMap
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map(t => t._1 * t._2).sum
    val q = deq(10L)
    val nearest = Seq(11L, 12L).maxBy(i => dot(q, deq(i)))
    assert(nearest === 11L)
  }
}
