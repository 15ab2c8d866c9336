package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target = docs labeled "t"; "good" appears only in target, "bad"
  // only in raw-non-target, "meh" everywhere.
  private lazy val docs = Seq(
    (1L, "t", "good good meh"),
    (2L, "t", "good meh meh"),
    (3L, "r", "bad bad meh"),
    (4L, "r", "bad meh meh")
  ).toDF("doc_id", "lab", "text")

  test("log ratios: target-only token positive, raw-only negative") {
    val lr = Dsir.logRatios(docs, col("lab") === "t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lr("good") > 0L)
    assert(lr("bad") < 0L)
    // hand-check "good": tc=3, rc=3, T=6, R=12, V=3 ->
    // ln( (4/9) / (4/15) ) = ln(5/3)
    val expect = math.floor(math.log((4.0 / 9.0) / (4.0 / 15.0)) * 1e6 +
      0.5).toLong
    assert(lr("good") === expect)
  }

  test("weights rank target-like docs above raw-like docs") {
    val w = Dsir.importanceWeights(docs, col("lab") === "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(1L) > w(3L) && w(1L) > w(4L))
    assert(w(2L) > w(3L))
    // doc 1 has one more "good" than doc 2 -> strictly heavier
    assert(w(1L) > w(2L))
  }

  test("weight is the exact integer dot product of counts and ratios") {
    val lr = Dsir.logRatios(docs, col("lab") === "t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = Dsir.importanceWeights(docs, col("lab") === "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(1L) === 2 * lr("good") + lr("meh"))
    assert(w(3L) === 2 * lr("bad") + lr("meh"))
  }
}
