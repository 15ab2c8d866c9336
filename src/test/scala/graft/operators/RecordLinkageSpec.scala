package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  // 4 records in one block; fields f (two values, 50/50) and g (unique
  // per record except 1-2 agree).
  private val recs = Seq(
    (1L, "b", "x", "p"), (2L, "b", "x", "p"),
    (3L, "b", "y", "q"), (4L, "b", "y", "r")
  ).toDF("id", "blk", "f", "g")

  private def scores(threshold: Long = Long.MinValue) =
    RecordLinkage.fellegiSunter(recs, "id", Seq("blk"),
      Seq("f" -> col("f"), "g" -> col("g")),
      m = 0.875, thresholdMicros = threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("scores equal the hand-computed log-likelihood ratios") {
    // u_f = (2²+2²)/16 = 0.5; u_g = (2²+1+1)/16 = 0.375.
    def mic(d: Double) = math.floor(d * 1e6 + 0.5).toLong
    val wfA = mic(math.log(0.875 / 0.5))
    val wfD = mic(math.log(0.125 / (1.0 - 0.5)))
    val wgA = mic(math.log(0.875 / 0.375))
    val wgD = mic(math.log(0.125 / (1.0 - 0.375)))
    val m = scores()
    assert(m((1L, 2L)) == wfA + wgA) // agree on both
    assert(m((3L, 4L)) == wfA + wgD) // f agrees, g differs
    assert(m((1L, 3L)) == wfD + wgD) // nothing agrees
    assert(m.size == 6)              // all blocked pairs, a < b once
  }

  test("threshold keeps only the matching pair") {
    val m = scores(threshold = 1000000L)
    assert(m.keySet == Set((1L, 2L)))
  }

  test("blocking prevents cross-block pairs entirely") {
    val two = Seq((1L, "b1", "x"), (2L, "b2", "x")).toDF("id", "blk", "f")
    val out = RecordLinkage.fellegiSunter(two, "id", Seq("blk"),
      Seq("f" -> col("f")), thresholdMicros = Long.MinValue)
    assert(out.count() == 0)
  }
}
