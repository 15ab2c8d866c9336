package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val series = Seq(
    ("a", 10L, 5L), ("a", 13L, 7L),  // gap at 11, 12
    ("b", 3L, 1L),                   // singleton span
    ("c", 1L, 2L), ("c", 2L, 4L)     // already dense
  ).toDF("k", "t", "v")

  private def run() =
    TimeSeries.gapFill(series, Seq("k"), "t", fill = Map("v" -> lit(0L)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap

  test("gaps are synthesized inside each key's own span, filled + flagged") {
    val m = run()
    assert(m(("a", 10L)) == ((5L, false)))
    assert(m(("a", 11L)) == ((0L, true)))
    assert(m(("a", 12L)) == ((0L, true)))
    assert(m(("a", 13L)) == ((7L, false)))
  }

  test("no extrapolation beyond observed bounds; singletons stay single") {
    val m = run()
    assert(!m.contains(("a", 9L)) && !m.contains(("a", 14L)))
    assert(m(("b", 3L)) == ((1L, false)))
    assert(m.count(_._1._1 == "b") == 1)
  }

  test("dense series pass through unchanged") {
    val m = run()
    assert(m(("c", 1L)) == ((2L, false)))
    assert(m(("c", 2L)) == ((4L, false)))
    assert(m.count(_._1._1 == "c") == 2)
  }

  test("unfilled measures stay NULL on synthesized rows") {
    val out = TimeSeries.gapFill(series, Seq("k"), "t")
      .filter(col("is_gap"))
      .select("v").collect()
    assert(out.length == 2 && out.forall(_.isNullAt(0)))
  }

  private def peaks(iv: Seq[(String, Long, Long)]): Map[String, Long] =
    TimeSeries.peakConcurrency(iv.toDF("k", "t0", "t1"), Seq("k"), "t0", "t1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("peak concurrency: overlapping stack counts, disjoint stays 1") {
    val m = peaks(Seq(
      ("a", 0L, 10L), ("a", 5L, 15L), ("a", 7L, 9L),   // 3 deep at t=7..8
      ("b", 0L, 5L), ("b", 5L, 10L),                    // half-open: no touch
      ("c", 1L, 2L)))
    assert(m == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("peak concurrency: equal start instants pre-sum with no ambiguity") {
    // 4 intervals all opening at t=0; one closes before the 5th opens.
    val m = peaks(Seq(
      ("k", 0L, 3L), ("k", 0L, 3L), ("k", 0L, 5L), ("k", 0L, 1L),
      ("k", 3L, 9L)))
    assert(m == Map("k" -> 4L))
  }
}
