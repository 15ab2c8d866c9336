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

  test("time-weighted average: hand trapezoid beats the plain mean") {
    // k: v=0 for 10 µs then v=100 for 90 µs (samples at t=0,10,100):
    //   ∫ = (0+0)/2·10 + ... trapezoid: (0+100)/2·10 + (100+100)/2·90
    //     = 500 + 9000·... → num = Σ(v_i+v_{i+1})Δt = 100·10 + 200·90
    //     = 19000, twa = 19000/(2·100) = 95.0 — the burst-weighted
    //     plain mean would say 66.67.
    val df = Seq(("k", 0L, 0L, 1L), ("k", 10L, 100L, 2L),
      ("k", 100L, 100L, 3L)).toDF("g", "t", "v", "id")
    val r = TimeSeries.timeWeightedAvg(df, Seq("g"), "t", col("v"), "id")
      .collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 100L)
    assert(r.getLong(3) == 95000000L)
  }

  test("time-weighted average: singletons and zero spans return NULL") {
    val df = Seq(("solo", 5L, 7L, 1L), ("tie", 3L, 1L, 1L),
      ("tie", 3L, 9L, 2L)).toDF("g", "t", "v", "id")
    val rows = TimeSeries.timeWeightedAvg(df, Seq("g"), "t", col("v"), "id")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("solo").isNullAt(3))
    assert(rows("tie").getLong(2) == 0L && rows("tie").isNullAt(3))
  }

  test("time-weighted average: duplicate timestamps contribute zero width") {
    // duplicate t=10 rows (tie-broken by id) add a zero-width segment;
    // the integral is unchanged vs the deduped series
    val df = Seq(("k", 0L, 10L, 1L), ("k", 10L, 20L, 2L),
      ("k", 10L, 80L, 3L), ("k", 20L, 20L, 4L)).toDF("g", "t", "v", "id")
    val r = TimeSeries.timeWeightedAvg(df, Seq("g"), "t", col("v"), "id")
      .collect().head
    // segments: (10+20)/2·10 (t0→10, v 10→20 via id=2 first), 0-width
    // (20+80), then (80+20)/2·10 → num = 30·10 + 0 + 100·10 = 1300,
    // twa = 1300/(2·20) = 32.5
    assert(r.getLong(3) == 32500000L)
  }

  test("autocorr: perfectly periodic series has acf(period) = +1") {
    // x = 1,2,1,2,... → lag 2 pairs are identical (r = 1); lag 1 pairs
    // are perfectly anti-phase (r = −1).
    val df = (1L to 12L).map(t => (t, if (t % 2 == 0) 2L else 1L))
      .toDF("t", "x")
    val m = TimeSeries.autocorr(df, "t", "x", Seq(1, 2))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(m(2) == ((10L, 1000000L)), m)
    assert(m(1) == ((11L, -1000000L)), m)
  }

  test("autocorr pairs only overlapping ticks — gaps drop pairs") {
    val df = Seq((1L, 5L), (2L, 6L), (4L, 9L), (5L, 3L)).toDF("t", "x")
    val n = TimeSeries.autocorr(df, "t", "x", Seq(1)).collect().head
    assert(n.getLong(1) == 2L, "only (1,2) and (4,5) are adjacent")
  }

  test("cusum peaks exactly at a planted level shift") {
    // 5 ticks at level 10 then 5 at level 30: |S'| max at the boundary.
    val df = ((1L to 5L).map((_, 10L)) ++ (6L to 10L).map((_, 30L)))
      .toDF("t", "x")
    val rows = TimeSeries.cusum(df, "t", "x")
      .orderBy(abs(col("cusum_scaled")).desc).collect()
    assert(rows.head.getLong(0) == 5L, rows.mkString(","))
    // S'_5 = n·P_5 − 5·T = 10·50 − 5·200 = −500
    assert(rows.head.getLong(2) == -500L)
    // a constant series is identically zero
    val flat = (1L to 6L).map((_, 7L)).toDF("t", "x")
    assert(TimeSeries.cusum(flat, "t", "x").collect()
      .forall(_.getLong(2) == 0L))
  }

  test("mann-kendall: monotone up, flat, and tie-corrected variance") {
    // strictly increasing: S = n(n−1)/2 = 10, z > 0
    val up = (1L to 5L).map(t => (t, t * 2)).toDF("t", "x")
    val r = TimeSeries.mannKendall(up, "t", "x").collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L)
    // Var = 5·4·15/18 = 16.667, z = 9/sqrt(16.667) = 2.204541
    assert(r.getLong(2) == 2204541L, r.getLong(2))
    // all-equal series: S = 0, tie term kills the variance → z = 0
    val flat = (1L to 4L).map((_, 9L)).toDF("t", "x")
    val f = TimeSeries.mannKendall(flat, "t", "x").collect().head
    assert(f.getLong(1) == 0L && f.getLong(2) == 0L)
  }

  test("covered duration merges overlaps, keeps gaps, drops zero-length") {
    val iv = Seq(
      ("a", 0L, 10L), ("a", 5L, 15L),   // overlap → union [0,15) = 15
      ("a", 20L, 25L),                  // gap [15,20) not covered
      ("b", 3L, 3L),                    // zero-length → 0
      ("c", 0L, 4L), ("c", 4L, 8L)      // back-to-back → 8, no gap
    ).toDF("k", "t0", "t1")
    val got = TimeSeries.coveredDuration(iv, Seq("k"), "t0", "t1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 20L, "b" -> 0L, "c" -> 8L))
  }

  test("covered duration: containment collapses to the outer interval") {
    val iv = Seq(("k", 0L, 100L), ("k", 10L, 20L), ("k", 30L, 40L))
      .toDF("k", "t0", "t1")
    val got = TimeSeries.coveredDuration(iv, Seq("k"), "t0", "t1")
      .collect().head.getLong(1)
    assert(got === 100L)
  }
}
