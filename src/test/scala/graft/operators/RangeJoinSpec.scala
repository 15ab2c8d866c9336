package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // Intervals per key; width 10 buckets several of them.
  private val intervals = Seq(
    (1L, 10L, 100L, "a"),   // spans buckets 1..10
    (1L, 150L, 150L, "b"),  // zero-length: matches only pt == 150
    (1L, 90L, 120L, "c"),   // overlaps interval a on [90, 100]
    (2L, 0L, 5L, "d"),
    (3L, 80L, 20L, "bad")   // inverted: must match nothing
  ).toDF("k", "start", "end", "tag")

  private val points = Seq(
    (1L, 10L, "p-start"),   // == start boundary of a
    (1L, 100L, "p-end"),    // == end of a AND inside c
    (1L, 55L, "p-mid"),     // inside a only
    (1L, 150L, "p-zero"),   // the zero-length interval
    (1L, 149L, "p-miss"),   // in no interval
    (2L, 5L, "p-k2"),       // key isolation: matches d only
    (3L, 50L, "p-k3")       // only the inverted interval's key
  ).toDF("k", "pt", "name")

  private def run(width: Long) =
    RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "pt", "start", "end", width)
      .select("name", "tag").as[(String, String)].collect().toSet

  private val expected = Set(
    "p-start" -> "a", "p-end" -> "a", "p-end" -> "c", "p-mid" -> "a",
    "p-zero" -> "b", "p-k2" -> "d")

  test("closed-interval containment, boundaries included, keys isolated") {
    assert(run(10L) == expected)
  }

  test("pairs emerge exactly once even when intervals span many buckets") {
    val rows = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "pt", "start", "end", 3L)
      .select("name", "tag").as[(String, String)].collect().toSeq
    assert(rows.size == rows.distinct.size)
    assert(rows.toSet == expected)
  }

  test("result is bucket-width invariant") {
    assert(run(1L) == expected)
    assert(run(1000L) == expected) // everything in one bucket
  }

  test("inverted intervals match nothing") {
    assert(!run(10L).exists(_._2 == "bad"))
  }
}
