package graft.operators

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val ev = Seq(
    // user 1: full ordered funnel
    (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
    // user 2: clicked BEFORE viewing — click must not count; no
    // click after the view, so the funnel stalls at stage 2
    (2L, "click", 50L), (2L, "view", 100L),
    // user 3: purchase before the click → not a conversion of this
    // funnel ordering; re-purchases later, after the click — counts
    (3L, "view", 10L), (3L, "purchase", 20L), (3L, "click", 30L),
    (3L, "purchase", 40L),
    // user 4: never viewed → not in the funnel base at all
    (4L, "click", 10L), (4L, "purchase", 20L),
    // noise types are ignored
    (1L, "error", 150L)
  ).toDF("user_id", "event_type", "ts_us")

  private def run() =
    Funnel.conversion(ev, Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap

  test("stage times are the earliest AT OR AFTER the previous stage") {
    val m = run()
    assert(m(1L) == ((Some(100L), Some(200L), Some(300L))))
    assert(m(3L) == ((Some(10L), Some(30L), Some(40L))))
  }

  test("out-of-order events don't convert; drop-off leaves NULLs") {
    val m = run()
    assert(m(2L) == ((Some(100L), None, None)))
    assert(!m.contains(4L)) // no stage-1 event → outside the base
  }

  test("same-timestamp stage events satisfy the >= ordering") {
    val sim = Seq((9L, "view", 5L), (9L, "click", 5L))
      .toDF("user_id", "event_type", "ts_us")
    val m = Funnel.conversion(sim, Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(m(9L) == Some(5L))
  }
}
