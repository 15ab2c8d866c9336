package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {

  test("windowed counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val df = in.toDF().toDF("ts", "event_type")
    val q = Streams.windowedCounts(df, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      def t(min: Int) = new Timestamp(3600_000L + min * 60_000L)
      in.addData((t(1), "click"), (t(2), "click"), (t(3), "view"))
      q.processAllAvailable()
      // advance the watermark far enough to close the first window
      in.addData((t(60), "click"))
      q.processAllAvailable()
      val out = spark.sql("SELECT event_type, cnt FROM win_counts")
        .as[(String, Long)].collect().toMap
      assert(out === Map("click" -> 2L, "view" -> 1L))
    } finally q.stop()
  }

  test("checkpoint restart resumes offsets and window state exactly") {
    import spark.implicits._
    // The replay splits at the timestamp midpoint (here 2h+10µs), so
    // the 2h window has one event on each side of the restart: its
    // count is 2 ONLY if batch 0's partial state survives the
    // query-object boundary, and exactly 2 ONLY if the offset log
    // prevents incarnation 2 from re-reading batch 0.
    val hourUs = 3600L * 1000000L
    val evs = Seq(
      (1 * hourUs + 10, "click"), (1 * hourUs + 20, "view"),
      (2 * hourUs + 10, "click"), (2 * hourUs + 30, "click"),
      (3 * hourUs + 10, "view"))
      .toDF("us", "event_type")
      .select((col("us") * 1000L).as("ts"), col("event_type"))
    val out = Streams
      .windowedCountsRestartReplay(evs, "1 hour", "30 minutes")
      .as[(Long, String, Long)].collect().toSet
    assert(out === Set(
      (1 * hourUs, "click", 1L), (1 * hourUs, "view", 1L),
      (2 * hourUs, "click", 2L), (3 * hourUs, "view", 1L)))
  }

  test("streaming dedup drops cross-batch duplicates within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val df = in.toDF().toDF("ts", "user_id", "event_type")
    val q = df.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      def t(min: Int) = new Timestamp(3600_000L + min * 60_000L)
      in.addData((t(1), 7L, "click"), (t(1), 8L, "view"))
      q.processAllAvailable()
      // same keys again in a LATER batch, within the watermark delay:
      // state must still hold them, so nothing new is emitted
      in.addData((t(3), 7L, "click"), (t(4), 8L, "view"),
        (t(5), 9L, "click"))
      q.processAllAvailable()
      val out = spark.sql("SELECT user_id, event_type FROM dedup_out")
        .as[(Long, String)].collect().toSet
      assert(out === Set((7L, "click"), (8L, "view"), (9L, "click")))
    } finally q.stop()
  }

  private def click(user: Long, ms: Long) =
    Streams.Click(user, new Timestamp(ms), ms * 1000)

  test("sessionize closes sessions when the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Click]
    val q = Streams.sessionize(in.toDS(), gapUs = 1000000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      in.addData(click(7L, 1000), click(7L, 1500), click(8L, 1200))
      q.processAllAvailable()
      // event at t=60s pushes the watermark far past both sessions' gaps
      in.addData(click(9L, 60000))
      q.processAllAvailable()
      in.addData(click(9L, 120000)) // second tick fires the timeouts
      q.processAllAvailable()
      val out = spark.sql("SELECT userId, nEvents, startUs, endUs FROM sessions")
        .as[(Long, Int, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(out.get(7L).contains((2, 1000000L, 1500000L)))
      assert(out.get(8L).contains((1, 1200000L, 1200000L)))
      // 9's first session flushed by the second tick; the 120s one is
      // still open and must NOT have been emitted
      assert(out.get(9L).contains((1, 60000000L, 60000000L)))
    } finally q.stop()
  }

  test("sessionize splits gap-straddling rows inside one batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Click]
    val q = Streams.sessionize(in.toDS(), gapUs = 1000000)
      .writeStream.format("memory").queryName("sessions_split")
      .outputMode("append").start()
    try {
      // one batch, two sessions for user 5 (gap 1s, events 3s apart) —
      // the completed first session must emit without any watermark help
      in.addData(click(5L, 1000), click(5L, 1200), click(5L, 4200))
      q.processAllAvailable()
      val out = spark.sql(
        "SELECT nEvents, startUs, endUs FROM sessions_split")
        .as[(Int, Long, Long)].collect()
      assert(out.toSet === Set((2, 1000000L, 1200000L)))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch semantics") {
    import spark.implicits._
    // ts is LONG nanoseconds, as the events table reads it
    val ev = Seq(
      (1L, "click", 1L, 1000L), // us = 1
      (1L, "purchase", 2L, 2000000000L), // 2s later → within 1h
      (1L, "purchase", 3L, 7201000000000L), // 7201s → outside 1h
      (2L, "purchase", 4L, 500L), // before user 2's click → no match
      (2L, "click", 5L, 1000000L)
    ).toDF("user_id", "event_type", "event_id", "ts")
    val out = Streams.intervalJoinReplay(ev, windowSec = 3600)
      .select("c_event", "p_event").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  test("streaming HLL snapshot finishes to the exact batch estimate") {
    import spark.implicits._
    // 400 users with duplicates; the replay splits them into two real
    // micro-batches by hash, so the complete-mode max-agg must merge
    // register state across batches to match the one-shot batch sketch.
    val ev = spark.range(1200).select((col("id") % 400).as("user_id"))
    val streamed = graft.sketch.Sketches.hllEstimate(
      Streams.hllReplay(ev, p = 8), p = 8).collect().head
    val batch = graft.sketch.Sketches.hllDistinct(
      ev.select(col("user_id").cast("string").as("v")), col("v"), p = 8)
      .collect().head
    assert(streamed === batch)
    val est = streamed.getAs[Long]("est_micros").toDouble / 1e6
    assert(math.abs(est - 400) / 400.0 < 0.15, s"est=$est")
  }

  test("stream-static join replay equals the batch join + rollup") {
    import spark.implicits._
    // 60 events over 6 users, two of which have no dim row (dropped by
    // the inner join); replay splits events into two real micro-batches.
    val ev = spark.range(60).select(
      (col("id") % 6).as("user_id"),
      (col("id") * 1.25 + 0.1).as("value"),
      col("id").as("event_id"),
      lit(1L).as("ts"))
    val dim = Seq((0L, "A"), (1L, "A"), (2L, "B"), (3L, "B"))
      .toDF("c_custkey", "c_mktsegment")
    val streamed = Streams.streamStaticJoinReplay(ev, dim)
      .orderBy("segment")
      .as[(String, Long, Long)].collect().toSeq
    val batch = ev.join(dim, ev("user_id") === dim("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.util.Exact.cents(col("value"))).as("value_cents"))
      .orderBy("segment")
      .as[(String, Long, Long)].collect().toSeq
    assert(streamed == batch)
    assert(streamed.map(_._1) == Seq("A", "B"))
  }

  test("streaming admission pairs = incremental probe's old×delta slice") {
    import spark.implicits._
    val old = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different content about database engines and columnar storage"),
      (3L, "a third unrelated document mentioning graphs and adjacency structures here"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (11L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (12L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (13L, "nothing in the corpus resembles this sentence about astronomy and telescopes"))
      .toDF("doc_id", "text")
    val streamed = Streams.nearDupAdmissionReplay(old, delta,
        shingleN = 3, numHashes = 12, rowsPerBand = 3, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // batch truth: the incremental probe restricted to cross pairs
    // (11 and 12 both hit doc 1; 11-12 is a delta-self pair the
    // admission gate deliberately leaves to the end-of-cycle batch)
    val inc = graft.dedup.Dedup.incrementalNearDups(old, delta,
        shingleN = 3, numHashes = 12, rowsPerBand = 3, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
      .filter(p => (p._1 > 10) != (p._2 > 10))
    assert(streamed === inc)
    assert(streamed === Set((1L, 11L), (1L, 12L)))
  }

  test("mapGroupsWithState running totals match the batch GROUP BY") {
    import spark.implicits._
    // every user appears in BOTH hash-halves with high probability
    // (40 events / 4 users), so the state genuinely carries across
    // micro-batches; final per-user emission = batch totals.
    val ev = spark.range(40).select(
      (col("id") % 4).as("user_id"),
      (col("id") * 0.5).as("value"),
      col("id").as("event_id"),
      (col("id") * 1000000000L).as("ts"))
    val streamed = Streams.runningTotalsReplay(ev)
      .orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val batch = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(graft.util.Exact.cents(col("value"))).as("value_cents"),
        max(expr("ts div 1000")).as("last_us"))
      .orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamed == batch)
  }

  test("crawl loop on a ProcessingTime trigger commits each pass's " +
      "index as a pinned version") {
    import spark.implicits._
    // page C is only discoverable through A, so it is fetched on the
    // SECOND firing — version 1 and version 2 must differ, and version
    // 1 must stay re-readable verbatim after version 2 commits
    val site = Map(
      "http://a.com/" -> ("<html><head><title>A</title></head><body>" +
        "<a href=\"http://c.com/\">c</a> alpha</body></html>"),
      "http://b.com/" -> ("<html><head><title>B</title></head><body>" +
        "beta</body></html>"),
      "http://c.com/" -> ("<html><head><title>C</title></head><body>" +
        "gamma</body></html>"))
    val seeds = Seq(("http://a.com/", 0L), ("http://b.com/", 0L))
      .toDF("url", "retrieved_at")
    val root = graft.util.TempDirs.scratch("crawl_versions")
    val latest = Streams.crawlLoopVersioned(seeds,
      graft.crawl.Crawl.TableUrlGetter(site), root, passes = 2)
    assert(latest == 2L)
    val v1 = graft.store.Versioned.read(spark, root, 1)
      .select("url").as[String].collect().toSet
    val v2 = graft.store.Versioned.read(spark, root, 2)
      .select("url").as[String].collect().toSet
    assert(v1 == Set("http://a.com/", "http://b.com/"))
    assert(v2 == v1 + "http://c.com/")
    // the pinned pass-1 snapshot is immune to the pass-2 commit
    assert(graft.store.Versioned.read(spark, root, 1).count() == 2)
  }
}
