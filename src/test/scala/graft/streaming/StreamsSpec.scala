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

  test("sessionize closes sessions when the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(ms: Long) = new Timestamp(ms)
    val in = MemoryStream[Streams.Click]
    val q = Streams.sessionize(in.toDS(), gapMs = 1000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      in.addData(Streams.Click(7L, ts(1000)), Streams.Click(7L, ts(1500)),
        Streams.Click(8L, ts(1200)))
      q.processAllAvailable()
      // event at t=60s pushes the watermark far past both sessions' gaps
      in.addData(Streams.Click(9L, ts(60000)))
      q.processAllAvailable()
      val out = spark.sql("SELECT userId, nEvents, startMs, endMs FROM sessions")
        .as[(Long, Int, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(out.get(7L).contains((2, 1000L, 1500L)))
      assert(out.get(8L).contains((1, 1200L, 1200L)))
      assert(!out.contains(9L)) // its session is still open
    } finally q.stop()
  }
}
