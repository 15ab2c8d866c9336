package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface. The reference's "streaming" is a
  * periodic batch re-crawl (`monolith/service/crawler/crawler.go:50-76`)
  * plus gRPC result streams — here the faithful upgrade is an
  * incremental query over an append stream:
  *  - [[windowedCounts]]: watermarked tumbling-window aggregation (the
  *    canonical events rollup);
  *  - [[sessionize]]: per-key session building with
  *    `flatMapGroupsWithState` (custom state, the BSP-mailbox analogue);
  *  - [[crawlTrigger]]: the crawl cadence as a `Trigger.ProcessingTime`
  *    query would drive `Crawl.pass` via `foreachBatch`.
  */
object Streams {

  /** Tumbling-window event counts with a watermark: late rows beyond
    * `lateness` are dropped, state is bounded — the 100 TB-safe shape. */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour",
                     lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"))

  final case class Click(userId: Long, ts: java.sql.Timestamp)
  final case class Session(userId: Long, nEvents: Int, startMs: Long,
                           endMs: Long)

  /** Session windows via custom state: a session closes after `gapMs`
    * of event-time inactivity. Event-time timeouts (not processing
    * time) keep the query deterministic and replayable — the watermark,
    * not the wall clock, fires session expiry, and state stays bounded
    * by the watermark delay. */
  def sessionize(clicks: org.apache.spark.sql.Dataset[Click],
                 gapMs: Long): org.apache.spark.sql.Dataset[Session] = {
    import clicks.sparkSession.implicits._
    clicks.withWatermark("ts", s"$gapMs milliseconds")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Click],
         state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.iterator
            state.remove()
            out
          } else {
            val events = rows.map(_.ts.getTime).toSeq
            if (events.isEmpty) Iterator.empty
            else {
              val cur = state.getOption
                .map(s => Session(userId, s.nEvents + events.size,
                  math.min(s.startMs, events.min),
                  math.max(s.endMs, events.max)))
                .getOrElse(Session(userId, events.size, events.min,
                  events.max))
              state.update(cur)
              state.setTimeoutTimestamp(cur.endMs + gapMs)
              Iterator.empty
            }
          }
      }
  }

  /** The crawl loop as a streaming query skeleton: rate source ticks,
    * `foreachBatch` runs one crawl pass per tick. Returned unstarted so
    * tests/callers own the lifecycle. */
  def crawlTrigger(spark: SparkSession, intervalSec: Int)(
      passFn: Long => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(s"$intervalSec seconds"))
      .foreachBatch { (_: DataFrame, batchId: Long) => passFn(batchId) }
}
