package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.Streams

/** Driver-checked streaming queries.
  *
  * q43 replays the events table through the REAL Structured-Streaming
  * sessionizer (file source → flatMapGroupsWithState → foreachBatch →
  * parquet) and must hash-match the same DuckDB oracle as the batch
  * q36 — the batch ≡ stream equality that makes the streaming path a
  * first-class, correctness-gated citizen rather than spec-only code.
  */
object StreamQueries {

  // Same 30-minute inactivity gap as q36, in microseconds.
  private val GapUs = 30L * 60 * 1000000

  private val DayUs = 86400L * 1000000L
  // q172 batch split: 2024-01-25T00:00:00Z — on-time flow before it,
  // stragglers + the rest after (events span Jan 1-31).
  private val SplitUs = 1706140800000000L

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q43_sessionize_stream",
      (s, dir) =>
        Streams.sessionizeReplay(Tables.events(s, dir), GapUs)
          .orderBy("user_id", "sess_no"),
      Some(s"""
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        flagged AS (
          SELECT user_id, event_id, ts_us,
                 CASE WHEN lag(ts_us) OVER w IS NULL
                        OR ts_us - lag(ts_us) OVER w > $GapUs
                      THEN 1 ELSE 0 END AS new_sess
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        sess AS (
          SELECT user_id, event_id, ts_us,
                 sum(new_sess) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sess_no
          FROM flagged)
        SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
               count(*) AS n_events,
               CAST(min(ts_us) AS BIGINT) AS start_us,
               CAST(max(ts_us) AS BIGINT) AS end_us
        FROM sess GROUP BY user_id, sess_no
        ORDER BY user_id, sess_no""")),

    // q44: the watermarked tumbling-window rollup, replayed through a
    // real Append-mode streaming run — finalized windows must equal the
    // batch GROUP BY over hour buckets.
    QuerySpec("q44_windowed_counts_stream",
      (s, dir) =>
        Streams.windowedCountsReplay(Tables.events(s, dir),
            "1 hour", "2 hours")
          .orderBy("win_start_us", "event_type"),
      Some("""
        SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us,
               event_type, count(*) AS cnt
        FROM events
        GROUP BY win_start_us, event_type
        ORDER BY win_start_us, event_type""")),

    // q208: checkpoint-restart recovery — q44's rollup with the
    // streaming query stopped after micro-batch 0 and REBUILT on the
    // same checkpointLocation (offset-log + state-store recovery across
    // the query-object boundary). Finalized output must equal the
    // uninterrupted replay, so the oracle is q44's batch GROUP BY
    // verbatim — windows straddling the restart undercount if state
    // recovery drops anything, and double-count if the offset log
    // replays batch 0.
    QuerySpec("q208_stream_restart_recovery",
      (s, dir) =>
        Streams.windowedCountsRestartReplay(Tables.events(s, dir),
            "1 hour", "2 hours")
          .orderBy("win_start_us", "event_type"),
      Some("""
        SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us,
               event_type, count(*) AS cnt
        FROM events
        GROUP BY win_start_us, event_type
        ORDER BY win_start_us, event_type""")),

    // q51: bounded-state streaming dedup — first occurrence per
    // (user_id, event_type) through dropDuplicatesWithinWatermark must
    // equal the batch DISTINCT.
    QuerySpec("q51_dedup_stream",
      (s, dir) =>
        Streams.dedupReplay(Tables.events(s, dir))
          .orderBy("user_id", "event_type"),
      Some("""
        SELECT DISTINCT user_id, event_type FROM events
        ORDER BY user_id, event_type""")),

    // q74: stream-stream interval join (click ⋈ purchase within the
    // following hour, same user) replayed through a real watermarked
    // streaming self-join; must equal the batch interval join exactly
    // (µs timestamps on both the condition and the output).
    QuerySpec("q74_interval_join_stream",
      (s, dir) =>
        Streams.intervalJoinReplay(Tables.events(s, dir),
            windowSec = 3600L)
          .orderBy("c_event", "p_event"),
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
          FROM events)
        SELECT c.user_id, c.event_id AS c_event, p.event_id AS p_event,
               c.ts_us AS c_us, p.ts_us AS p_us
        FROM ev c JOIN ev p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts_us >= c.ts_us AND p.ts_us <= c.ts_us + 3600000000
        ORDER BY c_event, p_event""")),

    // ------------------------------------------------------------------
    // Streaming HLL (q83's sketch fed through a complete-mode streaming
    // max-aggregation, two real micro-batches): the final register
    // snapshot must yield BIT-IDENTICAL estimator output to a batch
    // HLL over the same values — the oracle below is the plain batch
    // twin, so hash equality IS the batch ≡ stream sketch parity.
    // q141: stream-static join — the canonical streaming-enrichment
    // shape (per-batch broadcast join of the live stream against a
    // static dimension, no state). Replayed over two REAL micro-batches;
    // the complete-mode per-segment rollup must equal the batch join.
    QuerySpec("q141_stream_static_join",
      (s, dir) =>
        Streams.streamStaticJoinReplay(Tables.events(s, dir),
            Tables.customer(s, dir))
          .orderBy("segment"),
      Some(s"""
        SELECT c.c_mktsegment AS segment,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(${graft.util.Exact.centsSql("e.value")}) AS BIGINT)
                 AS value_cents
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1 ORDER BY 1""")),

    // q142: per-user running totals carried as explicit
    // mapGroupsWithState GroupState across two REAL micro-batches (the
    // unbounded per-key state machine); the final Update-mode emission
    // per user must equal the batch GROUP BY.
    QuerySpec("q142_running_totals_stream",
      (s, dir) =>
        Streams.runningTotalsReplay(Tables.events(s, dir))
          .orderBy("user_id"),
      Some(s"""
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(${graft.util.Exact.centsSql("value")}) AS BIGINT)
                 AS value_cents,
               CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
        FROM events GROUP BY 1 ORDER BY 1""")),

    // Native-aggregate streaming HLL (q93's twin through
    // `HllSketchAgg`): the register buffer IS the streaming state, one
    // 1 KiB object max-merged across the two real micro-batches. Same
    // oracle as q93 — batch ≡ stream ≡ native.
    QuerySpec("q202_hll_native_stream",
      (s, dir) => Streams.hllNativeReplay(Tables.events(s, dir), p = 10),
      Some("""
        WITH hs AS (SELECT
            CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
          FROM events),
        regs AS (
          SELECT h % 1024 AS idx,
                 CASE WHEN h // 1024 = 0 THEN 51
                      ELSE 51 - length(bin(h // 1024)) END AS rho
          FROM hs
          UNION ALL
          SELECT range AS idx, 0 AS rho FROM range(0, 1024)),
        mx AS (SELECT idx, max(rho) AS m_rho FROM regs GROUP BY idx),
        agg AS (SELECT
            count(CASE WHEN m_rho > 0 THEN 1 END) AS nonzero_regs,
            sum(CAST(power(2.0, 62 - m_rho) AS DECIMAL(38,0))) AS s
          FROM mx),
        est AS (SELECT
            CAST(nonzero_regs AS BIGINT) AS nonzero_regs,
            CAST(1024 - nonzero_regs AS BIGINT) AS zero_regs,
            ((0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0) * 1024.0
              * power(2.0, 62) / CAST(s AS DOUBLE) AS raw
          FROM agg)
        SELECT nonzero_regs, zero_regs,
          CAST(floor((CASE WHEN raw <= 2.5 * 1024.0 AND zero_regs > 0
                THEN 1024.0 * ln(1024.0 / CAST(zero_regs AS DOUBLE))
                ELSE raw END) * 1000000 + 0.5) AS BIGINT) AS est_micros
        FROM est""")),

    QuerySpec("q93_hll_stream",
      (s, dir) => graft.sketch.Sketches.hllEstimate(
        Streams.hllReplay(Tables.events(s, dir), p = 10), p = 10),
      Some("""
        WITH hs AS (SELECT
            CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
          FROM events),
        regs AS (
          SELECT h % 1024 AS idx,
                 CASE WHEN h // 1024 = 0 THEN 51
                      ELSE 51 - length(bin(h // 1024)) END AS rho
          FROM hs
          UNION ALL
          SELECT range AS idx, 0 AS rho FROM range(0, 1024)),
        mx AS (SELECT idx, max(rho) AS m_rho FROM regs GROUP BY idx),
        agg AS (SELECT
            count(CASE WHEN m_rho > 0 THEN 1 END) AS nonzero_regs,
            sum(CAST(power(2.0, 62 - m_rho) AS DECIMAL(38,0))) AS s
          FROM mx),
        est AS (SELECT
            CAST(nonzero_regs AS BIGINT) AS nonzero_regs,
            CAST(1024 - nonzero_regs AS BIGINT) AS zero_regs,
            ((0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0) * 1024.0
              * power(2.0, 62) / CAST(s AS DOUBLE) AS raw
          FROM agg)
        SELECT nonzero_regs, zero_regs,
          CAST(floor((CASE WHEN raw <= 2.5 * 1024.0 AND zero_regs > 0
                THEN 1024.0 * ln(1024.0 / CAST(zero_regs AS DOUBLE))
                ELSE raw END) * 1000000 + 0.5) AS BIGINT) AS est_micros
        FROM est""")),

    // q172: late-data DROP semantics, exactly — the events table
    // replays as two micro-batches (on-time flow, then stragglers mixed
    // with the post-split flow); the daily rollup's watermark after
    // batch 1 decides which stragglers die before reaching state. The
    // oracle recomputes that watermark from the same split rule — so
    // the lateness budget's behaviour is hash-checked, not just
    // "documented". See Streams.lateDropReplay.
    QuerySpec("q172_late_drop_stream",
      (s, dir) =>
        Streams.lateDropReplay(Tables.events(s, dir), SplitUs, "2 days")
          .orderBy("day_us", "event_type"),
      Some(s"""
        WITH et AS (
          SELECT epoch_us(ts) AS us, event_type, event_id FROM events),
        b1 AS (
          SELECT * FROM et WHERE us < $SplitUs AND event_id % 7 <> 0),
        wm AS (SELECT max(us) - ${2L * 86400L * 1000000L} AS wm_us FROM b1),
        b2 AS (
          SELECT * FROM et WHERE us >= $SplitUs OR event_id % 7 = 0),
        acc2 AS (
          SELECT b2.us, b2.event_type FROM b2, wm
          WHERE ((b2.us // ${DayUs}) + 1) * ${DayUs} > wm.wm_us),
        surv AS (
          SELECT us, event_type FROM b1
          UNION ALL SELECT us, event_type FROM acc2)
        SELECT (us // ${DayUs}) * ${DayUs} AS day_us, event_type,
               count(*) AS cnt
        FROM surv GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Exactly-once streaming ingest into the versioned store: each
    // micro-batch commits through a manifest-level (appId, batchId)
    // transaction, and the sink then RE-DELIVERS the identical batch —
    // the at-least-once failure foreachBatch exposes when a sink
    // crashes after committing but before its checkpoint advances. The
    // redelivery must be a no-op, so the committed table holds every
    // event exactly once — proven by the oracle's plain batch rollup
    // over the input (any duplicate doubles the sums; the per-user
    // count would betray even one).
    QuerySpec("q219_exactly_once_ingest",
      (s, dir) => {
        val root = graft.util.TempDirs.scratch("graft_ingest")
        Streams.exactlyOnceIngestReplay(
            Tables.events(s, dir).filter(col("user_id") < 50), root)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(col("cents")).as("value_cents"))
          .orderBy("user_id")
      },
      Some(s"""
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(${graft.util.Exact.centsSql("value")}) AS BIGINT)
                 AS value_cents
        FROM events WHERE user_id < 50
        GROUP BY 1 ORDER BY 1""")),

    // ------------------------------------------------------------------
    // Store-to-store streaming replication, SOURCE to SINK of the same
    // provider: the input store's commit log IS the stream (offsets =
    // versions, micro-batch = the committed delta's files), and the
    // format sink lands each batch in a second versioned store through
    // an exactly-once (appId, batchId) txn — the full lakehouse ingest
    // loop, commit log to commit log, zero foreachBatch boilerplate.
    // Three input commits interleaved with drains force three
    // micro-batches; the require pins the 1:1 commit↔batch mapping,
    // and the per-version rollup of the OUTPUT store replays the
    // input's slices exactly (version v holds o_orderkey % 3 < v).
    QuerySpec("q243_versioned_stream_pipe",
      (s, dir) => {
        import graft.store.Versioned
        val in = graft.util.TempDirs.scratch("graft_vs_in")
        val out = graft.util.TempDirs.scratch("graft_vs_out")
        val ckpt = graft.util.TempDirs.scratch("graft_vs_ckpt")
        def slice(k: Int) = Tables.orders(s, dir)
          .filter(pmod(col("o_orderkey"), lit(3L)) === k.toLong)
          .select(col("o_orderkey"),
            graft.util.Exact.cents(col("o_totalprice")).as("cents"))
        Versioned.commitAppend(slice(0), in)
        val q = s.readStream.format("graft.sources.VersionedStream")
          .option("root", in).load()
          .writeStream.format("graft.sources.VersionedStream")
          .option("root", out).option("appId", "q243_pipe")
          .option("checkpointLocation", ckpt).start()
        try {
          q.processAllAvailable()
          Versioned.commitAppend(slice(1), in); q.processAllAvailable()
          Versioned.commitAppend(slice(2), in); q.processAllAvailable()
        } finally q.stop()
        val latest = Versioned.latestVersion(out)
        require(latest == 3L,
          s"expected 3 streamed output commits, got $latest")
        (1L to 3L).map { v =>
          Versioned.read(s, out, v)
            .agg(count(lit(1)).as("n_orders"),
              sum(col("cents")).as("total_cents"))
            .select(lit(v).as("version"), col("n_orders"),
              col("total_cents"))
        }.reduce(_.unionByName(_)).orderBy("version")
      },
      Some((1 to 3).map { v =>
        s"""SELECT CAST($v AS BIGINT) AS version,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(${graft.util.Exact.centsSql("o_totalprice")})
                 AS BIGINT) AS total_cents
            FROM orders WHERE o_orderkey % 3 < $v"""
      }.mkString("\nUNION ALL\n") + "\nORDER BY version")),

    // ------------------------------------------------------------------
    // STREAMING change data feed: the commit log streams row CHANGES —
    // a deletion-vector commit arrives as 'delete' rows (materialized
    // from the tombstones, full schema), appends as 'insert' rows,
    // each stamped with its commit version; three drains against three
    // commits prove the 1:1 commit→batch mapping survives deletes.
    // This is the CDC hand-off of a lakehouse pipeline: a downstream
    // consumer (index refresh, aggregate maintenance, replication)
    // applies exact row-level changes whose cost tracks the delta.
    // Oracle replays the three change sets as literal selects.
    QuerySpec("q254_stream_change_feed",
      (s, dir) => {
        import graft.store.Versioned
        val in = graft.util.TempDirs.scratch("graft_cdfs_in")
        val outDir = graft.util.TempDirs.scratch("graft_cdfs_out")
        val ckpt = graft.util.TempDirs.scratch("graft_cdfs_ckpt")
        def slice(k: Int) = Tables.orders(s, dir)
          .filter(pmod(col("o_orderkey"), lit(3L)) === k.toLong)
          .select(col("o_orderkey"),
            graft.util.Exact.cents(col("o_totalprice")).as("cents"))
        Versioned.commitAppend(slice(0), in)
        val q = s.readStream.format("graft.sources.VersionedStream")
          .option("root", in).option("readChangeFeed", "true").load()
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(outDir)
          }.start()
        try {
          q.processAllAvailable()
          Versioned.commitDeleteVectors(s, in,
            pmod(col("o_orderkey"), lit(5L)) === 2L)
          q.processAllAvailable()
          Versioned.commitAppend(slice(1), in)
          q.processAllAvailable()
        } finally q.stop()
        s.read.parquet(outDir)
          .groupBy(col("_change_type"), col("_commit_version"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("cents")).as("cents"))
          .orderBy("_commit_version", "_change_type")
      },
      Some(s"""
        WITH ch AS (
          SELECT 'insert' AS t, 1 AS v, ${graft.util.Exact
            .centsSql("o_totalprice")} AS cents
          FROM orders WHERE o_orderkey % 3 = 0
          UNION ALL
          SELECT 'delete', 2, ${graft.util.Exact
            .centsSql("o_totalprice")}
          FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 = 2
          UNION ALL
          SELECT 'insert', 3, ${graft.util.Exact
            .centsSql("o_totalprice")}
          FROM orders WHERE o_orderkey % 3 = 1)
        SELECT t AS _change_type, CAST(v AS BIGINT) AS _commit_version,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM ch GROUP BY 1, 2 ORDER BY _commit_version, _change_type""")),

    // ------------------------------------------------------------------
    // INITIAL-SNAPSHOT PACING (Delta's maxFilesPerTrigger on the
    // snapshot): starting a stream on a big table must not be one
    // micro-batch scanning the whole snapshot — with
    // maxFilesPerBatch=1 a 4-file cut drains as FOUR file-sized
    // batches (offsets are version#fileCount, so a restart resumes at
    // the exact file). The require pins the batch count; the rollup
    // over everything the stream delivered hash-matches the oracle's
    // plain per-slice aggregation — pacing changed the BATCHING,
    // never the rows. At 100 TB this is the difference between a
    // stream that starts and one whose first batch is a full table
    // scan pinned to a single trigger.
    QuerySpec("q257_paced_snapshot_stream",
      (s, dir) => {
        import graft.store.Versioned
        val in = graft.util.TempDirs.scratch("graft_paced_in")
        val outDir = graft.util.TempDirs.scratch("graft_paced_out")
        val ckpt = graft.util.TempDirs.scratch("graft_paced_ckpt")
        def slice(k: Int) = Tables.orders(s, dir)
          .filter(pmod(col("o_orderkey"), lit(4L)) === k.toLong)
          .select(col("o_orderkey"),
            graft.util.Exact.cents(col("o_totalprice")).as("cents"))
          .coalesce(1)
        (0 until 4).foreach(k => Versioned.commitAppend(slice(k), in))
        val nBatches = new java.util.concurrent.atomic.AtomicLong
        val q = s.readStream.format("graft.sources.VersionedStream")
          .option("root", in).option("maxFilesPerBatch", "1").load()
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            if (!b.isEmpty) {
              nBatches.incrementAndGet()
              b.write.mode("append").parquet(outDir)
            }; ()
          }.start()
        try q.processAllAvailable() finally q.stop()
        require(nBatches.get == 4L,
          s"a 4-file snapshot under maxFilesPerBatch=1 must drain in " +
            s"4 batches, saw ${nBatches.get}")
        s.read.parquet(outDir)
          .groupBy(pmod(col("o_orderkey"), lit(4L)).as("slice"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("cents")).as("total_cents"))
          .orderBy("slice")
      },
      Some(s"""
        SELECT CAST(o_orderkey % 4 AS BIGINT) AS slice,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(${graft.util.Exact.centsSql("o_totalprice")})
                 AS BIGINT) AS total_cents
        FROM orders GROUP BY 1 ORDER BY slice"""))
  )
}
