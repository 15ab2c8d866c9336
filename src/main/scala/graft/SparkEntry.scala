package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, GraphQueries, MlQueries, PipelineQueries, RelationalQueries, SketchQueries, StreamQueries, TextQueries}
import graft.search.Search
import graft.store.StoreOps
import graft.text.Analyzer
import graft.util.Exact

/** Driver contract — one entry per implemented operator from SURVEY.md §2,
  * each paired with equivalent DuckDB SQL for the oracle compare.
  *
  * Cross-engine determinism rules used throughout (see [[graft.util.Exact]]):
  * every floating aggregate is snapped to an integer grid *per row* before
  * summation; every result has a deterministic total ORDER BY; every count /
  * sum is BIGINT on both sides.
  */
object SparkEntry {

  private case class Q(name: String,
                       fn: (SparkSession, String) => DataFrame,
                       oracle: Option[String])

  // Shared constants: events.ts spans 2024-01-01 .. 2024-01-31 (ns since
  // epoch); this cutoff is mid-range, 2024-01-16T00:00:00Z.
  private val TsCutoffNs = 1705363200000000000L
  // DuckDB truncates parquet TIMESTAMP(NANOS) to microseconds, so all
  // timestamp *outputs* are exchanged at µs precision (`ts div 1000` vs
  // `epoch_us(ts)`); filters stay on the full-ns Spark column (safe: the
  // cutoff is a whole second, so truncation never flips the comparison).
  private val TsCutoffUs = TsCutoffNs / 1000L

  private def specs: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // Relational spine: scan → filter → hash-agg (pricing summary).
    // Exercises partial (map-side) aggregation + parquet predicate pushdown.
    Q("q01_pricing_summary",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).cast("long").as("sum_qty"),
            sum(Exact.cents(col("l_extendedprice"))).as("base_cents"),
            sum(Exact.cents(col("l_extendedprice") * (lit(1d) - col("l_discount"))))
              .as("disc_cents"),
            count(lit(1)).as("cnt"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
               CAST(sum(${Exact.centsSql("l_extendedprice")}) AS BIGINT) AS base_cents,
               CAST(sum(${Exact.centsSql("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS disc_cents,
               count(*) AS cnt
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ------------------------------------------------------------------
    // S1/S2: range + time predicate scan — uSearch's universal read path
    // (`linkgraph/store/cdb/cdb.go:25-28`): id ∈ [from,to) AND ts < t.
    Q("q02_range_time_scan",
      (s, dir) => {
        Tables.events(s, dir)
          .filter(col("user_id") >= 40 && col("user_id") < 60 &&
            col("ts") < lit(TsCutoffNs))
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("ts div 1000").as("ts_us"),
            Exact.cents(col("value")).as("value_cents"))
          .orderBy(col("event_id"))
      },
      Some(s"""
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
               ${Exact.centsSql("value")} AS value_cents
        FROM events
        WHERE user_id >= 40 AND user_id < 60 AND epoch_us(ts) < $TsCutoffUs
        ORDER BY event_id""")),

    // ------------------------------------------------------------------
    // S3/S4: point lookup by key (`FindLink`, `linkgraph/graph/graph.go:20`).
    Q("q03_point_lookup",
      (s, dir) => {
        Tables.orders(s, dir)
          .filter(col("o_orderkey") === 42L)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            Exact.cents(col("o_totalprice")).as("total_cents"),
            unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"))
      },
      Some(s"""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               ${Exact.centsSql("o_totalprice")} AS total_cents,
               epoch_ms(o_orderdate) AS odate_ms
        FROM orders WHERE o_orderkey = 42""")),

    // ------------------------------------------------------------------
    // S5: upsert keyed by (user, type) keeping the newest row — the batch
    // re-expression of `ON CONFLICT ... GREATEST(retrieved_at)`
    // (`linkgraph/store/cdb/cdb.go:16-22`).
    Q("q04_latest_upsert",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("ts_us", expr("ts div 1000"))
        StoreOps.latestByKey(ev, Seq("user_id", "event_type"), "ts_us",
            tieBreak = Seq("event_id"))
          .select(col("user_id"), col("event_type"), col("ts_us"),
            col("event_id"), Exact.cents(col("value")).as("value_cents"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some(s"""
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
               ${Exact.centsSql("value")} AS value_cents
        FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
          FROM events) t
        WHERE rn = 1
        ORDER BY user_id, event_type""")),

    // ------------------------------------------------------------------
    // S6: edge upsert with FK endpoint validation (`memory.go:144-148`) —
    // lineitem rows as (order → part) edges, both endpoints semi-join
    // checked, deduped keeping the newest observation.
    Q("q05_edge_merge_fk",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val merged = StoreOps.mergeEdges(li,
          Tables.orders(s, dir), "o_orderkey",
          Tables.part(s, dir), "p_partkey",
          "l_orderkey", "l_partkey", "l_shipdate",
          tieBreak = Seq("l_linenumber"))
        merged.select(col("l_orderkey"), col("l_partkey"),
            unix_millis(col("l_shipdate").cast("timestamp")).as("ship_ms"),
            col("l_linenumber"))
          .orderBy(col("l_orderkey"), col("l_partkey"))
      },
      Some("""
        SELECT l_orderkey, l_partkey, epoch_ms(l_shipdate) AS ship_ms,
               l_linenumber
        FROM (
          SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_partkey
                    ORDER BY l_shipdate DESC, l_linenumber DESC) AS rn
          FROM lineitem l
          WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) t
        WHERE rn = 1
          AND EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = t.l_partkey)
        ORDER BY l_orderkey, l_partkey""")),

    // ------------------------------------------------------------------
    // S7: stale GC — drop (pred AND older-than-cutoff) rows, i.e.
    // `DELETE WHERE src=$1 AND updated_at < $2` (`cdb.go:149-159`).
    Q("q06_stale_gc",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        StoreOps.gcStale(ev, col("event_type") === "error", "ts",
            lit(TsCutoffNs))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            min(expr("ts div 1000")).as("min_ts_us"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        SELECT event_type, count(*) AS cnt,
               CAST(min(epoch_us(ts)) AS BIGINT) AS min_ts_us
        FROM events
        WHERE NOT (event_type = 'error' AND epoch_us(ts) < $TsCutoffUs)
        GROUP BY event_type
        ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // S9: score write-back with placeholder creation (`es.go:231-257`):
    // full-outer merge; score-only rows become placeholders, unscored docs
    // keep the default.
    Q("q07_score_writeback",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val scores = docs.select((col("doc_id") * 2).as("doc_id"),
          (col("n_chars") / lit(10.0d)).as("score"))
        StoreOps.writeScores(docs.select(col("doc_id"), col("text")),
            scores, "doc_id", "score")
          .select(col("doc_id"), col("text").isNotNull.as("has_doc"),
            Exact.micros(col("final_score")).as("score_micros"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH scores AS (
          SELECT CAST(doc_id * 2 AS BIGINT) AS doc_id, n_chars / 10.0 AS score
          FROM documents)
        SELECT COALESCE(d.doc_id, s.doc_id) AS doc_id,
               d.text IS NOT NULL AS has_doc,
               ${Exact.microsSql("COALESCE(s.score, 0)")} AS score_micros
        FROM documents d FULL OUTER JOIN scores s ON d.doc_id = s.doc_id
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Star-schema join spine: fact ⋈ two dims, both broadcast (the shape
    // every 100 TB rollup takes: big fact table streams, small dims ship
    // to the executors — no fact-side shuffle before aggregation).
    Q("q30_star_join",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            sum(Exact.cents(col("o_totalprice"))).as("rev_cents"))
          .orderBy(col("n_name"), col("o_orderstatus"))
      },
      Some(s"""
        SELECT n_name, o_orderstatus, count(*) AS n_orders,
               CAST(sum(${Exact.centsSql("o_totalprice")}) AS BIGINT)
                 AS rev_cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, o_orderstatus
        ORDER BY n_name, o_orderstatus""")),

    // ------------------------------------------------------------------
    // TPC-H-Q3-style ship priority: selective dim filter broadcast into
    // the mid table, then ONE shuffle join against the filtered fact.
    // The scale-correct plan: customer (dimension) broadcasts, lineitem
    // and orders co-shuffle on orderkey — never broadcast orders, it
    // grows with the fact side. Both date filters reach the parquet
    // scans (pushdown), so the join inputs are pre-shrunk.
    Q("q46_ship_priority",
      (s, dir) => {
        val cutoff = "1998-07-01"
        val cust = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate") < lit(cutoff))
          .select("o_orderkey", "o_custkey", "o_orderdate",
            "o_orderpriority")
        val li = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") > lit(cutoff))
          .select(col("l_orderkey"),
            Exact.cents(col("l_extendedprice") *
              (lit(1.0) - col("l_discount"))).as("cents"))
        li.join(ord.join(broadcast(cust),
              ord("o_custkey") === cust("c_custkey")),
            li("l_orderkey") === ord("o_orderkey"))
          // o_orderdate is parquet TIMESTAMP_NTZ; the gate session is
          // pinned UTC, so the cast to TIMESTAMP is instant-preserving
          // and unix_micros matches DuckDB's epoch_us on the naive value.
          .groupBy(col("l_orderkey"),
            unix_micros(col("o_orderdate").cast("timestamp"))
              .as("o_date_us"),
            col("o_orderpriority"))
          .agg(sum("cents").as("revenue_cents"))
          .orderBy(col("revenue_cents").desc, col("l_orderkey"))
          .limit(10)
          .select("l_orderkey", "revenue_cents", "o_date_us",
            "o_orderpriority")
      },
      Some(s"""
        WITH rev AS (
          SELECT l_orderkey,
            ${Exact.centsSql("l_extendedprice * (1 - l_discount)")} AS cents
          FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-07-01')
        SELECT l.l_orderkey,
               CAST(sum(l.cents) AS BIGINT) AS revenue_cents,
               epoch_us(o.o_orderdate) AS o_date_us, o.o_orderpriority
        FROM rev l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-07-01'
        GROUP BY 1, 3, 4
        ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""")),

    // ------------------------------------------------------------------
    // Skew-safe join + aggregation: the fact side is salted 16 ways so
    // one hot orderkey spreads over 16 shuffle partitions, and the
    // 5-key priority rollup runs as a two-stage (key, salt) -> key
    // aggregation so no single reducer sees a whole hot group. Results
    // are identical to the plain join+agg (the oracle is exactly that).
    Q("q48_skew_salted_join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("k"),
            Exact.cents(col("l_extendedprice") *
              (lit(1.0) - col("l_discount"))).as("cents"))
        val ord = Tables.orders(s, dir)
          .select(col("o_orderkey").as("k"), col("o_orderpriority"))
        val joined = graft.operators.Skew.saltedJoin(li, ord, Seq("k"), 16)
        graft.operators.Skew.twoStageAgg(joined,
            Seq("o_orderpriority"), 16,
            partial = Seq(count(lit(1)).as("pn"), sum("cents").as("pc")),
            merge = Seq(sum("pn").as("n_items"), sum("pc").as("rev_cents")))
          .orderBy("o_orderpriority")
      },
      Some(s"""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(${Exact.centsSql(
                 "l_extendedprice * (1 - l_discount)")}) AS BIGINT)
                 AS rev_cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ------------------------------------------------------------------
    // Semi-structured extraction: JSON payload column → typed field →
    // aggregation (codegen'd JSON path, pushdown-friendly shape).
    Q("q37_json_extract",
      (s, dir) => {
        Tables.events(s, dir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"), sum("k").as("sum_k"),
            min("k").as("min_k"), max("k").as("max_k"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, count(*) AS cnt,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
               max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        FROM events
        GROUP BY event_type ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // Hierarchical rollup: subtotals at (flag, status), (flag), and
    // grand-total levels in one pass — Spark plans a single Expand +
    // hash aggregation, no multiple scans.
    Q("q34_rollup",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"),
            sum(Exact.cents(col("l_extendedprice"))).as("rev_cents"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
               CAST(sum(${Exact.centsSql("l_extendedprice")}) AS BIGINT)
                 AS rev_cents
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST,
                 l_linestatus ASC NULLS FIRST""")),

    // ------------------------------------------------------------------
    // Window frames: per-customer running revenue and order rank over
    // order time — the running-aggregate shape every event pipeline has.
    Q("q35_running_window",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"),
            unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"),
            Exact.cents(col("o_totalprice")).as("price_cents"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("o_custkey")
              .orderBy(col("odate_ms"), col("o_orderkey"))))
          .withColumn("running_cents", sum("price_cents").over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("o_custkey")
              .orderBy(col("odate_ms"), col("o_orderkey"))
              .rowsBetween(org.apache.spark.sql.expressions.Window
                .unboundedPreceding, 0)))
          .orderBy("o_custkey", "rn")
      },
      Some(s"""
        SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS odate_ms,
               ${Exact.centsSql("o_totalprice")} AS price_cents,
               CAST(row_number() OVER w AS INT) AS rn,
               CAST(sum(${Exact.centsSql("o_totalprice")}) OVER
                 (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS running_cents
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY epoch_ms(o_orderdate), o_orderkey)
        ORDER BY o_custkey, rn""")),

    // ------------------------------------------------------------------
    // Z-order layout math: Morton-interleave (user bucket, hour bucket)
    // and aggregate per curve segment — min/max spans per z-bucket are
    // what parquet row-group stats would see after a z-sorted write
    // (tight in BOTH dimensions; a lexicographic sort is tight only in
    // the leading one). Pure integer bit arithmetic → exact oracle.
    Q("q76_zorder_layout",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          (col("user_id") % 256).as("ux"),
          (expr("(ts div 1000) div 3600000000") % 256).as("th"))
        ev.withColumn("z", graft.operators.Layout.zValue(
            Seq(col("ux"), col("th")), bits = 8))
          .groupBy(shiftright(col("z"), 8).as("zbucket"))
          .agg(count(lit(1)).as("cnt"),
            min("ux").as("ux_min"), max("ux").as("ux_max"),
            min("th").as("th_min"), max("th").as("th_max"))
          .orderBy("zbucket")
      },
      Some {
        val z = (0 until 8).map { b =>
          s"(((ux >> $b) & 1) << ${2 * b}) + (((th >> $b) & 1) << ${2 * b + 1})"
        }.mkString(" + ")
        s"""
        WITH ev AS (
          SELECT user_id % 256 AS ux,
                 (epoch_us(ts) // 3600000000) % 256 AS th
          FROM events),
        zv AS (SELECT ux, th, $z AS z FROM ev)
        SELECT CAST(z >> 8 AS BIGINT) AS zbucket,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(min(ux) AS BIGINT) AS ux_min,
               CAST(max(ux) AS BIGINT) AS ux_max,
               CAST(min(th) AS BIGINT) AS th_min,
               CAST(max(th) AS BIGINT) AS th_max
        FROM zv GROUP BY 1 ORDER BY zbucket"""
      }),

    // ------------------------------------------------------------------
    // SCD Type-2 history: each customer's order stream versioned with
    // half-open [valid_from, valid_to) intervals — lead() per key, the
    // keep-full-history twin of the S5 keep-newest upsert. One shuffle
    // keyed by the dimension key; o_orderkey tie-breaks same-day orders
    // so version order is deterministic on both engines.
    Q("q75_scd2_history",
      (s, dir) => {
        val ch = Tables.orders(s, dir).select(
          col("o_custkey"), col("o_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"),
          Exact.cents(col("o_totalprice")).as("price_cents"))
        graft.store.StoreOps.scd2(ch, Seq("o_custkey"), "odate_ms",
            tieBreak = Seq("o_orderkey"))
          .select(col("o_custkey"), col("o_orderkey"),
            col("valid_from"), col("valid_to"), col("is_current"),
            col("price_cents"))
          .orderBy("o_custkey", "valid_from", "o_orderkey")
      },
      Some(s"""
        WITH ch AS (
          SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS vf,
                 ${Exact.centsSql("o_totalprice")} AS price_cents
          FROM orders)
        SELECT o_custkey, o_orderkey, vf AS valid_from,
               lead(vf) OVER w AS valid_to,
               (lead(vf) OVER w IS NULL) AS is_current,
               price_cents
        FROM ch
        WINDOW w AS (PARTITION BY o_custkey ORDER BY vf, o_orderkey)
        ORDER BY o_custkey, valid_from, o_orderkey""")),

    // ------------------------------------------------------------------
    // Batch sessionization: session boundaries where the per-user gap
    // exceeds 30 min (lag + conditional cumsum), then per-session stats
    // — the batch twin of streaming.Streams.sessionize.
    Q("q36_sessionize_batch",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("ts_us"), col("event_id"))
        val gapUs = 30L * 60 * 1000000
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("ts_us"))
          .withColumn("prev_ts", lag("ts_us", 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              col("ts_us") - col("prev_ts") > gapUs, 1L).otherwise(0L))
          .withColumn("sess_no", sum("new_sess").over(
            Window.partitionBy("user_id")
              .orderBy(col("ts_us"), col("event_id"))
              .rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sess_no")
          .agg(count(lit(1)).as("n_events"),
            min("ts_us").as("start_us"), max("ts_us").as("end_us"))
          .orderBy("user_id", "sess_no")
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        flagged AS (
          SELECT user_id, event_id, ts_us,
                 CASE WHEN lag(ts_us) OVER w IS NULL
                        OR ts_us - lag(ts_us) OVER w > 1800000000
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

    // ------------------------------------------------------------------
    // Ordered-stage conversion funnel: earliest view, earliest click AT
    // OR AFTER it, earliest purchase after that — one keyed agg per
    // stage, all shuffles on user_id. NULLs mark the drop-off stage;
    // integer-µs timestamps keep every min() cross-engine exact.
    Q("q72_funnel",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            expr("ts div 1000").as("ts_us"))
        graft.operators.Funnel.conversion(ev,
            Seq("view", "click", "purchase"))
          .select(col("user_id"), col("t0").as("t_view_us"),
            col("t1").as("t_click_us"), col("t2").as("t_purchase_us"),
            col("t2").isNotNull.as("converted"),
            (col("t2") - col("t0")).as("convert_us"))
          .orderBy("user_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        s0 AS (
          SELECT user_id, min(ts_us) AS t0 FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
        s1 AS (
          SELECT s0.user_id, s0.t0,
                 min(CASE WHEN e.ts_us >= s0.t0 THEN e.ts_us END) AS t1
          FROM s0 LEFT JOIN ev e
            ON e.user_id = s0.user_id AND e.event_type = 'click'
          GROUP BY s0.user_id, s0.t0),
        s2 AS (
          SELECT s1.user_id, s1.t0, s1.t1,
                 min(CASE WHEN s1.t1 IS NOT NULL AND e.ts_us >= s1.t1
                     THEN e.ts_us END) AS t2
          FROM s1 LEFT JOIN ev e
            ON e.user_id = s1.user_id AND e.event_type = 'purchase'
          GROUP BY s1.user_id, s1.t0, s1.t1)
        SELECT user_id, t0 AS t_view_us, t1 AS t_click_us,
               t2 AS t_purchase_us, (t2 IS NOT NULL) AS converted,
               CASE WHEN t2 IS NOT NULL THEN t2 - t0 END AS convert_us
        FROM s2 ORDER BY user_id""")),

    // ------------------------------------------------------------------
    // As-of join: every click paired with the user's latest
    // at-or-before purchase — an operator Spark lacks natively,
    // implemented as tagged-union + running window (one shuffle, no
    // range-join blow-up). Oracle: DuckDB's native ASOF LEFT JOIN.
    Q("q33_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("ts_us", expr("ts div 1000"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts_us").as("pts"))
          .agg(max("event_id").as("p_event"),
            sum(Exact.cents(col("value"))).as("p_cents"))
          .select("user_id", "pts", "p_event", "p_cents")
        graft.operators.AsOf.join(clicks, purchases, Seq("user_id"),
            "ts_us", "pts")
          .select(col("user_id"), col("event_id"), col("ts_us"),
            col("r_pts"), col("r_p_event"), col("r_p_cents"))
          .orderBy("event_id")
      },
      Some(s"""
        WITH ev AS (
          SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
                 value
          FROM events),
        clicks AS (
          SELECT user_id, ts_us, event_id FROM ev
          WHERE event_type = 'click'),
        purch AS (
          SELECT user_id, ts_us AS pts, max(event_id) AS p_event,
                 CAST(sum(${Exact.centsSql("value")}) AS BIGINT) AS p_cents
          FROM ev WHERE event_type = 'purchase'
          GROUP BY user_id, ts_us)
        SELECT c.user_id, c.event_id, c.ts_us, p.pts AS r_pts,
               p.p_event AS r_p_event, p.p_cents AS r_p_cents
        FROM clicks c ASOF LEFT JOIN purch p
          ON c.user_id = p.user_id AND c.ts_us >= p.pts
        ORDER BY c.event_id""")),

    // ------------------------------------------------------------------
    // BM25 ranking (Okapi, Lucene +1 idf) — the modern default scorer
    // alongside the reference-faithful TF-IDF of q08.
    Q("q31_bm25_search",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Search.bm25Scores(docs, Seq("spark", "join", "window"))
          .select(col("doc_id"), Exact.micros(col("score")).as("score_micros"))
          .orderBy(col("score_micros").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(trim(text)), '\\s+'), x -> x <> ''))
            AS term
          FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        adl AS (SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  AS avgdl FROM dl),
        q AS (SELECT doc_id, term FROM tok
              WHERE term IN ('spark', 'join', 'window')),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM q GROUP BY 1, 2),
        dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM q GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents)
        SELECT tf.doc_id,
               ${Exact.microsSql(
                 "sum(ln((CAST(n.n AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5)" +
                 " / (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0)" +
                 " * (CAST(tf.tf AS DOUBLE) * (1.2 + 1))" +
                 " / (CAST(tf.tf AS DOUBLE) + 1.2 *" +
                 " (1.0 - 0.75 + 0.75 * (CAST(dl.dl AS DOUBLE) / adl.avgdl))))")}
                 AS score_micros
        FROM tf
        JOIN dfreq USING (term)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN n CROSS JOIN adl
        GROUP BY tf.doc_id
        ORDER BY score_micros DESC, tf.doc_id
        LIMIT 20""")),

    // ------------------------------------------------------------------
    // R1: keyword (match) search, TF-IDF over the postings table
    // (reference delegates to ES `multi_match`, `es.go:184-213`).
    Q("q08_match_search",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Search.matchScores(docs, Seq("spark", "join", "window"))
          .select(col("doc_id"), Exact.micros(col("score")).as("score_micros"))
          .orderBy(col("score_micros").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS term
          FROM documents),
        q AS (SELECT doc_id, term FROM tok
              WHERE term IN ('spark', 'join', 'window')),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM q GROUP BY 1, 2),
        dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM q GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents)
        SELECT tf.doc_id,
               ${Exact.microsSql("sum(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df))")} AS score_micros
        FROM tf JOIN dfreq USING (term), n
        GROUP BY tf.doc_id
        ORDER BY score_micros DESC, doc_id
        LIMIT 20""")),

    // ------------------------------------------------------------------
    // R2: exact-phrase search (`MatchPhraseQuery`, bleve `memory.go:105-107`).
    Q("q09_phrase_search",
      (s, dir) => {
        Search.phraseMatch(Tables.documents(s, dir), "join batch")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE contains(' ' || lower(trim(text)) || ' ', ' join batch ')
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // R3 + R4: rank blend (relevance + stored prior, ES additive semantic
    // `es.go:196-209`) with offset/limit pagination (`es.go:211-212`).
    Q("q10_search_paginate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val scored = Search.matchScores(docs, Seq("vector", "stream"))
        val prior = docs.select(col("doc_id"),
          (col("n_chars") / lit(1000.0d)).as("prior"))
        val blended = Search.blend(scored, prior, "doc_id", "prior")
          .select(col("doc_id"), Exact.micros(col("blended")).as("blended_micros"))
        Search.paginate(blended,
            Seq(col("blended_micros").desc, col("doc_id")), 10, 10)
          .select(col("rn").cast("long").as("rn"), col("doc_id"),
            col("blended_micros"))
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS term
          FROM documents),
        q AS (SELECT doc_id, term FROM tok
              WHERE term IN ('vector', 'stream')),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM q GROUP BY 1, 2),
        dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM q GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id,
                 sum(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df)) AS score
          FROM tf JOIN dfreq USING (term), n
          GROUP BY tf.doc_id),
        blended AS (
          SELECT s.doc_id,
                 ${Exact.microsSql("s.score + d.n_chars / 1000.0")} AS blended_micros
          FROM scored s JOIN documents d USING (doc_id)),
        ranked AS (
          SELECT row_number() OVER (ORDER BY blended_micros DESC, doc_id) AS rn,
                 doc_id, blended_micros
          FROM blended)
        SELECT rn, doc_id, blended_micros
        FROM ranked WHERE rn > 10 AND rn <= 20
        ORDER BY rn"""))
  )

  private def allSpecs: Seq[Q] =
    specs ++
      (GraphQueries.specs ++ DedupQueries.specs ++ MlQueries.specs ++
        TextQueries.specs ++ StreamQueries.specs ++ SketchQueries.specs ++
        PipelineQueries.specs ++ RelationalQueries.specs)
        .map(q => Q(q.name, q.fn, q.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q08_match_search")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(sql => q.name ->
      sql.stripMargin.trim.replaceAll("\\s+", " "))).toMap
}
