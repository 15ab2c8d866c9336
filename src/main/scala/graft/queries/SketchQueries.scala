package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.sketch.Sketches
import graft.text.Analyzer
import graft.util.Exact

/** Deterministic-sketch queries (q45, q47) — approximate answers that
  * are still hash-comparable against a DuckDB oracle because the
  * sketches are RNG-free and insertion-order independent (see
  * [[graft.sketch.Sketches]]).
  */
object SketchQueries {

  /** DuckDB: 60-bit portable hash (= Dedup.portableHash). */
  private def hashSql(expr: String): String =
    s"CAST(('0x' || substring(md5($expr), 1, 15)) AS BIGINT)"

  /** DuckDB: lowercased \\s+ tokens, empties dropped (= Analyzer.tokenize —
    * the single-space string_split shortcut would diverge on tabs/newlines). */
  private def toksSql(expr: String): String =
    s"list_filter(string_split_regex(lower(trim($expr)), '\\s+'), x -> x <> '')"

  private val KmvK = 1024
  private val CmDepth = 4
  private val CmWidth = 1024
  private val CmProbes = Seq("join", "hash", "scan", "vector", "zzz_missing")
  private val HllP = 10
  private val HllM = 1 << HllP // 1024 registers
  private val HllBits = 60 - HllP // hash bits after the register index

  def specs: Seq[QuerySpec] = Seq(

    // ------------------------------------------------------------------
    // KMV distinct-count sketch: estimate the number of distinct
    // (l_orderkey, l_partkey) pairs without ever shuffling the key set.
    // At sf0.01: est 59,021 vs exact 59,945 (1.5% error, k=1024).
    QuerySpec("q45_kmv_distinct",
      (s, dir) => Sketches.kmvDistinct(
        Tables.lineitem(s, dir),
        concat_ws("|", col("l_orderkey"), col("l_partkey")), KmvK),
      Some(s"""
        WITH h AS (SELECT DISTINCT
            ${hashSql("l_orderkey || '|' || l_partkey")} AS h
          FROM lineitem),
        k AS (SELECT h FROM h ORDER BY h LIMIT $KmvK),
        agg AS (SELECT count(*) AS k_used, max(h) AS kth_h FROM k)
        SELECT k_used, kth_h,
          CASE WHEN k_used < $KmvK THEN k_used
               ELSE CAST(floor(${KmvK - 1}.0 * power(2.0, 60)
                               / CAST(kth_h AS DOUBLE)) AS BIGINT)
          END AS est_distinct
        FROM agg""")),

    // ------------------------------------------------------------------
    // Count-Min frequency sketch over document tokens: probe four real
    // terms plus one absent term (exercises the zero-cell path). The
    // sketch table is bounded at d*w rows and broadcast to the probes.
    QuerySpec("q47_countmin_freq",
      (s, dir) => Sketches.countMinEstimate(
        Tables.documents(s, dir)
          .select(explode(Analyzer.tokenize(col("text"))).as("term")),
        col("term"), CmProbes, CmDepth, CmWidth)
        .orderBy("term"),
      Some(s"""
        WITH t AS (SELECT unnest(${toksSql("text")}) AS term
          FROM documents),
        d(i) AS (VALUES ${(0 until CmDepth).map(i => s"($i)").mkString(",")}),
        cells AS (SELECT i, ${hashSql("i || '|' || term")} % $CmWidth AS cell
          FROM t CROSS JOIN d),
        sketch AS (SELECT i, cell, count(*) AS cnt FROM cells GROUP BY 1, 2),
        probes(term) AS (VALUES ${CmProbes.map(p => s"('$p')").mkString(",")}),
        ph AS (SELECT term, i, ${hashSql("i || '|' || term")} % $CmWidth AS cell
          FROM probes CROSS JOIN d)
        SELECT ph.term, min(coalesce(s.cnt, 0)) AS est_cnt
        FROM ph LEFT JOIN sketch s USING (i, cell)
        GROUP BY 1 ORDER BY 1""")),

    // ------------------------------------------------------------------
    // HyperLogLog distinct-count sketch (Flajolet et al. 2007) on the
    // same key as q45, so the two estimators are directly comparable:
    // at sf0.01 HLL (m=1024 registers, ~3.2% std err) estimates the
    // 59,945 true distinct pairs from 8 KB of register state. The
    // harmonic mean is summed EXACTLY (powers of two in DECIMAL(38,0)),
    // so the only float ops are one multiply chain + one division,
    // identical in both engines — see Sketches.hllDistinct.
    QuerySpec("q83_hll_distinct",
      (s, dir) => Sketches.hllDistinct(
        Tables.lineitem(s, dir),
        concat_ws("|", col("l_orderkey"), col("l_partkey")), p = HllP),
      Some(s"""
        WITH hs AS (SELECT
            ${hashSql("l_orderkey || '|' || l_partkey")} AS h
          FROM lineitem),
        regs AS (
          SELECT h % $HllM AS idx,
                 CASE WHEN h // $HllM = 0 THEN ${HllBits + 1}
                      ELSE ${HllBits + 1} - length(bin(h // $HllM))
                 END AS rho
          FROM hs
          UNION ALL
          SELECT range AS idx, 0 AS rho FROM range(0, $HllM)),
        mx AS (SELECT idx, max(rho) AS m_rho FROM regs GROUP BY idx),
        agg AS (SELECT
            count(CASE WHEN m_rho > 0 THEN 1 END) AS nonzero_regs,
            sum(CAST(power(2.0, 62 - m_rho) AS DECIMAL(38,0))) AS s
          FROM mx),
        est AS (SELECT
            CAST(nonzero_regs AS BIGINT) AS nonzero_regs,
            CAST($HllM - nonzero_regs AS BIGINT) AS zero_regs,
            ((0.7213 / (1.0 + 1.079 / $HllM.0)) * $HllM.0) * $HllM.0
              * power(2.0, 62) / CAST(s AS DOUBLE) AS raw
          FROM agg)
        SELECT nonzero_regs, zero_regs,
          ${Exact.microsSql(
            s"CASE WHEN raw <= 2.5 * $HllM.0 AND zero_regs > 0 " +
            s"THEN $HllM.0 * ln($HllM.0 / CAST(zero_regs AS DOUBLE)) " +
            "ELSE raw END")} AS est_micros
        FROM est""")),

    // ------------------------------------------------------------------
    // DDSketch quantiles (Masson et al. 2019) over l_extendedprice at
    // alpha = 1%: p50/p90/p99 with guaranteed relative error <= alpha
    // from a ~600-row bucket table. The oracle replays bucketing, the
    // cumulative rank walk, and the midpoint read-back; the micros snap
    // before ceil() makes the bucket boundary rule engine-exact.
    QuerySpec("q89_ddsketch_quantiles",
      (s, dir) => Sketches.ddQuantiles(
        Tables.lineitem(s, dir), col("l_extendedprice"),
        alpha = 0.01, pcts = Seq(50, 90, 99)),
      Some {
        val g = "((1.0 + 0.01) / (1.0 - 0.01))"
        s"""
        WITH v AS (SELECT l_extendedprice AS x FROM lineitem
          WHERE l_extendedprice > 0),
        b AS (SELECT CAST(ceil(
            CAST(${Exact.microsSql(s"ln(x) / ln($g)")} AS DOUBLE)
            / 1000000.0) AS BIGINT) AS bucket FROM v),
        sk AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY bucket),
        c AS (SELECT bucket, cnt,
                sum(cnt) OVER (ORDER BY bucket) AS cum FROM sk),
        n AS (SELECT sum(cnt) AS n FROM sk),
        q(q_pct) AS (VALUES (50), (90), (99)),
        sel AS (SELECT q_pct, min(bucket) AS bucket
          FROM q, c, n
          WHERE cum >= floor(q_pct / 100.0 * (CAST(n AS DOUBLE) - 1.0)) + 1
          GROUP BY q_pct)
        SELECT CAST(q_pct AS INT) AS q_pct, bucket,
               ${Exact.microsSql(s"2.0 * power($g, bucket) / ($g + 1.0)")}
                 AS est_micros
        FROM sel ORDER BY q_pct"""
      }),

    // ------------------------------------------------------------------
    // EXACT heavy hitters with Count-Min candidate pruning: parts on 45+
    // lineitems (16 of ~2000 at sf0.01). The engine takes the
    // sketch-prune-verify path — the only term-keyed exchange carries
    // pruned candidates — while the oracle is the plain GROUP BY
    // HAVING; hash equality proves the prune lost nothing (CM never
    // underestimates) and the verify pass culled its false positives.
    QuerySpec("q94_heavy_hitters",
      (s, dir) => Sketches.heavyHitters(
        Tables.lineitem(s, dir), col("l_partkey").cast("string"),
        minCount = 45)
        .orderBy("term"),
      Some("""
        SELECT CAST(l_partkey AS VARCHAR) AS term,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem
        GROUP BY l_partkey HAVING count(*) >= 45
        ORDER BY term""")),

    // ------------------------------------------------------------------
    // GROUPED DDSketch: per-language p50/p90 document length from
    // per-(lang, bucket) counts — the sketch counterpart of q50's exact
    // percentiles (alpha=2% relative error, O(log range) buckets per
    // group, partitioned-window rank walk). One scan, any group count.
    QuerySpec("q95_ddsketch_grouped",
      (s, dir) => Sketches.ddQuantilesGrouped(
        Tables.documents(s, dir), Seq("lang"), col("n_chars"),
        alpha = 0.02, pcts = Seq(50, 90))
        .orderBy("lang", "q_pct"),
      Some {
        val g = "((1.0 + 0.02) / (1.0 - 0.02))"
        s"""
        WITH v AS (SELECT lang, n_chars AS x FROM documents
          WHERE n_chars > 0),
        b AS (SELECT lang, CAST(ceil(
            CAST(${Exact.microsSql(s"ln(x) / ln($g)")} AS DOUBLE)
            / 1000000.0) AS BIGINT) AS bucket FROM v),
        sk AS (SELECT lang, bucket, count(*) AS cnt
          FROM b GROUP BY lang, bucket),
        c AS (SELECT lang, bucket, cnt,
            sum(cnt) OVER (PARTITION BY lang ORDER BY bucket) AS cum
          FROM sk),
        t AS (SELECT lang, sum(cnt) AS n FROM sk GROUP BY lang),
        q(q_pct) AS (VALUES (50), (90)),
        sel AS (SELECT c.lang, q_pct, min(bucket) AS bucket
          FROM c JOIN t ON c.lang = t.lang CROSS JOIN q
          WHERE cum >= floor(q_pct / 100.0 * (CAST(t.n AS DOUBLE) - 1.0)) + 1
          GROUP BY c.lang, q_pct)
        SELECT lang, CAST(q_pct AS INT) AS q_pct, bucket,
               ${Exact.microsSql(s"2.0 * power($g, bucket) / ($g + 1.0)")}
                 AS est_micros
        FROM sel ORDER BY lang, q_pct"""
      }),

    // ------------------------------------------------------------------
    // KMV set resemblance: Jaccard similarity of the even- and odd-id
    // document TEXT sets from two k=512 sketches (planted near-dups
    // straddle the split, so the overlap is real). The corpora are
    // never joined — only the two k-row sketches meet.
    QuerySpec("q96_kmv_jaccard",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Sketches.kmvJaccard(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          col("text"), k = 512)
      },
      Some(s"""
        WITH ha AS (SELECT DISTINCT ${hashSql("text")} AS h
          FROM documents WHERE doc_id % 2 = 0),
        hb AS (SELECT DISTINCT ${hashSql("text")} AS h
          FROM documents WHERE doc_id % 2 = 1),
        ka AS (SELECT h FROM ha ORDER BY h LIMIT 512),
        kb AS (SELECT h FROM hb ORDER BY h LIMIT 512),
        ku AS (SELECT DISTINCT h FROM
          (SELECT h FROM ka UNION ALL SELECT h FROM kb)
          ORDER BY h LIMIT 512),
        agg AS (SELECT
          (SELECT count(*) FROM ku) AS k_used,
          (SELECT count(*) FROM ku
           WHERE h IN (SELECT h FROM ka)
             AND h IN (SELECT h FROM kb)) AS matches)
        SELECT CAST(k_used AS BIGINT) AS k_used,
               CAST(matches AS BIGINT) AS matches,
               ${Exact.microsSql(
                 "CAST(matches AS DOUBLE) / CAST(k_used AS DOUBLE)")}
                 AS jaccard_micros
        FROM agg""")),

    // ------------------------------------------------------------------
    // Grouped HLL: distinct users per event type, one 8 KB-bounded
    // sketch per group with NO per-group register fill — absent
    // registers enter the harmonic sum arithmetically ((m−present)·2^62,
    // exact DECIMAL math). COUNT(DISTINCT) per group would shuffle every
    // (group, user) pair; this shuffles ≤ m rows per group.
    QuerySpec("q103_hll_grouped",
      (s, dir) => Sketches.hllDistinctGrouped(
          Tables.events(s, dir), Seq("event_type"),
          col("user_id").cast("string"), p = HllP)
        .orderBy("event_type"),
      Some(s"""
        WITH hs AS (SELECT event_type,
            ${hashSql("CAST(user_id AS VARCHAR)")} AS h
          FROM events),
        regs AS (SELECT event_type, h % $HllM AS idx,
            CASE WHEN h // $HllM = 0 THEN ${HllBits + 1}
                 ELSE ${HllBits + 1} - length(bin(h // $HllM))
            END AS rho
          FROM hs),
        mx AS (SELECT event_type, idx, max(rho) AS m_rho
          FROM regs GROUP BY 1, 2),
        agg AS (SELECT event_type, count(*) AS present,
            sum(CAST(power(2.0, 62 - m_rho) AS DECIMAL(38,0))) AS sp
          FROM mx GROUP BY 1),
        est AS (SELECT event_type,
            CAST(present AS BIGINT) AS nonzero_regs,
            CAST($HllM - present AS BIGINT) AS zero_regs,
            ((0.7213 / (1.0 + 1.079 / $HllM.0)) * $HllM.0) * $HllM.0
              * power(2.0, 62)
              / CAST(sp + ($HllM - present)
                     * CAST(power(2.0, 62) AS DECIMAL(38,0)) AS DOUBLE)
              AS raw
          FROM agg)
        SELECT event_type, nonzero_regs, zero_regs,
          ${Exact.microsSql(
            s"CASE WHEN raw <= 2.5 * $HllM.0 AND zero_regs > 0 " +
            s"THEN $HllM.0 * ln($HllM.0 / CAST(zero_regs AS DOUBLE)) " +
            "ELSE raw END")} AS est_micros
        FROM est ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // KMV set algebra (q96's sketches taken further): |A∪B| from the
    // merged k-row sketch (the k smallest of the two sketches' union IS
    // kmin(A∪B)) and |A∩B| ≈ J·|A∪B| — sketch-only distinct set
    // arithmetic; the corpora never meet past the two bounded builds.
    QuerySpec("q115_kmv_setops",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Sketches.kmvSetOps(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          col("text"), k = 512)
      },
      Some(s"""
        WITH ha AS (SELECT DISTINCT ${hashSql("text")} AS h
          FROM documents WHERE doc_id % 2 = 0),
        hb AS (SELECT DISTINCT ${hashSql("text")} AS h
          FROM documents WHERE doc_id % 2 = 1),
        ka AS (SELECT h FROM ha ORDER BY h LIMIT 512),
        kb AS (SELECT h FROM hb ORDER BY h LIMIT 512),
        ku AS (SELECT DISTINCT h FROM
          (SELECT h FROM ka UNION ALL SELECT h FROM kb)
          ORDER BY h LIMIT 512),
        agg AS (SELECT
          (SELECT count(*) FROM ku) AS k_used,
          (SELECT max(h) FROM ku) AS kth_h,
          (SELECT count(*) FROM ku
           WHERE h IN (SELECT h FROM ka)
             AND h IN (SELECT h FROM kb)) AS matches),
        est AS (SELECT k_used, matches,
          CASE WHEN k_used < 512 THEN k_used
               ELSE CAST(floor(511.0 * power(2.0, 60)
                               / CAST(kth_h AS DOUBLE)) AS BIGINT)
          END AS est_union
          FROM agg)
        SELECT CAST(k_used AS BIGINT) AS k_used,
               CAST(matches AS BIGINT) AS matches,
               CAST(est_union AS BIGINT) AS est_union,
               ${Exact.microsSql(
                 "CAST(matches AS DOUBLE) / CAST(k_used AS DOUBLE)" +
                 " * CAST(est_union AS DOUBLE)")} AS est_inter_micros
        FROM est""")),

    // ------------------------------------------------------------------
    // HLL ROLLUP — the mergeability property that makes sketches the
    // 100 TB answer to distinct-count dashboards: per-day register
    // tables are built ONCE from the raw events, then the all-time
    // estimate is a register-wise max over the per-day sketches — the
    // raw data is never rescanned for the rollup, and adding a day is
    // an 8 KB merge, not a recount. Day -1 row = merged all-time
    // estimate; per-day rows use the identical estimator (both finish
    // through Sketches.hllEstimateGrouped, so the SQL twin shares one
    // tail for both branches).
    QuerySpec("q132_hll_rollup",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          expr("ts div 86400000000000").as("day"),
          col("user_id").cast("string").as("uid"))
        val dayRegs = Sketches
          .hllObservationsKeyed(ev, Seq(col("day")), col("uid"), HllP)
          .groupBy("day", "idx").agg(max("rho").as("m_rho"))
        val perDay = Sketches.hllEstimateGrouped(dayRegs, Seq("day"), HllP)
        val merged = Sketches.hllEstimateGrouped(
            dayRegs.groupBy("idx").agg(max("m_rho").as("m_rho")),
            Seq(), HllP)
          .select(lit(-1L).as("day"), col("nonzero_regs"),
            col("zero_regs"), col("est_micros"))
        perDay.unionByName(merged).orderBy("day")
      },
      Some(s"""
        WITH hs AS (SELECT epoch_us(ts) // 86400000000 AS day,
            ${hashSql("CAST(user_id AS VARCHAR)")} AS h
          FROM events),
        regs AS (SELECT day, h % $HllM AS idx,
            CASE WHEN h // $HllM = 0 THEN ${HllBits + 1}
                 ELSE ${HllBits + 1} - length(bin(h // $HllM))
            END AS rho
          FROM hs),
        mx AS (SELECT day, idx, max(rho) AS m_rho
          FROM regs GROUP BY 1, 2),
        mm AS (SELECT CAST(-1 AS BIGINT) AS day, idx, max(m_rho) AS m_rho
          FROM mx GROUP BY 1, 2),
        allr AS (SELECT * FROM mx UNION ALL SELECT * FROM mm),
        agg AS (SELECT day, count(*) AS present,
            sum(CAST(power(2.0, 62 - m_rho) AS DECIMAL(38,0))) AS sp
          FROM allr GROUP BY 1),
        est AS (SELECT day,
            CAST(present AS BIGINT) AS nonzero_regs,
            CAST($HllM - present AS BIGINT) AS zero_regs,
            ((0.7213 / (1.0 + 1.079 / $HllM.0)) * $HllM.0) * $HllM.0
              * power(2.0, 62)
              / CAST(sp + ($HllM - present)
                     * CAST(power(2.0, 62) AS DECIMAL(38,0)) AS DOUBLE)
              AS raw
          FROM agg)
        SELECT day, nonzero_regs, zero_regs,
          ${Exact.microsSql(
            s"CASE WHEN raw <= 2.5 * $HllM.0 AND zero_regs > 0 " +
            s"THEN $HllM.0 * ln($HllM.0 / CAST(zero_regs AS DOUBLE)) " +
            "ELSE raw END")} AS est_micros
        FROM est ORDER BY day""")),

    // ------------------------------------------------------------------
    // EXACT p50/p90/p99 without a global sort — the other end of the
    // quantile spectrum from DDSketch (q89 approximate / mergeable):
    // histogram rank-localization (Quantiles.exact) runs two scans plus
    // one value-range-pruned TakeOrdered per quantile, never a
    // range-shuffle and never an all-values memory buffer. The oracle
    // derives the same ceil(q·n) order statistics by brute row_number —
    // affordable for DuckDB at sf0.01, which is exactly why the Spark
    // side must NOT do it that way.
    QuerySpec("q168_exact_quantiles",
      (s, dir) => graft.operators.Quantiles.exact(
        Tables.lineitem(s, dir),
        Exact.cents(col("l_extendedprice")),
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
        .orderBy("ql"),
      Some(s"""
        WITH v AS (
          SELECT ${Exact.centsSql("l_extendedprice")} AS val FROM lineitem),
        n AS (SELECT count(*) AS n FROM v),
        r AS (SELECT val, row_number() OVER (ORDER BY val) AS rn FROM v),
        q(ql, p) AS (VALUES ('p50', 0.5), ('p90', 0.9), ('p99', 0.99)),
        k AS (SELECT ql, CAST(ceil(p * n) AS BIGINT) AS rank FROM q, n)
        SELECT k.ql, k.rank, r.val AS value
        FROM k JOIN r ON r.rn = k.rank
        ORDER BY k.ql""")),

    // ------------------------------------------------------------------
    // Per-group exact quantiles (q168's grouped sibling): p50/p95 of
    // order value per priority class — the histogram localization runs
    // per group, and the narrow pass is ONE distributed job (broadcast
    // rank-targets join + a row_number window over bucket-sized
    // partitions). The brute per-group row_number is exactly what the
    // oracle does — and exactly what doesn't scale, which is the point.
    QuerySpec("q178_grouped_quantiles",
      (s, dir) => graft.operators.Quantiles.exactByGroup(
        Tables.orders(s, dir), "o_orderpriority",
        Exact.cents(col("o_totalprice")),
        Seq("p50" -> 0.5, "p95" -> 0.95))
        .orderBy("o_orderpriority", "ql"),
      Some(s"""
        WITH v AS (
          SELECT o_orderpriority AS g,
                 ${Exact.centsSql("o_totalprice")} AS val FROM orders),
        r AS (
          SELECT g, val, row_number() OVER (PARTITION BY g ORDER BY val)
                   AS rn,
                 count(*) OVER (PARTITION BY g) AS n
          FROM v),
        q(ql, p) AS (VALUES ('p50', 0.5), ('p95', 0.95)),
        k AS (
          SELECT DISTINCT g, ql, CAST(ceil(p * n) AS BIGINT) AS rank
          FROM (SELECT DISTINCT g, n FROM r), q)
        SELECT k.g AS o_orderpriority, k.ql, k.rank, r.val AS value
        FROM k JOIN r ON r.g = k.g AND r.rn = k.rank
        ORDER BY 1, 2""")),

    // ------------------------------------------------------------------
    // Native TypedImperativeAggregate HLL (q83's estimate re-derived by
    // the Catalyst aggregate `HllSketchAgg`): ONE m-byte register
    // buffer per group per partition, updated in place, merged
    // register-wise through partial aggregation — each map task emits
    // 1 KiB per group instead of up to m rows per group. Bit-identical
    // hash/register/estimator to the DataFrame formulation, so the
    // oracle is q83's verbatim. Also the engine's SQL surface:
    // `SELECT graft_hll_distinct(x) …` plans this same expression.
    QuerySpec("q189_hll_native",
      (s, dir) => Tables.lineitem(s, dir)
        .agg(graft.functions.SketchFunctions.hllDistinct(
          concat_ws("|", col("l_orderkey"), col("l_partkey")),
          p = HllP).as("h"))
        .select(col("h.nonzero_regs"), col("h.zero_regs"),
          col("h.est_micros")),
      Some(s"""
        WITH hs AS (SELECT
            ${hashSql("l_orderkey || '|' || l_partkey")} AS h
          FROM lineitem),
        regs AS (
          SELECT h % $HllM AS idx,
                 CASE WHEN h // $HllM = 0 THEN ${HllBits + 1}
                      ELSE ${HllBits + 1} - length(bin(h // $HllM))
                 END AS rho
          FROM hs
          UNION ALL
          SELECT range AS idx, 0 AS rho FROM range(0, $HllM)),
        mx AS (SELECT idx, max(rho) AS m_rho FROM regs GROUP BY idx),
        agg AS (SELECT
            count(CASE WHEN m_rho > 0 THEN 1 END) AS nonzero_regs,
            sum(CAST(power(2.0, 62 - m_rho) AS DECIMAL(38,0))) AS s
          FROM mx),
        est AS (SELECT
            CAST(nonzero_regs AS BIGINT) AS nonzero_regs,
            CAST($HllM - nonzero_regs AS BIGINT) AS zero_regs,
            ((0.7213 / (1.0 + 1.079 / $HllM.0)) * $HllM.0) * $HllM.0
              * power(2.0, 62) / CAST(s AS DOUBLE) AS raw
          FROM agg)
        SELECT nonzero_regs, zero_regs,
          ${Exact.microsSql(
            s"CASE WHEN raw <= 2.5 * $HllM.0 AND zero_regs > 0 " +
            s"THEN $HllM.0 * ln($HllM.0 / CAST(zero_regs AS DOUBLE)) " +
            "ELSE raw END")} AS est_micros
        FROM est""")),

    // ------------------------------------------------------------------
    // The native aggregate GROUPED — distinct users per event type in
    // one pass, no register-row shuffle (plan guard asserts
    // ObjectHashAggregate). Oracle is q103's register replay.
    QuerySpec("q190_hll_native_grouped",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(graft.functions.SketchFunctions.hllDistinct(
          col("user_id").cast("string"), p = HllP).as("h"))
        .select(col("event_type"), col("h.nonzero_regs"),
          col("h.zero_regs"), col("h.est_micros"))
        .orderBy("event_type"),
      Some(s"""
        WITH hs AS (SELECT event_type,
            ${hashSql("CAST(user_id AS VARCHAR)")} AS h
          FROM events),
        regs AS (SELECT event_type, h % $HllM AS idx,
            CASE WHEN h // $HllM = 0 THEN ${HllBits + 1}
                 ELSE ${HllBits + 1} - length(bin(h // $HllM))
            END AS rho
          FROM hs),
        mx AS (SELECT event_type, idx, max(rho) AS m_rho
          FROM regs GROUP BY 1, 2),
        agg AS (SELECT event_type, count(*) AS present,
            sum(CAST(power(2.0, 62 - m_rho) AS DECIMAL(38,0))) AS sp
          FROM mx GROUP BY 1),
        est AS (SELECT event_type,
            CAST(present AS BIGINT) AS nonzero_regs,
            CAST($HllM - present AS BIGINT) AS zero_regs,
            ((0.7213 / (1.0 + 1.079 / $HllM.0)) * $HllM.0) * $HllM.0
              * power(2.0, 62)
              / CAST(sp + ($HllM - present)
                     * CAST(power(2.0, 62) AS DECIMAL(38,0)) AS DOUBLE)
              AS raw
          FROM agg)
        SELECT event_type, nonzero_regs, zero_regs,
          ${Exact.microsSql(
            s"CASE WHEN raw <= 2.5 * $HllM.0 AND zero_regs > 0 " +
            s"THEN $HllM.0 * ln($HllM.0 / CAST(zero_regs AS DOUBLE)) " +
            "ELSE raw END")} AS est_micros
        FROM est ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // Native TypedImperativeAggregate KMV (q45 re-derived by
    // `KmvSketchAgg`): the k smallest distinct hashes as in-place
    // TreeSet state, set-union merges through partial aggregation — no
    // sort anywhere (the DataFrame twin pays a per-partition top-k sort
    // + a global re-sort), ≤ 8k bytes per partition on the wire.
    // Oracle is q45's verbatim.
    QuerySpec("q191_kmv_native",
      (s, dir) => Tables.lineitem(s, dir)
        .agg(graft.functions.SketchFunctions.kmvDistinct(
          concat_ws("|", col("l_orderkey"), col("l_partkey")),
          k = KmvK).as("h"))
        .select(col("h.k_used"), col("h.kth_h"), col("h.est_distinct")),
      Some(s"""
        WITH h AS (SELECT DISTINCT
            ${hashSql("l_orderkey || '|' || l_partkey")} AS h
          FROM lineitem),
        k AS (SELECT h FROM h ORDER BY h LIMIT $KmvK),
        agg AS (SELECT count(*) AS k_used, max(h) AS kth_h FROM k)
        SELECT k_used, kth_h,
          CASE WHEN k_used < $KmvK THEN k_used
               ELSE CAST(floor(${KmvK - 1}.0 * power(2.0, 60)
                               / CAST(kth_h AS DOUBLE)) AS BIGINT)
          END AS est_distinct
        FROM agg""")),

    // ------------------------------------------------------------------
    // Native TypedImperativeAggregate DDSketch (q95's grouped quantiles
    // re-derived by `DdSketchAgg`): the whole sketch is ONE
    // bucket→count map per group per partition (~couple hundred
    // entries at alpha=2%), count-sum merged — no (group, bucket) row
    // shuffle, no window rank-walk stage; the walk runs inside eval on
    // the bounded map. Same bucket rule/rank/midpoint as the twins, so
    // the oracle is q95's verbatim.
    QuerySpec("q195_dd_native_grouped",
      (s, dir) => Tables.documents(s, dir)
        .groupBy("lang")
        .agg(graft.functions.SketchFunctions.ddQuantiles(
          col("n_chars").cast("double"), alpha = 0.02,
          pcts = Seq(50, 90)).as("qs"))
        .select(col("lang"), explode(col("qs")).as("q"))
        .select(col("lang"), col("q.q_pct"), col("q.bucket"),
          col("q.est_micros"))
        .orderBy("lang", "q_pct"),
      Some {
        val g = "((1.0 + 0.02) / (1.0 - 0.02))"
        s"""
        WITH v AS (SELECT lang, n_chars AS x FROM documents
          WHERE n_chars > 0),
        b AS (SELECT lang, CAST(ceil(
            CAST(${Exact.microsSql(s"ln(x) / ln($g)")} AS DOUBLE)
            / 1000000.0) AS BIGINT) AS bucket FROM v),
        sk AS (SELECT lang, bucket, count(*) AS cnt
          FROM b GROUP BY lang, bucket),
        c AS (SELECT lang, bucket, cnt,
            sum(cnt) OVER (PARTITION BY lang ORDER BY bucket) AS cum
          FROM sk),
        t AS (SELECT lang, sum(cnt) AS n FROM sk GROUP BY lang),
        q(q_pct) AS (VALUES (50), (90)),
        sel AS (SELECT c.lang, q_pct, min(bucket) AS bucket
          FROM c JOIN t ON c.lang = t.lang CROSS JOIN q
          WHERE cum >= floor(q_pct / 100.0 * (CAST(t.n AS DOUBLE) - 1.0)) + 1
          GROUP BY c.lang, q_pct)
        SELECT lang, CAST(q_pct AS INT) AS q_pct, bucket,
               ${Exact.microsSql(s"2.0 * power($g, bucket) / ($g + 1.0)")}
                 AS est_micros
        FROM sel ORDER BY lang, q_pct"""
      })
  )
}
