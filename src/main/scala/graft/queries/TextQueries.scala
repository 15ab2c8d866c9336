package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.{Analyzer, Html, Quality, TextStats}
import graft.util.Exact

/** Text-analysis and HTML-operator queries. The HTML family (T1–T6)
  * runs the real extraction operators over synthetic pages built
  * deterministically from the `documents` table; the oracle constructs
  * the *expected* output analytically — a golden check of the operator,
  * not a SQL re-implementation of regex parsing.
  */
object TextQueries {

  private def toksSql(expr: String): String =
    s"list_filter(string_split_regex(lower(trim($expr)), '\\s+'), x -> x <> '')"

  // --------------------------------------------------------- synthetic page

  /** Page URL and HTML body derived from a documents row. The page
    * carries: a <base href>, a followable root-relative link, a nofollow
    * relative link, a .js / .png / mailto link (all dropped by the
    * extractor), and a fragment-duplicate of the first link. */
  private def htmlCol: Column = concat(
    lit("<html><head><title> "), col("source"), lit(" #"),
    col("doc_id").cast("string"), lit(" &amp; co </title>"),
    lit("<base href=\"http://s"), col("doc_id").cast("string"),
    lit(".example/sub/\"></head><body><p>"), col("text"),
    lit("</p><a href=\"/doc/"), (col("doc_id") + 1).cast("string"),
    lit("\">next</a><a href=\"page"), (col("doc_id") + 2).cast("string"),
    lit("\" rel=\"nofollow\">rel</a>"),
    lit("<a href=\"//cdn.example/lib.js\">js</a>"),
    lit("<a href=\"img.png\">img</a>"),
    lit("<a href=\"mailto:x@y.z\">mail</a>"),
    lit("<a href=\"/doc/"), (col("doc_id") + 1).cast("string"),
    lit("#frag\">dup</a><a href=\"http://s"),
    (col("doc_id") + 1).cast("string"),
    lit(".example/page\">np</a></body></html>"))

  private def pageUrlCol: Column =
    concat(lit("http://s"), col("doc_id").cast("string"),
      lit(".example/page"))

  private def pages(s: SparkSession, dir: String) =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("source"),
        htmlCol.as("html"), pageUrlCol.as("page_url"))

  def specs: Seq[QuerySpec] = Seq(

    // ---------------------------------------------------------- text stats

    // Token counting + quality scoring (training-data pipeline).
    QuerySpec("q20_token_quality",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextStats.qualitySignals(docs)
          .join(TextStats.qualityScore(docs), Seq("doc_id"))
          .select(col("doc_id"), col("n_tokens"),
            Exact.micros(col("mean_token_len")).as("mtl_micros"),
            Exact.micros(col("stopword_ratio")).as("stop_micros"),
            Exact.micros(col("quality")).as("quality_micros"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH lt AS (SELECT doc_id, text, ${toksSql("text")} AS l
                    FROM documents),
        sig AS (
          SELECT doc_id,
            length(text) AS n_chars,
            len(l) AS n_tokens,
            CAST(length(text) AS DOUBLE) /
              CAST(greatest(len(l), 1) AS DOUBLE) AS mean_token_len,
            CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) /
              CAST(greatest(length(text), 1) AS DOUBLE) AS digit_ratio,
            CAST(len(list_filter(l, x -> list_contains(
              ['the','of','and','a','to','in','is','it','that','for',
               'on','with','as','was','at','by','an','be','this','are'], x)))
              AS DOUBLE) /
              CAST(greatest(len(l), 1) AS DOUBLE) AS stopword_ratio
          FROM lt)
        SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
          ${Exact.microsSql("mean_token_len")} AS mtl_micros,
          ${Exact.microsSql("stopword_ratio")} AS stop_micros,
          ${Exact.microsSql(
            "least(CAST(n_tokens AS DOUBLE) / 20.0, 1.0) * 0.4 + " +
            "least(stopword_ratio * 4.0, 1.0) * 0.4 + " +
            "(1.0 - least(digit_ratio * 5.0, 1.0)) * 0.2")} AS quality_micros
        FROM sig ORDER BY doc_id""")),

    // Language-ID heuristic: marker-token argmax with deterministic ties.
    QuerySpec("q21_language_id",
      (s, dir) => {
        TextStats.languageId(Tables.documents(s, dir))
          .select(col("doc_id"), col("lang_pred"),
            col("marker_hits").cast("long").as("marker_hits"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH lt AS (SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        hits AS (
          SELECT doc_id,
            len(list_filter(l, x -> list_contains(
              ['the','and','of','to','is','that','with','for'], x))) AS h_en,
            len(list_filter(l, x -> list_contains(
              ['der','die','das','und','ist','nicht','mit','ein'], x))) AS h_de,
            len(list_filter(l, x -> list_contains(
              ['le','la','les','et','est','que','pour','dans'], x))) AS h_fr,
            len(list_filter(l, x -> list_contains(
              ['el','los','las','es','que','para','con','una'], x))) AS h_es
          FROM lt),
        best AS (
          SELECT doc_id, greatest(h_en, h_de, h_fr, h_es) AS bh,
                 h_en, h_de, h_fr, h_es
          FROM hits)
        SELECT doc_id,
          CASE WHEN bh = 0 THEN 'und'
               WHEN h_fr = bh THEN 'fr'
               WHEN h_es = bh THEN 'es'
               WHEN h_en = bh THEN 'en'
               ELSE 'de' END AS lang_pred,
          CAST(bh AS BIGINT) AS marker_hits
        FROM best ORDER BY doc_id""")),

    // Order-sensitive document fingerprint (rolling-hash style).
    QuerySpec("q22_fingerprint",
      (s, dir) => {
        TextStats.fingerprint(Tables.documents(s, dir))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH lt AS (SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        toks AS (
          SELECT doc_id, unnest(l) AS tok,
                 generate_subscripts(l, 1) - 1 AS pos
          FROM lt)
        SELECT doc_id,
               CAST(sum(CAST(('0x' || substring(md5(pos || ':' || tok), 1, 15))
                             AS BIGINT) % 1000000007) AS BIGINT) AS fingerprint
        FROM toks GROUP BY doc_id ORDER BY doc_id""")),

    // ---------------------------------------------------------- HTML (T1-T6)

    // T2: <title> extraction with whitespace collapse + entity decode.
    QuerySpec("q23_title_extract",
      (s, dir) => pages(s, dir)
        .select(col("doc_id"), Html.titleOf(col("html")).as("title"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id, source || ' #' || doc_id || ' & co' AS title
        FROM documents ORDER BY doc_id""")),

    // T3: tag stripping with whitespace collapse + entity decode.
    QuerySpec("q24_strip_tags",
      (s, dir) => pages(s, dir)
        .select(col("doc_id"), Html.stripTags(col("html")).as("content"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               source || ' #' || doc_id || ' & co ' ||
               trim(regexp_replace(text, '\s+', ' ', 'g')) ||
               ' next rel js img mail dup np' AS content
        FROM documents ORDER BY doc_id""")),

    // T1: link extraction — base-href resolution, nofollow split,
    // extension/scheme filters, fragment-strip dedup. The oracle states
    // the expected links analytically.
    QuerySpec("q25_extract_links",
      (s, dir) => pages(s, dir)
        .select(col("doc_id"),
          explode(Html.extractLinksUdf(col("html"), col("page_url")))
            .as("link"))
        .select(col("doc_id"), col("link.url").as("url"),
          col("link.nofollow").as("nofollow"))
        .orderBy("doc_id", "url"),
      Some("""
        SELECT doc_id, url, nofollow FROM (
          SELECT doc_id,
                 'http://s' || doc_id || '.example/doc/' || (doc_id + 1)
                   AS url,
                 false AS nofollow
          FROM documents
          UNION ALL
          SELECT doc_id,
                 'http://s' || doc_id || '.example/sub/page' || (doc_id + 2),
                 true
          FROM documents
          UNION ALL
          SELECT doc_id,
                 'http://s' || (doc_id + 1) || '.example/page',
                 false
          FROM documents)
        ORDER BY doc_id, url""")),

    // Anchor-text index: the OFF-page ranking signal — what incoming
    // link text says a target URL is about. Every followable anchor
    // occurrence is a vote (no per-page dedup, unlike T1); nofollow
    // anchors are excluded entirely. Per the synthetic page layout each
    // /doc/ target receives 'next' + 'dup', each /page target 'np'.
    QuerySpec("q108_anchor_text",
      (s, dir) => pages(s, dir)
        .select(explode(Html.anchorTextsUdf(col("html"), col("page_url")))
          .as("a"))
        .select(col("a.url").as("url"), col("a.anchor").as("anchor"))
        .groupBy("url")
        .agg(count(lit(1)).as("n_anchors"),
          array_join(array_sort(collect_set(lower(col("anchor")))), " ")
            .as("terms"))
        .orderBy("url"),
      Some("""
        SELECT url, CAST(n_anchors AS BIGINT) AS n_anchors, terms FROM (
          SELECT 'http://s' || doc_id || '.example/doc/' || (doc_id + 1)
                   AS url,
                 2 AS n_anchors, 'dup next' AS terms
          FROM documents
          UNION ALL
          SELECT 'http://s' || (doc_id + 1) || '.example/page', 1, 'np'
          FROM documents)
        ORDER BY url""")),

    // T6: term highlighting (fixed closing tag, unlike the reference).
    QuerySpec("q26_highlight",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          Html.highlight(col("text"), Seq("spark", "query")).as("marked"))
        .filter(col("marked").contains("<em>"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               regexp_replace(text, '(?i)\b(spark|query)\b',
                              '<em>\1</em>', 'g') AS marked
        FROM documents
        WHERE contains(regexp_replace(text,
                '(?i)\b(spark|query)\b', '<em>\1</em>', 'g'),
              '<em>')
        ORDER BY doc_id""")),

    // T5: match summarizer — imperative semantics (greedy sentence
    // packing). Constructive oracle (q23-q25 pattern): the input is
    // built so the greedy pick is analytically known — sentence ratios
    // are 1/3, 0, 2/3, 0, so the packer takes s3 then s1, re-sorts by
    // position, and joins the skipped gap with "..." — the expected
    // string is closed-form. Golden specs for free-form text in HtmlSpec.
    QuerySpec("q27_summarize",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          Html.summarizeUdf(
            concat(lit("spark wins "), col("doc_id").cast("string"),
              lit(". plain filler text. join spark now." +
                " tail padding sentence.")),
            array(lit("spark"), lit("join")), lit(120)).as("summary"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               'spark wins ' || doc_id || '. ... join spark now.'
                 AS summary
        FROM documents ORDER BY doc_id""")),

    // R1 multi-field: weighted Title+Content relevance over the
    // crawl-derived corpus (reference es.go:199-201 multi_match over
    // [Title, Content]) — title hits boosted 2×, field-local df.
    QuerySpec("q40_multifield_search",
      (s, dir) => {
        val docs = pages(s, dir).select(col("doc_id"),
          Html.titleOf(col("html")).as("title"),
          Html.stripTags(col("html")).as("content"))
        graft.search.Search.matchScoresFields(docs,
            Seq("src3", "join"), Seq("title" -> 2.0, "content" -> 1.0))
          .select(col("doc_id"), Exact.micros(col("score")).as("score_micros"))
          .orderBy(col("score_micros").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""
        WITH pg AS (
          SELECT doc_id,
                 source || ' #' || doc_id || ' & co' AS title,
                 source || ' #' || doc_id || ' & co ' ||
                   trim(regexp_replace(text, '\\s+', ' ', 'g')) ||
                   ' next rel js img mail dup np' AS content
          FROM documents),
        n AS (SELECT count(*) AS n FROM documents),
        qt AS (SELECT doc_id, unnest(${toksSql("title")}) AS term FROM pg),
        qc AS (SELECT doc_id, unnest(${toksSql("content")}) AS term FROM pg),
        ft AS (SELECT doc_id, term FROM qt WHERE term IN ('src3', 'join')),
        fc AS (SELECT doc_id, term FROM qc WHERE term IN ('src3', 'join')),
        tft AS (SELECT doc_id, term, count(*) AS tf FROM ft GROUP BY 1, 2),
        tfc AS (SELECT doc_id, term, count(*) AS tf FROM fc GROUP BY 1, 2),
        dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM ft GROUP BY 1),
        dfc AS (SELECT term, count(DISTINCT doc_id) AS df FROM fc GROUP BY 1),
        st AS (
          SELECT tf.doc_id,
                 sum(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df)) AS score
          FROM tft tf JOIN dft df USING (term), n GROUP BY tf.doc_id),
        sc AS (
          SELECT tf.doc_id,
                 sum(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df)) AS score
          FROM tfc tf JOIN dfc df USING (term), n GROUP BY tf.doc_id)
        SELECT doc_id,
               ${Exact.microsSql(
                 "COALESCE(st.score, 0.0) * 2.0 + COALESCE(sc.score, 0.0) * 1.0")}
                 AS score_micros
        FROM st FULL JOIN sc USING (doc_id)
        ORDER BY score_micros DESC, doc_id
        LIMIT 20""")),

    // R2 (positional): analyzer-correct phrase matching on a PUNCTUATED
    // corpus — a comma is injected after every "join", so the padded-
    // contains fast path (q09's shape) cannot see "join batch" but the
    // positional matcher over strict-analyzer postings must. The oracle
    // replays the anchor construction: term i at position p anchors
    // p - i; a doc hits when one anchor collects every slot.
    QuerySpec("q42_positional_phrase",
      (s, dir) => {
        val punct = Tables.documents(s, dir)
          .select(col("doc_id"),
            regexp_replace(col("text"), " join ", " join, ").as("text"))
        graft.search.Search.phraseMatchPositional(punct, "join batch",
            analyzer = Analyzer.tokenizeStrict)
          .select(col("doc_id"))
          .orderBy("doc_id")
      },
      Some("""
        WITH p AS (
          SELECT doc_id,
                 regexp_replace(text, ' join ', ' join, ', 'g') AS t
          FROM documents),
        lt AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(t), '[^\p{L}\p{N}]+'), x -> x <> '')
            AS l
          FROM p),
        pos AS (
          SELECT doc_id, unnest(l) AS term,
                 generate_subscripts(l, 1) - 1 AS pos
          FROM lt),
        a0 AS (SELECT doc_id, pos AS anchor FROM pos WHERE term = 'join'),
        a1 AS (SELECT doc_id, pos - 1 AS anchor FROM pos WHERE term = 'batch')
        SELECT doc_id FROM (
          SELECT DISTINCT a0.doc_id AS doc_id
          FROM a0 JOIN a1
            ON a0.doc_id = a1.doc_id AND a0.anchor = a1.anchor)
        ORDER BY doc_id""")),

    // P6/S5 composition: one crawl pass — extract links from every page,
    // merge into a URL-keyed frontier keeping the newest observation.
    QuerySpec("q28_crawl_merge",
      (s, dir) => {
        val p = pages(s, dir)
        val seeds = p.select(col("page_url").as("url"),
          lit(-1L).as("seen_at"))
        val found = p.select(
            explode(Html.extractLinksUdf(col("html"), col("page_url")))
              .as("link"), col("doc_id"))
          .select(col("link.url").as("url"), col("doc_id").as("seen_at"))
        seeds.unionAll(found)
          .groupBy("url")
          .agg(max("seen_at").as("seen_at"), count(lit(1)).as("n_seen"))
          .orderBy("url")
      },
      Some("""
        WITH obs AS (
          SELECT 'http://s' || doc_id || '.example/page' AS url,
                 CAST(-1 AS BIGINT) AS seen_at
          FROM documents
          UNION ALL
          SELECT 'http://s' || doc_id || '.example/doc/' || (doc_id + 1),
                 doc_id
          FROM documents
          UNION ALL
          SELECT 'http://s' || doc_id || '.example/sub/page' || (doc_id + 2),
                 doc_id
          FROM documents
          UNION ALL
          SELECT 'http://s' || (doc_id + 1) || '.example/page',
                 doc_id
          FROM documents)
        SELECT url, max(seen_at) AS seen_at, count(*) AS n_seen
        FROM obs GROUP BY url ORDER BY url""")),

    // F2 with a SQL oracle (q209): private-network classification of a
    // literal-IP URL frontier — a deterministic synthetic corpus built
    // from orders keys covers RFC1918/loopback/link-local/CGN/0.x hits,
    // out-of-range octets (o1 runs to 299) and non-IP hostnames (every
    // 17th row). Spark side = the codegen'd Crawl.isPrivateIpCol over
    // the regexp-extracted host; the oracle replays the same CIDR math
    // in DuckDB. (The live-DNS UDF twin stays spec-only — resolution
    // isn't SQL-expressible; CrawlSpec pins twin agreement.)
    QuerySpec("q209_privnet_filter",
      (s, dir) => {
        val urls = Tables.orders(s, dir).select(col("o_orderkey"),
          concat(lit("http://"),
            when(col("o_orderkey") % 17 === 0, lit("intra.corp"))
              .otherwise(concat_ws(".",
                (col("o_orderkey") % 300).cast("string"),
                (expr("o_orderkey div 3") % 256).cast("string"),
                (expr("o_orderkey div 5") % 256).cast("string"),
                (expr("o_orderkey div 7") % 256).cast("string"))),
            lit("/page")).as("url"))
        urls
          .select(col("o_orderkey"),
            regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1).as("host"))
          .select(col("o_orderkey"), col("host"),
            graft.crawl.Crawl.isPrivateIpCol(col("host")).as("is_private"))
          .orderBy("o_orderkey")
      },
      Some("""
        WITH urls AS (
          SELECT o_orderkey,
                 'http://' ||
                 CASE WHEN o_orderkey % 17 = 0 THEN 'intra.corp'
                      ELSE CAST(o_orderkey % 300 AS VARCHAR) || '.' ||
                           CAST((o_orderkey // 3) % 256 AS VARCHAR) || '.' ||
                           CAST((o_orderkey // 5) % 256 AS VARCHAR) || '.' ||
                           CAST((o_orderkey // 7) % 256 AS VARCHAR)
                 END || '/page' AS url
          FROM orders),
        hosts AS (
          SELECT o_orderkey,
                 regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                 string_split(regexp_extract(url, '^[a-z]+://([^/]+)', 1),
                   '.') AS p
          FROM urls)
        SELECT o_orderkey, host,
               len(p) = 4
               AND regexp_matches(p[1], '^[0-9]{1,3}$')
               AND regexp_matches(p[2], '^[0-9]{1,3}$')
               AND regexp_matches(p[3], '^[0-9]{1,3}$')
               AND regexp_matches(p[4], '^[0-9]{1,3}$')
               AND TRY_CAST(p[1] AS INT) BETWEEN 0 AND 255
               AND TRY_CAST(p[2] AS INT) BETWEEN 0 AND 255
               AND TRY_CAST(p[3] AS INT) BETWEEN 0 AND 255
               AND TRY_CAST(p[4] AS INT) BETWEEN 0 AND 255
               AND (TRY_CAST(p[1] AS INT) = 10
                    OR (TRY_CAST(p[1] AS INT) = 172
                        AND TRY_CAST(p[2] AS INT) BETWEEN 16 AND 31)
                    OR (TRY_CAST(p[1] AS INT) = 192
                        AND TRY_CAST(p[2] AS INT) = 168)
                    OR TRY_CAST(p[1] AS INT) = 127
                    OR (TRY_CAST(p[1] AS INT) = 169
                        AND TRY_CAST(p[2] AS INT) = 254)
                    OR (TRY_CAST(p[1] AS INT) = 100
                        AND TRY_CAST(p[2] AS INT) BETWEEN 64 AND 127)
                    OR TRY_CAST(p[1] AS INT) = 0) AS is_private
        FROM hosts ORDER BY o_orderkey""")),

    // Multimodal plumbing: opaque binary payload column + typed metadata
    // (byte length, content digest) — the schema/partitioning layer the
    // decode stubs in graft.multimodal build on.
    QuerySpec("q29_binary_meta",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          md5(col("text").cast("binary")).as("digest"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS digest
        FROM documents ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Per-document keyword extraction: top-3 TF-IDF terms per doc. The
    // per-group top-k pattern at scale: rank-filter windows plan a
    // WindowGroupLimit (per-partition pre-prune before the shuffle), so
    // the window never sorts more than k+ rows per group downstream —
    // PlanSpec asserts the node is present.
    QuerySpec("q53_doc_keywords",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val toks = docs.select(col("doc_id"),
          explode(Analyzer.tokenize(col("text"))).as("term"))
        val tf = toks.groupBy("doc_id", "term")
          .agg(count(lit(1)).as("tf"))
        val dfreq = toks.groupBy("term")
          .agg(countDistinct(col("doc_id")).as("df"))
        val n = docs.count()
        val scored = tf.join(broadcast(dfreq), "term")
          .select(col("doc_id"), col("term"),
            Exact.micros(col("tf") *
              log(lit(n.toDouble) / col("df"))).as("tfidf_micros"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")
          .orderBy(col("tfidf_micros").desc, col("term"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("rn"), col("term"),
            col("tfidf_micros"))
          .orderBy("doc_id", "rn")
      },
      Some(s"""
        WITH tok AS (SELECT doc_id,
            unnest(${toksSql("text")}) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT term, count(DISTINCT doc_id) AS df
          FROM tok GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (SELECT tf.doc_id, tf.term,
            ${Exact.microsSql(
              "tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df)")} AS tfidf_micros
          FROM tf JOIN dfreq USING (term), n),
        ranked AS (SELECT doc_id, term, tfidf_micros,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY tfidf_micros DESC, term) AS rn
          FROM scored)
        SELECT doc_id, CAST(rn AS INT) AS rn, term, tfidf_micros
        FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""")),

    // ------------------------------------------------------------------
    // PII scrubbing: plant a deterministic email + 12-digit identifier
    // per doc (the corpus itself is clean), redact via TextStats.scrubPii,
    // and hash the scrubbed text — any regex-semantics drift between the
    // engine and the oracle's RE2 flips the hash. `removed` counts the
    // redacted characters (17/doc here: both patterns fired).
    QuerySpec("q54_pii_scrub",
      (s, dir) => {
        val planted = Tables.documents(s, dir).select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com ref 123456789012")).as("t"))
        planted
          .select(col("doc_id"), col("t"),
            graft.text.TextStats.scrubPii(col("t")).as("s"))
          .select(col("doc_id"),
            graft.dedup.Dedup.portableHash(col("s")).as("scrub_h"),
            (length(col("t")) - length(col("s"))).cast("long")
              .as("removed"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH planted AS (
          SELECT doc_id,
            text || ' contact user' || doc_id ||
              '@example.com ref 123456789012' AS t
          FROM documents),
        scrubbed AS (
          SELECT doc_id, t,
            regexp_replace(
              regexp_replace(t,
                '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<email>', 'g'),
              '[0-9]{9,}', '<num>', 'g') AS s
          FROM planted)
        SELECT doc_id,
          CAST(('0x'||substring(md5(s),1,15)) AS BIGINT) AS scrub_h,
          CAST(length(t) - length(s) AS BIGINT) AS removed
        FROM scrubbed ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Gopher repetition filters (token-n-gram form): most-frequent-
    // 2/3-gram share and duplicate-5-gram share per document. The
    // count/count divisions are single IEEE ops, so micros-rounding is
    // engine-stable.
    QuerySpec("q58_repetition_stats",
      (s, dir) => {
        TextStats.repetitionSignals(Tables.documents(s, dir))
          .select(col("doc_id"),
            Exact.micros(col("top2_frac")).as("top2_micros"),
            Exact.micros(col("top3_frac")).as("top3_micros"),
            Exact.micros(col("dup5_frac")).as("dup5_micros"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH lt AS (SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        ${Seq(2 -> "s2", 3 -> "s3").map { case (n, cte) => s"""
        g$n AS (SELECT doc_id,
            unnest(list_transform(
              generate_series(1, greatest(len(l) - ${n - 1}, 0)),
              i -> array_to_string(l[i:i + ${n - 1}], ' '))) AS g
          FROM lt),
        c$n AS (SELECT doc_id, g, count(*) AS c FROM g$n GROUP BY 1, 2),
        $cte AS (SELECT doc_id,
            CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS f
          FROM c$n GROUP BY 1)""" }.mkString(",")},
        g5 AS (SELECT doc_id,
            unnest(list_transform(
              generate_series(1, greatest(len(l) - 4, 0)),
              i -> array_to_string(l[i:i + 4], ' '))) AS g
          FROM lt),
        c5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2),
        s5 AS (SELECT doc_id,
            CAST(sum(c) - count(*) AS DOUBLE) /
              CAST(sum(c) AS DOUBLE) AS f
          FROM c5 GROUP BY 1)
        SELECT d.doc_id,
          ${Exact.microsSql("coalesce(s2.f, 0.0)")} AS top2_micros,
          ${Exact.microsSql("coalesce(s3.f, 0.0)")} AS top3_micros,
          ${Exact.microsSql("coalesce(s5.f, 0.0)")} AS dup5_micros
        FROM documents d
        LEFT JOIN s2 USING (doc_id)
        LEFT JOIN s3 USING (doc_id)
        LEFT JOIN s5 USING (doc_id)
        ORDER BY d.doc_id""")),

    // ------------------------------------------------------------------
    // GPT-style sequence packing: global token offsets via the two-phase
    // distributed prefix sum, 512-token contexts. The oracle's flat
    // window cumsum is the semantics; the engine's partitioned form is
    // the scale-correct plan for the same numbers.
    QuerySpec("q60_sequence_pack",
      (s, dir) => {
        graft.text.Pack.packedOffsets(Tables.documents(s, dir),
            budget = 512)
          .select(col("doc_id"), col("n_tok"), col("tok_offset"),
            col("seq_id"), col("seq_offset"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH lt AS (SELECT doc_id,
            CAST(len(${toksSql("text")}) AS BIGINT) AS n_tok
          FROM documents),
        offs AS (SELECT doc_id, n_tok,
            coalesce(sum(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS tok_offset
          FROM lt)
        SELECT doc_id, n_tok, CAST(tok_offset AS BIGINT) AS tok_offset,
          CAST(tok_offset // 512 AS BIGINT) AS seq_id,
          CAST(tok_offset % 512 AS BIGINT) AS seq_offset
        FROM offs ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Sliding-window token chunking (size 16, stride 8): per-chunk start,
    // length, and text hash. Shuffle-free explode on the engine side;
    // the hash flips on any slicing/joining drift between engines.
    QuerySpec("q61_token_chunks",
      (s, dir) => {
        graft.text.Pack.tokenChunks(Tables.documents(s, dir),
            size = 16, stride = 8)
          .select(col("doc_id"), col("chunk_id").cast("long")
              .as("chunk_id"),
            col("start").cast("long").as("start"),
            col("n_chunk_toks").cast("long").as("n_chunk_toks"),
            col("chunk_hash"))
          .orderBy("doc_id", "chunk_id")
      },
      Some(s"""
        WITH lt AS (SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        starts AS (SELECT doc_id, l,
            unnest(generate_series(0, len(l) - 1, 8)) AS start
          FROM lt WHERE len(l) > 0),
        ch AS (SELECT doc_id, start,
            list_slice(l, start + 1, least(start + 16, len(l))) AS c
          FROM starts)
        SELECT doc_id,
          CAST(start // 8 AS BIGINT) AS chunk_id,
          CAST(start AS BIGINT) AS start,
          CAST(len(c) AS BIGINT) AS n_chunk_toks,
          CAST(('0x'||substring(md5(array_to_string(c, ' ')),1,15))
            AS BIGINT) AS chunk_hash
        FROM ch ORDER BY doc_id, chunk_id""")),

    // ------------------------------------------------------------------
    // Unigram-LM perplexity filter (CCNet-style, deterministic form):
    // per-token -ln p snapped to integer micros BEFORE the per-doc sum
    // so the aggregation is associative on both engines. ln() precedent:
    // q53's TF-IDF oracle already round-trips ln through micros.
    QuerySpec("q62_unigram_nll",
      (s, dir) => {
        TextStats.unigramTokenNll(Tables.documents(s, dir))
          .select(col("doc_id"),
            Exact.micros(col("tok_nll")).as("m"))
          .groupBy("doc_id")
          .agg(sum("m").as("nll_sum_micros"),
            count(lit(1)).as("n_scored"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH tok AS (SELECT doc_id, unnest(${toksSql("text")}) AS tok
          FROM documents),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok),
        vocab AS (SELECT tok, CAST(count(*) AS DOUBLE) AS c
          FROM tok GROUP BY 1),
        scored AS (SELECT t.doc_id,
            ${Exact.microsSql("-ln(v.c / n.n)")} AS m
          FROM tok t JOIN vocab v USING (tok), n)
        SELECT doc_id, CAST(sum(m) AS BIGINT) AS nll_sum_micros,
          CAST(count(*) AS BIGINT) AS n_scored
        FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Interpolated BIGRAM perplexity (Jelinek-Mercer, λ=0.75) — q62's
    // CCNet-style filter upgraded one order: p(w|prev) = λ·cb/cp +
    // (1−λ)·cu/N, doc-initial tokens on the unigram term alone.
    // Per-token micros snap before the doc sum keeps aggregation
    // associative; the mean is integer division on both engines.
    QuerySpec("q116_bigram_perplexity",
      (s, dir) => {
        TextStats.bigramTokenNll(Tables.documents(s, dir))
          .select(col("doc_id"), Exact.micros(col("tok_nll")).as("m"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_toks"),
            sum("m").as("nll_sum_micros"))
          .withColumn("mean_nll_micros",
            expr("nll_sum_micros div n_toks"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH lt AS (SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        toks AS (
          SELECT doc_id, unnest(l) AS tok,
                 generate_subscripts(l, 1) - 1 AS pos
          FROM lt),
        prevd AS (
          SELECT doc_id, pos, tok,
                 lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
          FROM toks),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
        uni AS (SELECT tok, CAST(count(*) AS DOUBLE) AS cu
                FROM toks GROUP BY tok),
        bi AS (SELECT prev, tok, CAST(count(*) AS DOUBLE) AS cb
               FROM prevd WHERE prev IS NOT NULL GROUP BY 1, 2),
        ctx AS (SELECT prev, CAST(sum(cb) AS DOUBLE) AS cp
                FROM bi GROUP BY prev),
        sc AS (SELECT p.doc_id,
            ${Exact.microsSql(
              "CASE WHEN p.prev IS NULL THEN -ln(u.cu / n.n) " +
              "ELSE -ln(0.75 * (b.cb / c.cp) + 0.25 * (u.cu / n.n)) " +
              "END")} AS m
          FROM prevd p JOIN uni u USING (tok) CROSS JOIN n
          LEFT JOIN bi b ON b.prev = p.prev AND b.tok = p.tok
          LEFT JOIN ctx c ON c.prev = p.prev),
        agg AS (SELECT doc_id, count(*) AS n_toks,
            CAST(sum(m) AS BIGINT) AS nll_sum_micros
          FROM sc GROUP BY doc_id)
        SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks, nll_sum_micros,
               CAST(nll_sum_micros // n_toks AS BIGINT) AS mean_nll_micros
        FROM agg ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Keyness: top-10 discriminative terms per language by add-one
    // log-odds vs the rest of the corpus (Monroe et al. 2008's measure,
    // simple prior) — the corpus-drift diagnostic. Exact integer
    // counts; ranking compares micros-snapped scores (integer order is
    // engine-exact, q69 precedent), ties to the smaller term;
    // WindowGroupLimit pre-prunes each group.
    QuerySpec("q117_keyness",
      (s, dir) => TextStats.keyTerms(
          Tables.documents(s, dir), groupCol = "lang", k = 10)
        .orderBy("lang", "rank"),
      Some(s"""
        WITH tok AS (SELECT lang AS g, unnest(${toksSql("text")}) AS tok
          FROM documents),
        cl AS (SELECT g, tok, count(*) AS cl FROM tok GROUP BY 1, 2),
        nl AS (SELECT g, CAST(sum(cl) AS BIGINT) AS nl FROM cl GROUP BY g),
        ca AS (SELECT tok, CAST(sum(cl) AS BIGINT) AS c FROM cl GROUP BY tok),
        na AS (SELECT CAST(sum(nl) AS BIGINT) AS n FROM nl),
        sc AS (SELECT cl.g, cl.tok, cl.cl,
            ${Exact.microsSql(
              "ln(CAST(cl.cl + 1 AS DOUBLE) " +
              "/ CAST(nl.nl - cl.cl + 1 AS DOUBLE)) " +
              "- ln(CAST(ca.c - cl.cl + 1 AS DOUBLE) " +
              "/ CAST(na.n - nl.nl - (ca.c - cl.cl) + 1 AS DOUBLE))")}
              AS score_micros
          FROM cl JOIN nl USING (g) JOIN ca USING (tok) CROSS JOIN na),
        ranked AS (SELECT g, tok, cl, score_micros,
            row_number() OVER (PARTITION BY g
              ORDER BY score_micros DESC, tok) AS rank
          FROM sc)
        SELECT g AS lang, CAST(rank AS BIGINT) AS rank, tok,
               CAST(cl AS BIGINT) AS cl, score_micros
        FROM ranked WHERE rank <= 10 ORDER BY lang, rank""")),

    // ------------------------------------------------------------------
    // Vocabulary + per-doc OOV rate: min-df vocab (one distinct + one
    // term-keyed agg), broadcast back over the token stream — the
    // corpus never shuffles before the per-doc count. oov_frac is one
    // IEEE division → micros-exact.
    QuerySpec("q70_vocab_oov",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val vocab = TextStats.vocabulary(docs, minDf = 5L)
        TextStats.oovStats(docs, vocab)
          .select(col("doc_id"), col("n_tokens"), col("oov_tokens"),
            Exact.micros(col("oov_frac")).as("oov_frac_micros"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH tok AS MATERIALIZED (
          SELECT doc_id, unnest(${toksSql("text")}) AS term
          FROM documents),
        vocab AS MATERIALIZED (
          SELECT term FROM (SELECT term, count(DISTINCT doc_id) AS df
            FROM tok GROUP BY term) WHERE df >= 5)
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS oov_tokens,
          ${Exact.microsSql(
            "CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)" +
            " AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS oov_frac_micros
        FROM tok t LEFT JOIN vocab v ON t.term = v.term
        GROUP BY t.doc_id ORDER BY t.doc_id""")),

    // ------------------------------------------------------------------
    // Vocabulary coverage curve: cumulative occurrence share of the 200
    // most frequent types — integer cumsums over a TakeOrdered top-K
    // slice (the bounded-window paginate shape), one division per row.
    QuerySpec("q71_vocab_coverage",
      (s, dir) => {
        TextStats.vocabCoverage(Tables.documents(s, dir), topK = 200)
          .select(col("rank"), col("term"), col("cnt"), col("cum_cnt"),
            Exact.micros(col("cum_frac")).as("cum_frac_micros"))
          .orderBy("rank")
      },
      Some(s"""
        WITH tok AS MATERIALIZED (
          SELECT unnest(${toksSql("text")}) AS term FROM documents),
        counts AS MATERIALIZED (
          SELECT term, count(*) AS cnt FROM tok GROUP BY term),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM counts),
        top AS (
          SELECT term, cnt,
                 row_number() OVER (ORDER BY cnt DESC, term) AS rank,
                 sum(cnt) OVER (ORDER BY cnt DESC, term
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_cnt
          FROM counts ORDER BY cnt DESC, term LIMIT 200)
        SELECT CAST(rank AS INT) AS rank, term,
               CAST(cnt AS BIGINT) AS cnt,
               CAST(cum_cnt AS BIGINT) AS cum_cnt,
               ${Exact.microsSql("CAST(cum_cnt AS DOUBLE) / tot.tot")}
                 AS cum_frac_micros
        FROM top CROSS JOIN tot ORDER BY rank""")),

    // ------------------------------------------------------------------
    // Trigram-LM continuation table: per 2-token context, the total
    // count and the argmax next token (ties to the smaller token).
    // Pure integer counts; the rank-1 window prunes via
    // WindowGroupLimit. Contexts with total < 3 are noise-filtered.
    QuerySpec("q73_ngram_continuations",
      (s, dir) => {
        TextStats.continuationTable(Tables.documents(s, dir), n = 3)
          .filter(col("total") >= 3)
          .orderBy("context")
      },
      Some(s"""
        WITH lt AS MATERIALIZED (
          SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        g AS MATERIALIZED (
          SELECT unnest(list_transform(range(0, greatest(len(l) - 2, 0)),
            k -> struct_pack(context := l[k + 1] || ' ' || l[k + 2],
                             nxt := l[k + 3]))) AS s
          FROM lt),
        counts AS MATERIALIZED (
          SELECT s.context AS context, s.nxt AS next_tok, count(*) AS cnt
          FROM g GROUP BY 1, 2),
        ranked AS (
          SELECT context, next_tok, cnt,
                 sum(cnt) OVER (PARTITION BY context) AS total,
                 row_number() OVER (PARTITION BY context
                   ORDER BY cnt DESC, next_tok) AS rn
          FROM counts)
        SELECT context, CAST(total AS BIGINT) AS total, next_tok,
               CAST(cnt AS BIGINT) AS cnt
        FROM ranked WHERE rn = 1 AND total >= 3
        ORDER BY context""")),

    // ------------------------------------------------------------------
    // Materialized inverted index with delta-encoded postings — the
    // persisted form of the reference's ES/bleve index. Gap lists ride
    // as a comma-joined string so the cross-engine compare is on exact
    // integer text (arrow list field names differ between engines).
    QuerySpec("q80_inverted_index",
      (s, dir) => {
        graft.search.Search.invertedIndex(Tables.documents(s, dir))
          .select(col("term"), col("df"),
            array_join(col("doc_gaps"), ",").as("gaps"))
          .orderBy("term")
      },
      Some(s"""
        WITH lt AS (SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        t AS (SELECT doc_id, unnest(list_distinct(l)) AS term FROM lt),
        g AS (SELECT term, count(*) AS df,
                     list_sort(list(doc_id)) AS ds
              FROM t GROUP BY term)
        SELECT term, CAST(df AS BIGINT) AS df,
               array_to_string(list_transform(range(1, len(ds) + 1),
                 i -> ds[i] - coalesce(ds[i - 1], 0)), ',') AS gaps
        FROM g ORDER BY term""")),

    // ------------------------------------------------------------------
    // Inverted-index segment merge (the Lucene merge / re-crawl upsert
    // analog): the planted-copy batch (ids +100000, all greater) is
    // indexed as its OWN segment and merged into the standing index by
    // a vocabulary-sized term join — df adds, gap lists concatenate
    // with one junction re-base, postings never decode. The oracle
    // builds the full-corpus index from scratch; equality proves the
    // merged index is indistinguishable from a full rebuild.
    QuerySpec("q207_index_segment_merge",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val delta = docs.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" zz9 qq8 extra tail")).as("text"))
        graft.search.Search.mergeIndexSegments(
            graft.search.Search.invertedIndex(docs),
            graft.search.Search.invertedIndex(delta))
          .select(col("term"), col("df"),
            array_join(col("doc_gaps"), ",").as("gaps"))
          .orderBy("term")
      },
      Some(s"""
        WITH aug AS MATERIALIZED (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text || ' zz9 qq8 extra tail'
          FROM documents WHERE doc_id % 20 = 0),
        lt AS (SELECT doc_id, ${toksSql("text")} AS l FROM aug),
        t AS (SELECT doc_id, unnest(list_distinct(l)) AS term FROM lt),
        g AS (SELECT term, count(*) AS df,
                     list_sort(list(doc_id)) AS ds
              FROM t GROUP BY term)
        SELECT term, CAST(df AS BIGINT) AS df,
               array_to_string(list_transform(range(1, len(ds) + 1),
                 i -> ds[i] - coalesce(ds[i - 1], 0)), ',') AS gaps
        FROM g ORDER BY term""")),

    // ------------------------------------------------------------------
    // PMI collocations (Church & Hanks 1990): adjacent-token bigrams
    // with count ≥ 5 scored by pointwise mutual information. Integer
    // counts off two hash-aggs; one fixed parenthesization
    // ((cnt·N)·N)/((M·cx)·cy) then ln — micros-exact cross-engine (the
    // q53/q62 ln precedent).
    QuerySpec("q79_collocations",
      (s, dir) => {
        TextStats.collocations(Tables.documents(s, dir), minCount = 5)
          .select(col("w1"), col("w2"), col("cnt"),
            Exact.micros(col("pmi")).as("pmi_micros"))
          .orderBy("w1", "w2")
      },
      Some(s"""
        WITH lt AS MATERIALIZED (
          SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        uni AS MATERIALIZED (
          SELECT t, count(*) AS c
          FROM (SELECT unnest(l) AS t FROM lt) GROUP BY t),
        n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uni),
        big AS MATERIALIZED (
          SELECT unnest(list_transform(range(0, greatest(len(l) - 1, 0)),
            k -> struct_pack(a := l[k + 1], b := l[k + 2]))) AS s
          FROM lt),
        bc AS MATERIALIZED (
          SELECT s.a AS w1, s.b AS w2, count(*) AS cnt
          FROM big GROUP BY 1, 2),
        m AS (SELECT CAST(sum(cnt) AS DOUBLE) AS m FROM bc)
        SELECT sel.w1, sel.w2, CAST(sel.cnt AS BIGINT) AS cnt,
               ${Exact.microsSql(
                 "ln(((CAST(sel.cnt AS DOUBLE) * n.n) * n.n) / " +
                 "((m.m * CAST(ux.c AS DOUBLE)) * CAST(uy.c AS DOUBLE)))")}
                 AS pmi_micros
        FROM (SELECT * FROM bc WHERE cnt >= 5) sel
        JOIN uni ux ON ux.t = sel.w1
        JOIN uni uy ON uy.t = sel.w2
        CROSS JOIN n CROSS JOIN m
        ORDER BY sel.w1, sel.w2""")),

    // ------------------------------------------------------------------
    // BPE tokenizer training (Sennrich et al. 2016): the first 8 learned
    // merges over the documents corpus. Merge k+1 depends on the argmax
    // of round k — inherently sequential, like q13's coloring — but on a
    // FIXED corpus the merge sequence is deterministic, so the oracle
    // unrolls the 8 rounds as DuckDB CTEs (the unrolled-PageRank
    // pattern): the vocab is a separator-encoded string (tokens joined
    // by double chr(31)), pair stats come from splitting it, and the
    // leftmost-first non-overlapping merge fold is EXACTLY a sequential
    // string replace of `a<sep><sep>b` (validated against an
    // independent reference implementation). BpeSpec additionally pins
    // the canonical low/lower/newest/widest sequence. The corpus is
    // read once (vocab pass); each round is one hash-agg over the
    // vocab + a single collected row.
    QuerySpec("q86_bpe_merges",
      (s, dir) => {
        import s.implicits._
        graft.text.Bpe.learnMerges(Tables.documents(s, dir), "text",
            numMerges = 8)
          .toDF("rank", "left", "right", "freq")
          .select(col("rank"), col("left"), col("right"), col("freq"))
          .orderBy("rank")
      },
      Some {
        val S = "chr(31)"
        val SS = s"$S || $S"
        // Each v_k/m_k is referenced more than once downstream; without
        // MATERIALIZED the 8-deep CTE chain inlines exponentially.
        def round(k: Int) = s"""
        p$k AS (
          SELECT toks[i] AS a, toks[i + 1] AS b, sum(cnt) AS freq
          FROM (SELECT unnest(range(1, len(toks))) AS i, toks, cnt
                FROM (SELECT string_split(trim(enc, $S), $SS) AS toks, cnt
                      FROM v${k - 1}) s) u
          GROUP BY a, b),
        m$k AS MATERIALIZED (SELECT $k AS rank, a, b, freq FROM p$k
                ORDER BY freq DESC, a, b LIMIT 1),
        v$k AS MATERIALIZED (SELECT replace(enc,
                  (SELECT a FROM m$k) || $SS || (SELECT b FROM m$k),
                  (SELECT a || b FROM m$k)) AS enc, cnt
                FROM v${k - 1})"""
        s"""
        WITH wc AS MATERIALIZED (
          SELECT word, count(*) AS cnt
          FROM (SELECT unnest(list_filter(
                  string_split_regex(lower(trim(text)), '\\s+'),
                  x -> x <> '')) AS word
                FROM documents)
          GROUP BY word),
        v0 AS MATERIALIZED (
          SELECT $S || array_to_string(
                   list_append(string_split(word, ''), '</w>'), $SS) || $S
                   AS enc,
                 cnt
          FROM wc),
        ${(1 to 8).map(round).mkString(",")}
        SELECT rank, a AS "left", b AS "right", CAST(freq AS BIGINT) AS freq
        FROM (${(1 to 8).map(k => s"SELECT * FROM m$k").mkString(" UNION ALL ")})
        ORDER BY rank"""
      }),

    // ------------------------------------------------------------------
    // BPE ENCODE — the inference half applied end-to-end: learn the 8
    // merges (as q86), then encode every distinct corpus word with them
    // (one codegen'd fold per merge, embarrassingly parallel — the shape
    // a tokenizer-application pass over 100 TB takes). The oracle reuses
    // q86's separator-encoded CTE chain but keyed by word, so the FINAL
    // per-word token sequences are hash-checked, not just the merge
    // table.
    QuerySpec("q136_bpe_encode",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val merges = graft.text.Bpe.learnMerges(docs, "text", numMerges = 8)
          .map(m => (m._2, m._3))
        graft.text.Bpe.encode(docs, "text", merges)
          .select(col("word"), concat_ws(" ", col("toks")).as("toks"))
          .orderBy("word")
      },
      Some {
        val S = "chr(31)"
        val SS = s"$S || $S"
        def round(k: Int) = s"""
        p$k AS (
          SELECT toks[i] AS a, toks[i + 1] AS b, sum(cnt) AS freq
          FROM (SELECT unnest(range(1, len(toks))) AS i, toks, cnt
                FROM (SELECT string_split(trim(enc, $S), $SS) AS toks, cnt
                      FROM v${k - 1}) s) u
          GROUP BY a, b),
        m$k AS MATERIALIZED (SELECT a, b FROM p$k
                ORDER BY freq DESC, a, b LIMIT 1),
        v$k AS MATERIALIZED (SELECT word, replace(enc,
                  (SELECT a FROM m$k) || $SS || (SELECT b FROM m$k),
                  (SELECT a || b FROM m$k)) AS enc, cnt
                FROM v${k - 1})"""
        s"""
        WITH wc AS MATERIALIZED (
          SELECT word, count(*) AS cnt
          FROM (SELECT unnest(list_filter(
                  string_split_regex(lower(trim(text)), '\\s+'),
                  x -> x <> '')) AS word
                FROM documents)
          GROUP BY word),
        v0 AS MATERIALIZED (
          SELECT word, $S || array_to_string(
                   list_append(string_split(word, ''), '</w>'), $SS) || $S
                   AS enc,
                 cnt
          FROM wc),
        ${(1 to 8).map(round).mkString(",")}
        SELECT word, array_to_string(string_split(trim(enc, $S), $SS), ' ')
                 AS toks
        FROM v8 ORDER BY word"""
      }),

    // ------------------------------------------------------------------
    // Trigram wildcard search (pg_trgm design): '%merge part%' through
    // the posting index — candidates must cover ALL pattern trigrams,
    // then an exact contains() verify on candidates only. The oracle is
    // the naive full LIKE scan: hash equality proves the index path is
    // EXACT (no recall loss from the pruning). The pattern spans a word
    // boundary, which the tokenized search family (q08..) cannot see.
    QuerySpec("q123_trigram_search",
      (s, dir) => graft.search.Trigram.wildcardSearch(
          Tables.documents(s, dir), "doc_id", "text", "merge part")
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id FROM documents
        WHERE contains(lower(text), 'merge part')
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Multinomial Naive Bayes lang-id (McCallum & Nigam 1998),
    // train-on-corpus / classify-corpus, emitted as the confusion
    // matrix. Every log term (prior, Laplace likelihood) snaps to
    // integer micros BEFORE summation so document scores are exact
    // integer sums in both engines; argmax ties break to the smallest
    // label. The synthetic corpus draws lang independently of text, so
    // the matrix shows honest confusion — the pipeline shape (vocab ×
    // label likelihood table, token-linear scoring join) is what's
    // under test, and it is the 100 TB shape: no all-pairs, likelihoods
    // broadcast.
    QuerySpec("q149_naive_bayes_langid",
      (s, dir) => graft.ml.NaiveBayes.selfClassify(
          Tables.documents(s, dir), col("doc_id"), col("lang"),
          Analyzer.tokenize(col("text")))
        .groupBy(col("actual").as("lang"), col("predicted"))
        .agg(count(lit(1)).cast("long").as("n_docs"))
        .orderBy("lang", "predicted"),
      Some(s"""
        WITH toks AS MATERIALIZED (
          SELECT doc_id, lang, unnest(${toksSql("text")}) AS word
          FROM documents),
        dw AS (SELECT doc_id, lang AS actual, word, count(*) AS cnt
               FROM toks GROUP BY 1, 2, 3),
        v AS (SELECT count(DISTINCT word) AS v FROM toks),
        nd AS (SELECT count(*) AS n FROM documents),
        priors AS (
          SELECT lang AS cand, ${Exact.microsSql(
            "ln(CAST(count(*) AS DOUBLE) / nd.n)")} AS prior_micros
          FROM documents, nd GROUP BY lang, nd.n),
        ctot AS (SELECT lang AS cand, count(*) AS ntok
                 FROM toks GROUP BY 1),
        wc AS (SELECT word, lang AS cand, count(*) AS wcnt
               FROM toks GROUP BY 1, 2),
        sc AS (
          SELECT dw.doc_id, dw.actual, c.cand,
                 CAST(sum(dw.cnt * ${Exact.microsSql(
                   "ln(CAST(COALESCE(wc.wcnt, 0) + 1 AS DOUBLE) / " +
                     "(c.ntok + v.v))")}) AS BIGINT) AS ll
          FROM dw CROSS JOIN ctot c CROSS JOIN v
          LEFT JOIN wc ON wc.word = dw.word AND wc.cand = c.cand
          GROUP BY 1, 2, 3),
        pred AS (
          SELECT doc_id, actual, cand,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY (ll + p.prior_micros) DESC, cand ASC) AS rn
          FROM sc JOIN priors p USING (cand))
        SELECT actual AS lang, cand AS predicted,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM pred WHERE rn = 1
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ------------------------------------------------------------------
    // Zipf's-law fit: OLS of ln(frequency) on ln(rank) over the top-500
    // term types — the corpus-health scalar (natural text slopes ≈ −1;
    // template/boilerplate corpora flatten, spam steepens). Rank is a
    // TakeOrdered top-K (bounded — the window runs over 500 rows, never
    // the type table), the regression is one exact-integer-moment agg
    // (Stats.linearFit) over micros-snapped ln coordinates — ln on
    // identical doubles is bit-identical in both engines (q62/q79 rule).
    QuerySpec("q171_zipf_fit",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val counts = Tables.documents(s, dir)
          .select(explode(graft.text.Analyzer.tokenize(col("text")))
            .as("term"))
          .groupBy("term").agg(count(lit(1)).as("cnt"))
        val order = Seq(col("cnt").desc, col("term").asc)
        val top = counts.orderBy(order: _*).limit(500)
          .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
        graft.operators.Stats.linearFit(top, Nil,
          Exact.micros(log(col("rank").cast("double"))),
          Exact.micros(log(col("cnt").cast("double"))))
      },
      Some {
        val corr = "CAST(n*sxy - sx*sy AS DOUBLE)"
        val den = "CAST(n*sxx - sx*sx AS DOUBLE)"
        val dny = "CAST(n*syy - sy*sy AS DOUBLE)"
        s"""
        WITH tok AS MATERIALIZED (
          SELECT unnest(${toksSql("text")}) AS term FROM documents),
        counts AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
        top AS (
          SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rank
          FROM counts ORDER BY cnt DESC, term LIMIT 500),
        pts AS (
          SELECT ${Exact.microsSql("ln(CAST(rank AS DOUBLE))")} AS x,
                 ${Exact.microsSql("ln(CAST(cnt AS DOUBLE))")} AS y
          FROM top),
        m AS (
          SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x*x) AS HUGEINT) AS sxx,
                 CAST(sum(y*y) AS HUGEINT) AS syy,
                 CAST(sum(x*y) AS HUGEINT) AS sxy
          FROM pts)
        SELECT CAST(n AS BIGINT) AS n,
          CASE WHEN $den > 0 THEN ${Exact.microsSql(s"$corr / $den")}
          END AS slope_micros,
          CASE WHEN $den > 0 THEN ${Exact.microsSql(
            s"(CAST(sy AS DOUBLE) - $corr / $den * CAST(sx AS DOUBLE))" +
              " / CAST(n AS DOUBLE)")}
          END AS intercept_micros,
          CASE WHEN $den > 0 AND $dny > 0 THEN ${Exact.microsSql(
            s"$corr * $corr / ($den * $dny)")}
          END AS r2_micros
        FROM m"""
      }),

    // ------------------------------------------------------------------
    // Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995) —
    // q116's Jelinek-Mercer filter upgraded to the smoothing real LM
    // filters (KenLM) use: absolute discount d=0.75, freed mass routed
    // to the CONTINUATION unigram (distinct left-contexts, not raw
    // frequency). The corpus shuffles ONCE on doc_id (lag window) and
    // the per-doc sum reuses that exchange; count tables ride back as
    // AQE broadcasts. Per-token micros snap keeps the doc sum
    // associative and engine-exact.
    QuerySpec("q187_kneser_ney",
      (s, dir) => {
        TextStats.knBigramTokenNll(Tables.documents(s, dir))
          .select(col("doc_id"), Exact.micros(col("tok_nll")).as("m"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_toks"),
            sum("m").as("nll_sum_micros"))
          .withColumn("mean_nll_micros",
            expr("nll_sum_micros div n_toks"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH lt AS (SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        toks AS (
          SELECT doc_id, unnest(l) AS tok,
                 generate_subscripts(l, 1) - 1 AS pos
          FROM lt),
        prevd AS (
          SELECT doc_id, pos, tok,
                 lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
          FROM toks),
        bi AS (SELECT prev, tok, CAST(count(*) AS DOUBLE) AS cb
               FROM prevd WHERE prev IS NOT NULL GROUP BY 1, 2),
        ctx AS (SELECT prev, CAST(sum(cb) AS DOUBLE) AS cp,
                       CAST(count(*) AS DOUBLE) AS n1p
                FROM bi GROUP BY prev),
        n1r AS (SELECT tok, CAST(count(*) AS DOUBLE) AS n1r
                FROM bi GROUP BY tok),
        dv AS (SELECT CAST((SELECT count(*) FROM bi) AS DOUBLE) AS dt,
                      CAST((SELECT count(DISTINCT tok) FROM toks)
                        AS DOUBLE) AS v),
        sc AS (SELECT p.doc_id,
            ${Exact.microsSql(
              "CASE WHEN p.prev IS NULL " +
              "THEN -ln((coalesce(r.n1r, 0) + 1) / (dv.dt + dv.v)) " +
              "ELSE -ln((b.cb - 0.75) / c.cp + 0.75 * c.n1p / c.cp * " +
              "((coalesce(r.n1r, 0) + 1) / (dv.dt + dv.v))) END")} AS m
          FROM prevd p LEFT JOIN n1r r USING (tok) CROSS JOIN dv
          LEFT JOIN bi b ON b.prev = p.prev AND b.tok = p.tok
          LEFT JOIN ctx c ON c.prev = p.prev)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
               CAST(sum(m) AS BIGINT) AS nll_sum_micros,
               CAST(sum(m) // count(*) AS BIGINT) AS mean_nll_micros
        FROM sc GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Gopher-style quality rules (Rae et al. 2021 App. A): per-rule
    // accounting + conjunctive keep, all ratio thresholds
    // cross-multiplied into integer arithmetic — zero FP, one narrow
    // scan-fused projection (no shuffle at any corpus size).
    QuerySpec("q223_gopher_rules",
      (s, dir) => Quality.gopherRules(Tables.documents(s, dir))
        .orderBy("doc_id"),
      Some(s"""
        WITH lt AS (SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        base AS (
          SELECT doc_id,
            CAST(len(l) AS BIGINT) AS n_tokens,
            CAST(coalesce(list_sum(list_transform(l, x -> length(x))), 0)
              AS BIGINT) AS sum_len,
            CAST(len(list_filter(l, x -> regexp_matches(x, '[a-z]')))
              AS BIGINT) AS n_alpha,
            CAST(len(list_filter(l, x -> regexp_matches(x, '[#…]')))
              AS BIGINT) AS n_symbol,
            CAST(len(list_filter(
              ['the','a','to','in','of','and','is','with'],
              s -> list_contains(l, s))) AS BIGINT) AS n_stop
          FROM lt)
        SELECT doc_id, n_tokens, sum_len,
          CAST(n_tokens >= 10 AND n_tokens <= 100000 AS INT) AS r_count,
          CAST(sum_len >= 3 * n_tokens AND sum_len <= 10 * n_tokens
            AS INT) AS r_meanlen,
          CAST(10 * n_alpha >= 8 * n_tokens AS INT) AS r_alpha,
          CAST(10 * n_symbol <= n_tokens AS INT) AS r_symbol,
          CAST(n_stop >= 2 AS INT) AS r_stop,
          CAST((n_tokens >= 10 AND n_tokens <= 100000)
            AND (sum_len >= 3 * n_tokens AND sum_len <= 10 * n_tokens)
            AND (10 * n_alpha >= 8 * n_tokens)
            AND (10 * n_symbol <= n_tokens)
            AND (n_stop >= 2) AS INT) AS keep
        FROM base ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Gopher repetition rules (Rae et al. 2021 Table A1's repetition
    // band): duplicate-line fractions + top-2/3/4-gram character
    // fractions + duplicate-2-gram occurrence fraction, every threshold
    // an integer cross-multiplication. The RULES layer over q58's raw
    // signals: q58 reports occurrence-fraction diagnostics; this gates
    // on char-weighted fractions + line rules with thresholds and a
    // conjunctive keep — the form a pipeline filters with. The heavy
    // lifting is three (doc, gram) hash-aggs — map-side combinable,
    // token-explode-sized, the same scale class as the shingle
    // operators.
    QuerySpec("q241_gopher_repetition",
      (s, dir) => Quality.repetitionRules(Tables.documents(s, dir))
        .orderBy("doc_id"),
      Some(s"""
        WITH lt AS (SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        base AS (
          SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n_tokens,
            CAST(coalesce(list_sum(list_transform(l, x -> length(x))), 0)
              AS BIGINT) AS n_chars
          FROM lt),
        ${Seq(2, 3, 4).map { n => s"""
        g$n AS (
          SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
          FROM (SELECT doc_id,
                  unnest(CASE WHEN len(l) >= $n THEN list_transform(
                    generate_series(1, len(l)-${n - 1}),
                    i -> array_to_string(l[i:i+${n - 1}], ' '))
                  ELSE [] END) AS g
                FROM base)
          GROUP BY doc_id, g),
        s$n AS (
          SELECT doc_id,
            CAST(max(c * (length(g) - ${n - 1})) AS BIGINT) AS top$n,
            CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
              AS dup$n,
            CAST(sum(c) AS BIGINT) AS occ$n
          FROM g$n GROUP BY doc_id)""" }.mkString(",")},
        lines AS (
          SELECT doc_id, line, CAST(count(*) AS BIGINT) AS c
          FROM (SELECT doc_id,
                  unnest(list_filter(list_transform(
                    string_split(text, chr(10)), x -> trim(x)),
                    x -> x <> '')) AS line
                FROM documents)
          GROUP BY doc_id, line),
        ls AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
            CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
              AS dup_lines,
            CAST(sum(c * length(line)) AS BIGINT) AS line_chars,
            CAST(sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END)
              AS BIGINT) AS dup_line_chars
          FROM lines GROUP BY doc_id)
        SELECT b.doc_id, b.n_tokens, b.n_chars,
          CAST(100 * coalesce(dup_lines, 0) <=
            30 * coalesce(n_lines, 0) AS INT) AS r_dupline,
          CAST(100 * coalesce(dup_line_chars, 0) <=
            20 * coalesce(line_chars, 0) AS INT) AS r_duplinechar,
          CAST(100 * coalesce(top2, 0) <= 20 * b.n_chars AS INT)
            AS r_top2,
          CAST(100 * coalesce(top3, 0) <= 18 * b.n_chars AS INT)
            AS r_top3,
          CAST(100 * coalesce(top4, 0) <= 16 * b.n_chars AS INT)
            AS r_top4,
          CAST(100 * coalesce(dup2, 0) <= 10 * coalesce(occ2, 0) AS INT)
            AS r_dupgram,
          CAST((100 * coalesce(dup_lines, 0) <= 30 * coalesce(n_lines, 0))
            AND (100 * coalesce(dup_line_chars, 0) <=
              20 * coalesce(line_chars, 0))
            AND (100 * coalesce(top2, 0) <= 20 * b.n_chars)
            AND (100 * coalesce(top3, 0) <= 18 * b.n_chars)
            AND (100 * coalesce(top4, 0) <= 16 * b.n_chars)
            AND (100 * coalesce(dup2, 0) <= 10 * coalesce(occ2, 0))
            AS INT) AS keep
        FROM base b
        LEFT JOIN ls USING (doc_id)
        LEFT JOIN s2 USING (doc_id)
        LEFT JOIN s3 USING (doc_id)
        LEFT JOIN s4 USING (doc_id)
        ORDER BY b.doc_id""")),

    // ------------------------------------------------------------------
    // DSIR importance weights (Xie et al. 2023): rank raw documents by
    // target-likeness under smoothed unigram log-ratios. The ratio
    // table is vocabulary-sized and broadcast; per-token ln is snapped
    // once so document weights are exact integer dot products.
    QuerySpec("q224_dsir_weights",
      (s, dir) => {
        graft.ml.Dsir.importanceWeights(
            Tables.documents(s, dir), col("lang") === "en")
          .orderBy(col("weight_p6").desc, col("doc_id"))
          .limit(100)
      },
      Some(s"""
        WITH lt AS (
          SELECT doc_id, (lang = 'en') AS is_t,
                 unnest(${toksSql("text")}) AS token
          FROM documents),
        counts AS (
          SELECT token, CAST(count(*) AS BIGINT) AS rc,
                 CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT)
                   AS tc
          FROM lt GROUP BY token),
        tot AS (
          SELECT CAST(sum(rc) AS BIGINT) AS rtot,
                 CAST(sum(tc) AS BIGINT) AS ttot,
                 CAST(count(*) AS BIGINT) AS v
          FROM counts),
        lr AS (
          SELECT token, ${Exact.microsSql(
            "ln((CAST(tc + 1 AS DOUBLE) / CAST(ttot + v AS DOUBLE)) / " +
            "(CAST(rc + 1 AS DOUBLE) / CAST(rtot + v AS DOUBLE)))")}
            AS lr_micros
          FROM counts CROSS JOIN tot),
        dt AS (
          SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
          FROM lt GROUP BY doc_id, token)
        SELECT doc_id, CAST(sum(c * lr_micros) AS BIGINT) AS weight_p6
        FROM dt JOIN lr USING (token)
        GROUP BY doc_id
        ORDER BY weight_p6 DESC, doc_id LIMIT 100""")),

    // ------------------------------------------------------------------
    // DSIR scoring at ARRIVAL time: the log-ratio model derives from
    // the at-rest corpus only (vocab-sized, broadcast), the delta
    // streams in as two real micro-batches and each doc pays one token
    // explode + one broadcast join + a delta-sized sum — zero streaming
    // state, no watermark. Oracle pins the model to the old corpus and
    // replays the weight algebra over the delta: scoring at arrival
    // loses nothing vs batch rescoring, independent of micro-batching.
    QuerySpec("q234_stream_dsir",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val isDelta = col("doc_id") % 10 === 3
        graft.streaming.Streams.dsirAdmissionReplay(
            docs.filter(!isDelta), docs.filter(isDelta),
            col("lang") === "en")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH lt AS (
          SELECT doc_id, lang, unnest(${toksSql("text")}) AS token
          FROM documents),
        old AS (SELECT * FROM lt WHERE doc_id % 10 <> 3),
        counts AS (
          SELECT token, CAST(count(*) AS BIGINT) AS rc,
                 CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                   AS BIGINT) AS tc
          FROM old GROUP BY token),
        tot AS (
          SELECT CAST(sum(rc) AS BIGINT) AS rtot,
                 CAST(sum(tc) AS BIGINT) AS ttot,
                 CAST(count(*) AS BIGINT) AS v
          FROM counts),
        lr AS (
          SELECT token, ${Exact.microsSql(
            "ln((CAST(tc + 1 AS DOUBLE) / CAST(ttot + v AS DOUBLE)) / " +
            "(CAST(rc + 1 AS DOUBLE) / CAST(rtot + v AS DOUBLE)))")}
            AS lr_micros
          FROM counts CROSS JOIN tot)
        SELECT doc_id, CAST(sum(lr_micros) AS BIGINT) AS weight_p6
        FROM lt JOIN lr USING (token)
        WHERE doc_id % 10 = 3
        GROUP BY doc_id ORDER BY doc_id"""))
  )
}
