package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup
import graft.operators.Neighborhood
import graft.text.Analyzer
import graft.util.Exact

/** Deduplication queries over `documents`. The testdata corpus has no
  * verbatim duplicates, so the near-dup queries build a deterministic
  * augmented corpus (5% of docs get a perturbed copy at doc_id+100000)
  * and must find exactly those planted pairs — a real end-to-end check
  * of the MinHash/LSH and SimHash pipelines with a constructive oracle.
  */
object DedupQueries {

  /** DuckDB: lowercased whitespace tokens, empties dropped (= Analyzer.tokenize). */
  private def toksSql(expr: String): String =
    s"list_filter(string_split_regex(lower(trim($expr)), '\\s+'), x -> x <> '')"

  /** DuckDB: 60-bit portable hash (= Dedup.portableHash). */
  private def hashSql(expr: String): String =
    s"CAST(('0x' || substring(md5($expr), 1, 15)) AS BIGINT)"

  /** DuckDB CTEs: aug corpus + distinct 3-shingles per doc. */
  private val ShingleCtes =
    s"""aug AS MATERIALIZED (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text || ' zz9 qq8 extra tail'
      FROM documents WHERE doc_id % 20 = 0),
    lt AS MATERIALIZED (SELECT doc_id, ${toksSql("text")} AS l FROM aug),
    shingles AS MATERIALIZED (
      SELECT DISTINCT doc_id,
        unnest(list_transform(range(0, greatest(len(l) - 2, 0)),
          k -> l[k + 1] || ' ' || l[k + 2] || ' ' || l[k + 3])) AS shingle
      FROM lt)"""

  /** DuckDB CTEs: the full MinHash pipeline down to verified pairs
    * (`scored`), shared by q15 and the q32 component clustering. */
  private val MinhashPairCtes =
    s"""$ShingleCtes,
    hashed AS MATERIALIZED (
      SELECT doc_id, ${hashSql("shingle")} % 2147483647 AS h
      FROM shingles),
    mh AS MATERIALIZED (
      SELECT doc_id, j,
             min((h * (2 * j + 1) + (j * 2654435761) % 2147483647)
                 % 2147483647) AS mh
      FROM hashed CROSS JOIN (SELECT unnest(range(0, 12)) AS j)
      GROUP BY doc_id, j),
    bands AS MATERIALIZED (
      SELECT doc_id, CAST(j // 3 AS INT) AS band,
             md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j)) AS sig
      FROM mh GROUP BY doc_id, CAST(j // 3 AS INT)),
    cand AS MATERIALIZED (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id),
    sizes AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS MATERIALIZED (
      SELECT c.a, c.b, count(*) AS i
      FROM cand c
      JOIN shingles sa ON sa.doc_id = c.a
      JOIN shingles sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
      GROUP BY c.a, c.b),
    scored AS MATERIALIZED (
      SELECT c.a, c.b,
             CAST(COALESCE(i.i, 0) AS DOUBLE) /
             CAST(za.sz + zb.sz - COALESCE(i.i, 0) AS DOUBLE) AS jaccard
      FROM cand c
      LEFT JOIN inter i ON c.a = i.a AND c.b = i.b
      JOIN sizes za ON za.doc_id = c.a
      JOIN sizes zb ON zb.doc_id = c.b)"""

  private def augmented(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    docs.unionAll(docs.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz9 qq8 extra tail")).as("text")))
  }

  def specs: Seq[QuerySpec] = Seq(

    // Exact dedup: hash-groupBy on a normalized content key (first two
    // tokens — the corpus has no verbatim dups, the coarse key exercises
    // the collision path).
    QuerySpec("q14_exact_dedup",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val key = array_join(slice(Analyzer.tokenize(col("text")), 1, 2), " ")
        docs.select(col("doc_id"), Dedup.portableHash(key).as("content_hash"))
          .groupBy("content_hash")
          .agg(count(lit(1)).as("cnt"), min("doc_id").as("keep_id"))
          .filter(col("cnt") > 1)
          .orderBy("content_hash")
      },
      Some(s"""
        WITH lt AS MATERIALIZED (SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        keyed AS MATERIALIZED (
          SELECT doc_id,
                 ${hashSql("array_to_string(l[1:2], ' ')")} AS content_hash
          FROM lt)
        SELECT content_hash, count(*) AS cnt, min(doc_id) AS keep_id
        FROM keyed GROUP BY content_hash HAVING count(*) > 1
        ORDER BY content_hash""")),

    // MinHash + LSH near-dup detection end-to-end: 12 minhashes, 4 bands
    // of 3, candidates verified by exact shingle Jaccard ≥ 0.5. Must
    // recover the planted (i, i+100000) pairs.
    QuerySpec("q15_minhash_neardup",
      (s, dir) => {
        Dedup.minHashNearDups(augmented(s, dir), shingleN = 3,
            numHashes = 12, rowsPerBand = 3, threshold = 0.5)
          .select(col("a"), col("b"), Exact.micros(col("jaccard"))
            .as("jaccard_micros"))
          .orderBy("a", "b")
      },
      Some(s"""
        WITH $MinhashPairCtes
        SELECT a, b, ${Exact.microsSql("jaccard")} AS jaccard_micros
        FROM scored WHERE jaccard >= 0.5
        ORDER BY a, b""")),

    // SimHash fingerprints: 60-bit per-bit-majority signature per doc.
    QuerySpec("q16_simhash",
      (s, dir) => {
        Dedup.simHash(Tables.documents(s, dir))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH lt AS MATERIALIZED (SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        tf AS MATERIALIZED (
          SELECT doc_id, tok, count(*) AS tf, ${hashSql("tok")} AS h
          FROM (SELECT doc_id, unnest(l) AS tok FROM lt)
          GROUP BY doc_id, tok),
        bits AS MATERIALIZED (
          SELECT doc_id, b,
                 sum(CASE WHEN ((h >> CAST(b AS INT)) & 1) = 1
                     THEN tf ELSE -tf END) AS s
          FROM tf CROSS JOIN (SELECT unnest(range(0, 60)) AS b)
          GROUP BY doc_id, b)
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0
                        THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
                        ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // SimHash near-dups on the augmented corpus: banded candidate
    // generation (4×15-bit keys), exact Hamming ≤ 3 verification.
    QuerySpec("q17_simhash_neardup",
      (s, dir) => {
        Dedup.simHashNearDups(Dedup.simHash(augmented(s, dir)),
            maxHamming = 3)
          .orderBy("a", "b")
      },
      Some(s"""
        WITH $ShingleCtes,
        tf AS MATERIALIZED (
          SELECT doc_id, tok, count(*) AS tf, ${hashSql("tok")} AS h
          FROM (SELECT doc_id, unnest(l) AS tok FROM lt)
          GROUP BY doc_id, tok),
        bits AS MATERIALIZED (
          SELECT doc_id, b,
                 sum(CASE WHEN ((h >> CAST(b AS INT)) & 1) = 1
                     THEN tf ELSE -tf END) AS s
          FROM tf CROSS JOIN (SELECT unnest(range(0, 60)) AS b)
          GROUP BY doc_id, b),
        sh AS MATERIALIZED (
          SELECT doc_id,
                 sum(CASE WHEN s > 0
                     THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
                     ELSE 0 END) AS simhash
          FROM bits GROUP BY doc_id),
        bands AS MATERIALIZED (
          SELECT doc_id, simhash, band,
                 (simhash >> CAST(band * 15 AS INT)) & 32767 AS key
          FROM sh CROSS JOIN (SELECT unnest(range(0, 4)) AS band)),
        pairs AS MATERIALIZED (
          SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
                 bit_count(xor(CAST(l.simhash AS UBIGINT),
                               CAST(r.simhash AS UBIGINT))) AS hamming
          FROM bands l JOIN bands r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)
        SELECT a, b, CAST(hamming AS INT) AS hamming
        FROM pairs WHERE hamming <= 3
        ORDER BY a, b""")),

    // Dedup clustering: near-dup pairs → connected components by
    // min-label propagation (6 fixed rounds, fully lazy plan); component
    // id = canonical (minimum) doc id. The oracle unrolls the rounds.
    QuerySpec("q32_dedup_components",
      (s, dir) => {
        val pairs = Dedup.minHashNearDups(augmented(s, dir), shingleN = 3,
            numHashes = 12, rowsPerBand = 3, threshold = 0.5)
          .select("a", "b")
        graft.graph.Components.run(pairs, maxRounds = 6,
            earlyStop = false)
          .orderBy("id")
      },
      Some {
        val steps = (1 to 6).map { k =>
          s"""l$k AS MATERIALIZED (
             SELECT id, min(component) AS component FROM (
               SELECT id, component FROM l${k - 1}
               UNION ALL
               SELECT u.src AS id, l.component
               FROM und u JOIN l${k - 1} l ON u.dst = l.id)
             GROUP BY id)"""
        }.mkString(",\n")
        s"""
        WITH $MinhashPairCtes,
        pairs AS MATERIALIZED (SELECT a, b FROM scored WHERE jaccard >= 0.5),
        und AS MATERIALIZED (
          SELECT a AS src, b AS dst FROM pairs
          UNION
          SELECT b, a FROM pairs),
        l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS component FROM und),
        $steps
        SELECT id, component FROM l6 ORDER BY id"""
      }),

    // ------------------------------------------------------------------
    // Winnowed fingerprints (Schleimer et al. 2003 / MOSS): per-doc
    // selection stats over k=3-gram hashes, window w=4. The window min
    // runs BEFORE the full-window filter on both engines (filtering
    // first would shrink tail windows).
    QuerySpec("q52_winnow_fingerprints",
      (s, dir) => Dedup.winnow(Tables.documents(s, dir), k = 3, w = 4)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_fps"), min("fp").as("min_fp"),
          max("fp").as("max_fp"))
        .orderBy("doc_id"),
      Some(s"""
        WITH lt AS (SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        ex AS (SELECT doc_id, greatest(len(l)-2, 0) AS n,
            unnest(list_transform(range(0, greatest(len(l)-2, 0)),
              k -> struct_pack(pos := k,
                h := ${hashSql("l[k+1]||' '||l[k+2]||' '||l[k+3]")}
                       % 1000000007))) AS s
          FROM lt),
        sh AS (SELECT doc_id, s.pos AS pos, s.h AS h, n FROM ex),
        win AS (SELECT doc_id, pos, n,
            min(h) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
          FROM sh),
        fps AS (SELECT DISTINCT doc_id, fp FROM win WHERE pos <= n - 4)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
               min(fp) AS min_fp, max(fp) AS max_fp
        FROM fps GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Benchmark decontamination: every 10th doc plays the eval set, the
    // rest are training docs; flag training docs sharing any distinct
    // 3-gram with the eval set. The eval gram set broadcasts; the
    // training side never shuffles before the final per-doc count.
    QuerySpec("q59_decontaminate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val evalSet = docs.filter(col("doc_id") % 10 === 0)
        val train = docs.filter(col("doc_id") % 10 =!= 0)
        Dedup.decontaminate(train, evalSet, n = 3)
          .select(col("doc_id"), col("shared_ngrams").cast("long")
            .as("shared_ngrams"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH lt AS (SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        grams AS (SELECT doc_id,
            unnest(list_distinct(list_transform(
              generate_series(1, greatest(len(l) - 2, 0)),
              i -> array_to_string(l[i:i + 2], ' ')))) AS g
          FROM lt),
        ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0),
        tr AS (SELECT doc_id, g FROM grams WHERE doc_id % 10 <> 0)
        SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS shared_ngrams
        FROM tr JOIN ev USING (g)
        GROUP BY tr.doc_id ORDER BY tr.doc_id""")),

    // ------------------------------------------------------------------
    // EXACT set-similarity join (PPJoin-style prefix filtering): all
    // pairs with shingle Jaccard ≥ 0.5, no approximation. The oracle
    // BRUTE-FORCES every shingle-sharing pair — so this row hash-checks
    // the filter's no-false-negative guarantee end-to-end, not just the
    // arithmetic (any missed pair changes the row set).
    QuerySpec("q77_prefix_join",
      (s, dir) => {
        Dedup.prefixFilterJoin(augmented(s, dir), shingleN = 3,
            threshold = 0.5)
          .select(col("a"), col("b"), Exact.micros(col("jaccard"))
            .as("jaccard_micros"))
          .orderBy("a", "b")
      },
      Some(s"""
        WITH $ShingleCtes,
        sizes AS MATERIALIZED (
          SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
        inter AS MATERIALIZED (
          SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS i
          FROM shingles sa JOIN shingles sb
            ON sb.shingle = sa.shingle AND sa.doc_id < sb.doc_id
          GROUP BY 1, 2)
        SELECT i.a, i.b,
               ${Exact.microsSql(
                 "CAST(i.i AS DOUBLE) / " +
                 "CAST(za.sz + zb.sz - i.i AS DOUBLE)")} AS jaccard_micros
        FROM inter i
        JOIN sizes za ON za.doc_id = i.a
        JOIN sizes zb ON zb.doc_id = i.b
        WHERE CAST(i.i AS DOUBLE) / CAST(za.sz + zb.sz - i.i AS DOUBLE)
              >= 0.5
        ORDER BY a, b""")),

    // ------------------------------------------------------------------
    // Exact duplicate-span detection (Lee et al. 2022's substring dedup,
    // n-gram-position formulation): a doc's span is duplicated when its
    // 5-token gram occurs more than once corpus-wide. The planted
    // verbatim copies (+100000) make every span of theirs — and of their
    // originals — duplicated; dup_frac is a single IEEE division on both
    // engines, so micros snapping is exact.
    QuerySpec("q66_duplicate_spans",
      (s, dir) => {
        Dedup.duplicateSpans(augmented(s, dir), n = 5)
          .select(col("doc_id"), col("n_spans"), col("dup_spans"),
            Exact.micros(col("dup_frac")).as("dup_frac_micros"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH aug AS MATERIALIZED (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text || ' zz9 qq8 extra tail'
          FROM documents WHERE doc_id % 20 = 0),
        lt AS MATERIALIZED (SELECT doc_id, ${toksSql("text")} AS l FROM aug),
        g AS MATERIALIZED (
          SELECT doc_id, ${hashSql("gram")} AS h FROM (
            SELECT doc_id,
              unnest(list_transform(range(0, greatest(len(l) - 4, 0)),
                k -> array_to_string(l[k + 1:k + 5], ' '))) AS gram
            FROM lt)),
        f AS MATERIALIZED (SELECT h FROM g GROUP BY h HAVING count(*) > 1),
        d AS MATERIALIZED (
          SELECT doc_id, count(*) AS dup_spans
          FROM g JOIN f USING (h) GROUP BY doc_id),
        ns AS MATERIALIZED (
          SELECT doc_id, greatest(len(l) - 4, 0) AS n_spans FROM lt)
        SELECT ns.doc_id, CAST(ns.n_spans AS BIGINT) AS n_spans,
          CAST(coalesce(d.dup_spans, 0) AS BIGINT) AS dup_spans,
          ${Exact.microsSql(
            "CASE WHEN ns.n_spans > 0 THEN " +
            "CAST(coalesce(d.dup_spans, 0) AS DOUBLE) / " +
            "CAST(ns.n_spans AS DOUBLE) ELSE 0.0 END")} AS dup_frac_micros
        FROM ns LEFT JOIN d USING (doc_id)
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // The dedup pipeline's final decision: near-dup clusters (q32's
    // minhash → LSH → verify → components chain) pruned to one KEEPER
    // per cluster — the member with the best quality score, ties to the
    // smaller id. One struct-max aggregation per cluster on the engine
    // side (no per-cluster sort); the oracle mirrors it with a window.
    QuerySpec("q63_dedup_keep_best",
      (s, dir) => {
        val docs = augmented(s, dir)
        val pairs = Dedup.minHashNearDups(docs, shingleN = 3,
            numHashes = 12, rowsPerBand = 3, threshold = 0.5)
          .select("a", "b")
        val comp = graft.graph.Components.run(pairs, maxRounds = 6,
          earlyStop = false)
        val qual = graft.text.TextStats.qualityScore(docs)
          .select(col("doc_id"), Exact.micros(col("quality")).as("qm"))
        comp.join(qual, comp("id") === qual("doc_id"))
          .groupBy("component")
          .agg(count(lit(1)).as("n_members"),
            max(struct(col("qm").as("q"), (-col("id")).as("nid")))
              .as("b"))
          .select(col("component"), col("n_members"),
            (-col("b.nid")).as("keep_id"),
            col("b.q").as("keep_q_micros"))
          .orderBy("component")
      },
      Some {
        val steps = (1 to 6).map { k =>
          s"""l$k AS MATERIALIZED (
             SELECT id, min(component) AS component FROM (
               SELECT id, component FROM l${k - 1}
               UNION ALL
               SELECT u.src AS id, l.component
               FROM und u JOIN l${k - 1} l ON u.dst = l.id)
             GROUP BY id)"""
        }.mkString(",\n")
        s"""
        WITH $MinhashPairCtes,
        pairs AS MATERIALIZED (SELECT a, b FROM scored WHERE jaccard >= 0.5),
        und AS MATERIALIZED (
          SELECT a AS src, b AS dst FROM pairs
          UNION
          SELECT b, a FROM pairs),
        l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS component FROM und),
        $steps,
        q AS MATERIALIZED (
          SELECT lt.doc_id, ${Exact.microsSql(
            "least(CAST(len(l) AS DOUBLE) / 20.0, 1.0) * 0.4 + " +
            "least((CAST(len(list_filter(l, x -> list_contains(" +
            "['the','of','and','a','to','in','is','it','that','for'," +
            "'on','with','as','was','at','by','an','be','this','are'], x)))" +
            " AS DOUBLE) / CAST(greatest(len(l), 1) AS DOUBLE)) * 4.0, 1.0)" +
            " * 0.4 + " +
            "(1.0 - least((CAST(length(regexp_replace(aug.text, '[^0-9]'," +
            " '', 'g')) AS DOUBLE) / " +
            "CAST(greatest(length(aug.text), 1) AS DOUBLE)) * 5.0, 1.0))" +
            " * 0.2")} AS qm
          FROM lt JOIN aug USING (doc_id)),
        ranked AS (
          SELECT l6.component, l6.id, q.qm,
            row_number() OVER (PARTITION BY l6.component
              ORDER BY q.qm DESC, l6.id ASC) AS rn,
            count(*) OVER (PARTITION BY l6.component) AS n_members
          FROM l6 JOIN q ON q.doc_id = l6.id)
        SELECT component, CAST(n_members AS BIGINT) AS n_members,
          id AS keep_id, qm AS keep_q_micros
        FROM ranked WHERE rn = 1 ORDER BY component"""
      }),

    // Sorted-neighborhood blocking (Hernández & Stolfo 1995): rank the
    // augmented corpus by a 20-char normalized text prefix, pair only
    // rows within a rank window of 6, then verify candidates with exact
    // edit distance (the planted copies append a 19-char tail, so they
    // rank adjacent and pass dist <= 20). Candidate volume is O(n·w) —
    // the rank join is an equi-join, never a cross product — and the
    // global rank itself is the two-phase distributed prefix sum
    // (driver sees only #partitions subtotal rows).
    QuerySpec("q100_sorted_neighborhood",
      (s, dir) => {
        val pairs = Neighborhood.sortedNeighborhoodPairs(
          augmented(s, dir),
          substring(lower(trim(col("text"))), 1, 20), "doc_id",
          w = 6, payload = Seq("text"))
        pairs
          // |len(a) − len(b)| is an exact Levenshtein lower bound: pairs
          // beyond it cannot pass the ≤20 gate, so the prefilter (and
          // the banded threshold DP, O(len·20) not O(len²)) prune
          // without changing the result set.
          .filter(abs(length(col("text_a")) - length(col("text_b"))) <= 20)
          .withColumn("dist",
            levenshtein(col("text_a"), col("text_b"), 20).cast("long"))
          .filter(col("dist") >= 0 && col("dist") <= 20)
          .select(col("id_a"), col("id_b"), col("dist"))
      },
      Some(s"""
        WITH aug AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text || ' zz9 qq8 extra tail'
          FROM documents WHERE doc_id % 20 = 0),
        ranked AS (
          SELECT doc_id, text,
                 row_number() OVER (
                   ORDER BY substring(lower(trim(text)), 1, 20), doc_id) AS rn
          FROM aug),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
          FROM ranked a JOIN ranked b
            ON b.rn > a.rn AND b.rn <= a.rn + 5)
        SELECT id_a, id_b, dist FROM pairs WHERE dist <= 20""")),

    // ------------------------------------------------------------------
    // Fellegi-Sunter probabilistic record linkage (1969): lang-blocked
    // candidate pairs scored by the log-likelihood ratio over three
    // field comparators (source, length bucket, 40-char prefix);
    // u-probabilities estimated from the data as the random-pair
    // agreement rate Σcnt²/n². m = 0.875 so both m and 1−m are exact
    // binary doubles (identical constants in both engines); every field
    // weight micros-snaps before the per-pair BIGINT sum. The 4.0
    // threshold effectively demands prefix agreement — i.e. the planted
    // near-dup corpus q14/q15 finds by hashing, recovered here by the
    // classical statistical model instead.
    QuerySpec("q125_record_linkage",
      (s, dir) => graft.operators.RecordLinkage.fellegiSunter(
          Tables.documents(s, dir), "doc_id",
          blockCols = Seq("lang"),
          fields = Seq(
            "source" -> col("source"),
            "lenb" -> floor(col("n_chars") / lit(100)).cast("long"),
            "pre" -> substring(lower(col("text")), 1, 40)),
          m = 0.875, thresholdMicros = 4000000L)
        .orderBy("id_a", "id_b"),
      Some(s"""
        WITH base AS MATERIALIZED (
          SELECT doc_id, lang, source,
                 n_chars // 100 AS lenb,
                 substring(lower(text), 1, 40) AS pre
          FROM documents),
        us AS (SELECT CAST(sum(cnt * cnt) AS DOUBLE)
                 / CAST(sum(cnt) * sum(cnt) AS DOUBLE) AS u
               FROM (SELECT count(*) AS cnt FROM base GROUP BY source)),
        ul AS (SELECT CAST(sum(cnt * cnt) AS DOUBLE)
                 / CAST(sum(cnt) * sum(cnt) AS DOUBLE) AS u
               FROM (SELECT count(*) AS cnt FROM base GROUP BY lenb)),
        up AS (SELECT CAST(sum(cnt * cnt) AS DOUBLE)
                 / CAST(sum(cnt) * sum(cnt) AS DOUBLE) AS u
               FROM (SELECT count(*) AS cnt FROM base GROUP BY pre)),
        scored AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            (CASE WHEN a.source = b.source
               THEN ${Exact.microsSql("ln(0.875 / us.u)")}
               ELSE ${Exact.microsSql("ln(0.125 / (1.0 - us.u))")} END
           + CASE WHEN a.lenb = b.lenb
               THEN ${Exact.microsSql("ln(0.875 / ul.u)")}
               ELSE ${Exact.microsSql("ln(0.125 / (1.0 - ul.u))")} END
           + CASE WHEN a.pre = b.pre
               THEN ${Exact.microsSql("ln(0.875 / up.u)")}
               ELSE ${Exact.microsSql("ln(0.125 / (1.0 - up.u))")} END)
              AS score_micros
          FROM base a JOIN base b
            ON a.lang = b.lang AND a.doc_id < b.doc_id, us, ul, up)
        SELECT id_a, id_b, score_micros FROM scored
        WHERE score_micros > 4000000
        ORDER BY id_a, id_b""")),

    // ------------------------------------------------------------------
    // Shingle-containment near-supersets: |A∩B|/|A| asymmetric overlap
    // over the augmented corpus, whose planted `+tail` docs are TRUE
    // supersets (containment 1.0 one way, diluted Jaccard). Candidates
    // via a df≤64-capped inverted shingle index (both engines apply the
    // same cap), containment exact in integer ppm. The direction columns
    // identify the subset side — what a training-data pipeline keeps
    // (the superset) vs drops.
    QuerySpec("q133_containment",
      (s, dir) => Dedup.containmentPairs(augmented(s, dir), shingleN = 3,
          maxDf = 64, minContainmentPpm = 800000L)
        .orderBy("a", "b"),
      Some(s"""
        WITH $ShingleCtes,
        dfs AS MATERIALIZED (
          SELECT shingle, count(*) AS df FROM shingles GROUP BY 1),
        rare AS MATERIALIZED (
          SELECT s.doc_id, s.shingle FROM shingles s
          JOIN dfs USING (shingle) WHERE dfs.df <= 64),
        cand AS MATERIALIZED (
          SELECT DISTINCT ra.doc_id AS a, rb.doc_id AS b
          FROM rare ra JOIN rare rb
            ON ra.shingle = rb.shingle AND ra.doc_id < rb.doc_id),
        sizes AS MATERIALIZED (
          SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
        inter AS MATERIALIZED (
          SELECT c.a, c.b, count(*) AS shared FROM cand c
          JOIN shingles sa ON sa.doc_id = c.a
          JOIN shingles sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
          GROUP BY 1, 2)
        SELECT i.a, i.b,
               i.shared * 1000000 // za.sz AS cont_a_ppm,
               i.shared * 1000000 // zb.sz AS cont_b_ppm
        FROM inter i
        JOIN sizes za ON za.doc_id = i.a
        JOIN sizes zb ON zb.doc_id = i.b
        WHERE greatest(i.shared * 1000000 // za.sz,
                       i.shared * 1000000 // zb.sz) >= 800000
        ORDER BY a, b""")),

    // ------------------------------------------------------------------
    // Jaro-Winkler fuzzy matching over catalog descriptions, the classic
    // record-linkage comparator (Winkler 1990), via the native codegen'd
    // JaroWinkler expression — bit-identical per row to DuckDB's
    // jaro_winkler_similarity (pinned in StringSimSpec). Scale shape:
    // similarity runs over the DISTINCT description set (8.4k strings at
    // sf0.1 vs 20k part rows — at 100 TB the catalog stays bounded while
    // facts grow), candidates are blocked on the exact p_name (no
    // all-pairs), and the distinct set broadcasts so the blocked
    // self-join is shuffle-free.
    QuerySpec("q146_jaro_winkler_match",
      (s, dir) => {
        val d = Tables.part(s, dir)
          .select(col("p_name"),
            concat_ws(" ", col("p_name"), col("p_brand"), col("p_type"))
              .as("descr"))
          .distinct()
        d.as("a").join(broadcast(d.as("b")),
            col("a.p_name") === col("b.p_name") &&
              col("a.descr") < col("b.descr"))
          .select(col("a.descr").as("descr_a"), col("b.descr").as("descr_b"),
            Exact.micros(graft.functions.StringFunctions
              .jaroWinkler(col("a.descr"), col("b.descr"))).as("jw_micros"))
          .filter(col("jw_micros") >= 950000L)
          .orderBy("descr_a", "descr_b")
      },
      Some(s"""
        WITH d AS MATERIALIZED (
          SELECT DISTINCT p_name,
                 p_name || ' ' || p_brand || ' ' || p_type AS descr
          FROM part),
        p AS (
          SELECT a.descr AS descr_a, b.descr AS descr_b,
                 ${Exact.microsSql(
                   "jaro_winkler_similarity(a.descr, b.descr)")} AS jw_micros
          FROM d a JOIN d b
            ON a.p_name = b.p_name AND a.descr < b.descr)
        SELECT descr_a, descr_b, jw_micros FROM p
        WHERE jw_micros >= 950000
        ORDER BY descr_a, descr_b""")),

    // ------------------------------------------------------------------
    // C4-style LINE-level exact dedup (Raffel et al. 2020 §2.2: "we
    // discarded all but one of any three-sentence span occurring more
    // than once", applied at line granularity by most reproductions):
    // corpus-wide keep-FIRST over 10-token line units, reported per doc
    // as kept/total counts plus an order-independent integer
    // fingerprint (sum of surviving line hashes) — finer-grained than
    // whole-doc dedup (q14), coarser than duplicate n-gram spans
    // (q66). The only corpus-sized exchange is the line-hash shuffle
    // that the keep-first window needs — exactly one, and its key
    // cardinality is the distinct-line count.
    QuerySpec("q196_line_dedup",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val lines = graft.text.Pack.tokenChunks(
            Tables.documents(s, dir), size = 10, stride = 10)
          .select(col("doc_id"), col("chunk_id").cast("long").as("line_id"),
            col("chunk_hash"))
        val w = Window.partitionBy("chunk_hash")
          .orderBy("doc_id", "line_id")
        lines.withColumn("rn", row_number().over(w))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_lines"),
            sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("rn") === 1, col("chunk_hash")).otherwise(0L))
              .as("kept_fingerprint"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH lt AS (SELECT doc_id, ${toksSql("text")} AS l FROM documents),
        starts AS (SELECT doc_id, l,
            unnest(generate_series(0, len(l) - 1, 10)) AS start
          FROM lt WHERE len(l) > 0),
        lines AS (SELECT doc_id, CAST(start // 10 AS BIGINT) AS line_id,
            ${hashSql(
              "array_to_string(list_slice(l, start + 1, " +
              "least(start + 10, len(l))), ' ')")} AS h
          FROM starts),
        flagged AS (SELECT doc_id, h,
            row_number() OVER (PARTITION BY h ORDER BY doc_id, line_id)
              AS rn
          FROM lines)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               CAST(sum(CASE WHEN rn = 1 THEN h ELSE 0 END) AS BIGINT)
                 AS kept_fingerprint
        FROM flagged GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Incremental near-dup: the planted copies plus every 13th original
    // arrive as a DELTA batch; only their band signatures are computed
    // fresh and probe the old corpus's band table (the stored-LSH-index
    // posture — per-doc minhashes never need recomputation), plus the
    // delta self-join. Verified output = exactly the delta-touching
    // subset of q15's full-corpus pairs, which is what the oracle
    // selects from the SAME full MinHash CTE chain — proving the
    // incremental path loses nothing against the batch path.
    QuerySpec("q206_incremental_neardup",
      (s, dir) => {
        val aug = augmented(s, dir)
        val isDelta =
          col("doc_id") >= 100000 || col("doc_id") % 13 === 3
        Dedup.incrementalNearDups(
            aug.filter(!isDelta), aug.filter(isDelta),
            shingleN = 3, numHashes = 12, rowsPerBand = 3,
            threshold = 0.5)
          .select(col("a"), col("b"), Exact.micros(col("jaccard"))
            .as("jaccard_micros"))
          .orderBy("a", "b")
      },
      Some(s"""
        WITH $MinhashPairCtes
        SELECT a, b, ${Exact.microsSql("jaccard")} AS jaccard_micros
        FROM scored
        WHERE jaccard >= 0.5
          AND (a >= 100000 OR a % 13 = 3 OR b >= 100000 OR b % 13 = 3)
        ORDER BY a, b""")),

    // Streaming near-dup admission control: the delta ARRIVES as a
    // stream (two real micro-batches) and each doc is banded
    // statelessly (rowwise minhash — no streaming agg, no watermark)
    // then probed against the stored corpus's band index as a
    // stream-static join, with per-row exact-Jaccard verification
    // against the corpus's static shingle arrays. The oracle is the
    // old×delta (exactly-one-side-delta) slice of the SAME full
    // MinHash CTE chain — in-flight admission loses nothing against
    // the batch rebuild, independent of how the stream is
    // micro-batched.
    QuerySpec("q211_stream_neardup_admission",
      (s, dir) => {
        val aug = augmented(s, dir)
        val isDelta =
          col("doc_id") >= 100000 || col("doc_id") % 13 === 3
        graft.streaming.Streams.nearDupAdmissionReplay(
            aug.filter(!isDelta), aug.filter(isDelta),
            shingleN = 3, numHashes = 12, rowsPerBand = 3,
            threshold = 0.5)
          .select(col("a"), col("b"), Exact.micros(col("jaccard"))
            .as("jaccard_micros"))
          .orderBy("a", "b")
      },
      Some(s"""
        WITH $MinhashPairCtes
        SELECT a, b, ${Exact.microsSql("jaccard")} AS jaccard_micros
        FROM scored
        WHERE jaccard >= 0.5
          AND ((a >= 100000 OR a % 13 = 3)
               <> (b >= 100000 OR b % 13 = 3))
        ORDER BY a, b""")),

    // Stored-index streaming admission: q211 with the index handoff
    // closed. The corpus's band table + shingle sidecar are staged ONCE
    // as bucketed layouts committed through the VERSIONED store (the
    // source-mtime fingerprint lives in the commit manifest; the probe
    // pins a committed index version, re-registered metadata-only on
    // later sessions) and the arriving micro-batches
    // probe THOSE — the timed plan is probe-only, its index side reads
    // distribution from the bucket layout (PlanSpec pins the probe
    // exchange-free on the index side), and the only shuffle is
    // delta-sized. Same oracle contract as q211: the old×delta slice
    // of the full MinHash CTE chain — the stored handoff loses nothing
    // against the in-query index build.
    QuerySpec("q215_stored_admission",
      (s, dir) => {
        val aug = augmented(s, dir)
        val isDelta =
          col("doc_id") >= 100000 || col("doc_id") % 13 === 3
        graft.streaming.Streams.nearDupAdmissionStoredReplay(
            aug.filter(!isDelta), aug.filter(isDelta),
            tag = math.abs(dir.hashCode).toString,
            sourceMtime = graft.util.FsMeta.mtime(
              s"$dir/documents.parquet"),
            shingleN = 3, numHashes = 12, rowsPerBand = 3,
            threshold = 0.5)
          .select(col("a"), col("b"), Exact.micros(col("jaccard"))
            .as("jaccard_micros"))
          .orderBy("a", "b")
      },
      Some(s"""
        WITH $MinhashPairCtes
        SELECT a, b, ${Exact.microsSql("jaccard")} AS jaccard_micros
        FROM scored
        WHERE jaccard >= 0.5
          AND ((a >= 100000 OR a % 13 = 3)
               <> (b >= 100000 OR b % 13 = 3))
        ORDER BY a, b"""))
  )
}
