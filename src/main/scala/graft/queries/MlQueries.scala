package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.Similarity
import graft.util.Exact

/** Embedding similarity queries over `embeddings` (64-dim float
  * vectors). The oracles unroll the 64-element dot products as chained
  * `+` so the left-to-right double accumulation matches Spark's
  * `aggregate` fold bit-for-bit; LSH hyperplanes are emitted as the SAME
  * literal doubles `Similarity.planeMatrix` bakes into the Spark plan
  * (shortest-round-trip formatting re-parses to identical bits), so the
  * projection sums are order-deterministic on both engines — no
  * group-sum reassociation flake near a sign boundary.
  */
object MlQueries {

  private val Dim = 64

  /** a·b with both sides widened to double per element, left-to-right. */
  private def dotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")

  private def normSql(a: String): String =
    "sqrt(" + (1 to Dim)
      .map(i => s"CAST($a[$i] AS DOUBLE) * CAST($a[$i] AS DOUBLE)")
      .mkString(" + ") + ")"

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / (${normSql(a)} * ${normSql(b)})"

  /** Signed projection of `vecExpr` onto plane `p`, unrolled with the
    * driver-computed literal components (= Similarity.lshBuckets). */
  private def projSql(vecExpr: String, plane: Array[Double]): String =
    plane.zipWithIndex.map { case (c, d) =>
      s"CAST($vecExpr[${d + 1}] AS DOUBLE) * ($c)"
    }.mkString(" + ")

  /** `planes`-bit sign-LSH signature of `vecExpr` as a BIGINT. */
  private def bucketSql(vecExpr: String, planes: Int): String = {
    val m = Similarity.planeMatrix(planes, Dim)
    (0 until planes).map { p =>
      s"(CASE WHEN (${projSql(vecExpr, m(p))}) > 0 " +
        s"THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
  }

  /** Squared L2 between two float arrays, per-element double widening,
    * left-to-right (= Ivf.sqDist's fold). */
  private def sqDistSql(a: String, b: String): String =
    (1 to Dim).map { i =>
      s"(CAST($a[$i] AS DOUBLE) - CAST($b[$i] AS DOUBLE)) * " +
        s"(CAST($a[$i] AS DOUBLE) - CAST($b[$i] AS DOUBLE))"
    }.mkString(" + ")

  private def queryVec(s: org.apache.spark.sql.SparkSession,
                       dir: String): Seq[Float] =
    Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select("embedding").first()
      .getSeq[Float](0)

  def specs: Seq[QuerySpec] = Seq(

    // Brute-force exact cosine top-k against a query vector — the ANN
    // baseline. Spark plans TakeOrderedAndProject (no global sort).
    QuerySpec("q18_cosine_topk",
      (s, dir) => {
        Similarity.bruteForceTopK(Tables.embeddings(s, dir),
            queryVec(s, dir), 20)
          .select(col("vec_id"), Exact.micros(col("cos")).as("cos_micros"))
      },
      Some(s"""
        WITH q AS MATERIALIZED (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, ${Exact.microsSql(cosSql("e.embedding", "q.qv"))}
                 AS cos_micros
        FROM embeddings e CROSS JOIN q
        ORDER BY ${cosSql("e.embedding", "q.qv")} DESC, e.vec_id
        LIMIT 20""")),

    // LSH-bucketed approximate top-k: sign-random-projection buckets
    // (8 deterministic hyperplanes), bucket-local exact re-rank — the
    // 100 TB path where all-pairs is impossible.
    QuerySpec("q19_ann_lsh_topk",
      (s, dir) => {
        Similarity.lshTopK(Tables.embeddings(s, dir),
            queryVec(s, dir), 10, planes = 8)
          .select(col("vec_id"), Exact.micros(col("cos")).as("cos_micros"))
      },
      Some(s"""
        WITH be AS MATERIALIZED (
          SELECT vec_id, embedding, ${bucketSql("embedding", 8)} AS bucket
          FROM embeddings),
        qb AS MATERIALIZED (SELECT bucket, embedding AS qv FROM be WHERE vec_id = 0)
        SELECT e.vec_id, ${Exact.microsSql(cosSql("e.embedding", "q.qv"))}
                 AS cos_micros
        FROM be e CROSS JOIN qb q
        WHERE e.bucket = q.bucket
        ORDER BY ${cosSql("e.embedding", "q.qv")} DESC, e.vec_id
        LIMIT 10""")),

    // IVF coarse-quantizer probe: assign every vector to its nearest of
    // 8 fixed centroids (the vec_id < 8 embeddings — no Lloyd averaging
    // in the oracle path, so every arithmetic step is an ordered fold),
    // then scan only the nprobe=2 clusters nearest the query and exact-
    // rank by cosine. This is the IVF read path at 100 TB: the
    // assignment table is partitioned by cluster, a probe reads
    // ~nprobe/k of the corpus. (Lloyd build determinism is covered by
    // IvfSpec; group means are engine-local FP, so the driver oracle
    // pins the quantizer instead.)
    QuerySpec("q41_ivf_probe",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cluster"),
            transform(col("embedding"), _.cast("double")).as("centroid"))
        val idx = graft.ml.Ivf.Index(
          graft.ml.Ivf.assign(emb, cents), cents)
        graft.ml.Ivf.topK(idx, queryVec(s, dir), 10, nprobe = 2)
          .select(col("vec_id"), Exact.micros(col("cos")).as("cos_micros"))
      },
      Some(s"""
        WITH cents AS MATERIALIZED (
          SELECT vec_id AS cluster, embedding AS cvec
          FROM embeddings WHERE vec_id < 8),
        q AS MATERIALIZED (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        probed AS MATERIALIZED (
          SELECT cluster FROM (
            SELECT c.cluster, ${sqDistSql("q.qv", "c.cvec")} AS d
            FROM cents c CROSS JOIN q
            ORDER BY d, cluster LIMIT 2)),
        assigned AS MATERIALIZED (
          SELECT vec_id, embedding, cluster FROM (
            SELECT e.vec_id, e.embedding, c.cluster,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${sqDistSql("e.embedding", "c.cvec")},
                              c.cluster) AS rn
            FROM embeddings e CROSS JOIN cents c)
          WHERE rn = 1)
        SELECT a.vec_id, ${Exact.microsSql(cosSql("a.embedding", "q.qv"))}
                 AS cos_micros
        FROM assigned a JOIN probed USING (cluster) CROSS JOIN q
        ORDER BY ${cosSql("a.embedding", "q.qv")} DESC, a.vec_id
        LIMIT 10""")),

    // IVF incremental append — ANN index maintenance, the q203-q207
    // ingest posture for the vector side: the corpus index is built
    // once (old vectors assigned to the 8 fixed centroids), a delta
    // batch arrives and is assigned to the FROZEN quantizer only
    // (delta × k distance evaluations, zero corpus work), and a probe
    // of the appended index must equal the probe of a full rebuild
    // with the same quantizer — assignment is a pure per-row function
    // of (vector, centroids), so append ≡ rebuild exactly. Oracle =
    // the full-corpus assignment probe (q41's formulation, nprobe 3).
    QuerySpec("q214_ivf_append",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cluster"),
            transform(col("embedding"), _.cast("double")).as("centroid"))
        val isDelta = col("vec_id") % 7 === 2
        val idx = graft.ml.Ivf.Index(
          graft.ml.Ivf.assign(emb.filter(!isDelta), cents), cents)
        val appended = graft.ml.Ivf.append(idx, emb.filter(isDelta))
        graft.ml.Ivf.topK(appended, queryVec(s, dir), 10, nprobe = 3)
          .select(col("vec_id"), Exact.micros(col("cos")).as("cos_micros"))
      },
      Some(s"""
        WITH cents AS MATERIALIZED (
          SELECT vec_id AS cluster, embedding AS cvec
          FROM embeddings WHERE vec_id < 8),
        q AS MATERIALIZED (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        probed AS MATERIALIZED (
          SELECT cluster FROM (
            SELECT c.cluster, ${sqDistSql("q.qv", "c.cvec")} AS d
            FROM cents c CROSS JOIN q
            ORDER BY d, cluster LIMIT 3)),
        assigned AS MATERIALIZED (
          SELECT vec_id, embedding, cluster FROM (
            SELECT e.vec_id, e.embedding, c.cluster,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${sqDistSql("e.embedding", "c.cvec")},
                              c.cluster) AS rn
            FROM embeddings e CROSS JOIN cents c)
          WHERE rn = 1)
        SELECT a.vec_id, ${Exact.microsSql(cosSql("a.embedding", "q.qv"))}
                 AS cos_micros
        FROM assigned a JOIN probed USING (cluster) CROSS JOIN q
        ORDER BY ${cosSql("a.embedding", "q.qv")} DESC, a.vec_id
        LIMIT 10""")),

    // IVF centroid-refresh cycle — closes the production loop q214's
    // frozen quantizer leaves open, composing q212 (versioned commits)
    // with q214 (append): the grown corpus's index (old + delta on the
    // frozen quantizer) is committed as VERSION 1 of a versioned store,
    // then RETRAINED — one Lloyd round over the grown corpus: new
    // centroid = element-wise member mean, full reassignment — and the
    // refreshed index is committed as VERSION 2. The probe phases prove
    // the swap discipline: a probe pinned to version 1 AFTER the
    // refresh commit returns exactly the pre-refresh ranking (old
    // probes stay servable while retraining lands), and the version-2
    // probe ranks against the refreshed quantizer (both its nprobe
    // cluster choice and its candidate sets move). Oracle replays both
    // chains: q214's assignment probe verbatim for phase 1, and the
    // mean → reassign → probe chain for phase 2.
    QuerySpec("q216_ivf_refresh",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cluster"),
            transform(col("embedding"), _.cast("double")).as("centroid"))
        val isDelta = col("vec_id") % 7 === 2
        val grown = graft.ml.Ivf.append(
          graft.ml.Ivf.Index(
            graft.ml.Ivf.assign(emb.filter(!isDelta), cents), cents),
          emb.filter(isDelta))
        val aroot = graft.util.TempDirs.scratch("ivf_assign")
        val croot = graft.util.TempDirs.scratch("ivf_cents")
        graft.store.Versioned.commitAppend(grown.assignments, aroot)
        graft.store.Versioned.commitAppend(grown.centroids, croot)
        val refreshed = graft.ml.Ivf.refresh(graft.ml.Ivf.Index(
          graft.store.Versioned.read(s, aroot, 1),
          graft.store.Versioned.read(s, croot, 1)))
        graft.store.Versioned.commitOverwrite(refreshed.assignments, aroot)
        graft.store.Versioned.commitOverwrite(refreshed.centroids, croot)
        def probe(v: Long, phase: String) =
          graft.ml.Ivf.topK(graft.ml.Ivf.Index(
              graft.store.Versioned.read(s, aroot, v),
              graft.store.Versioned.read(s, croot, v)),
            queryVec(s, dir), 10, nprobe = 3)
            .select(lit(phase).as("phase"), col("vec_id"),
              Exact.micros(col("cos")).as("cos_micros"))
        probe(1, "1_pinned_old").unionByName(probe(2, "2_refreshed"))
          .orderBy("phase", "vec_id")
      },
      Some(s"""
        WITH cents AS MATERIALIZED (
          SELECT vec_id AS cluster, embedding AS cvec
          FROM embeddings WHERE vec_id < 8),
        q AS MATERIALIZED (
          SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        assigned AS MATERIALIZED (
          SELECT vec_id, embedding, cluster FROM (
            SELECT e.vec_id, e.embedding, c.cluster,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${sqDistSql("e.embedding", "c.cvec")},
                              c.cluster) AS rn
            FROM embeddings e CROSS JOIN cents c)
          WHERE rn = 1),
        probed AS MATERIALIZED (
          SELECT cluster FROM (
            SELECT c.cluster, ${sqDistSql("q.qv", "c.cvec")} AS d
            FROM cents c CROSS JOIN q
            ORDER BY d, cluster LIMIT 3)),
        ref_cents AS MATERIALIZED (
          SELECT cluster, list(m ORDER BY i) AS cvec FROM (
            SELECT cluster, i, avg(x) AS m FROM (
              SELECT cluster, generate_subscripts(embedding, 1) AS i,
                     CAST(unnest(embedding) AS DOUBLE) AS x
              FROM assigned)
            GROUP BY cluster, i)
          GROUP BY cluster),
        reassigned AS MATERIALIZED (
          SELECT vec_id, embedding, cluster FROM (
            SELECT e.vec_id, e.embedding, c.cluster,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${sqDistSql("e.embedding", "c.cvec")},
                              c.cluster) AS rn
            FROM embeddings e CROSS JOIN ref_cents c)
          WHERE rn = 1),
        probed2 AS MATERIALIZED (
          SELECT cluster FROM (
            SELECT c.cluster, ${sqDistSql("q.qv", "c.cvec")} AS d
            FROM ref_cents c CROSS JOIN q
            ORDER BY d, cluster LIMIT 3)),
        p1 AS (
          SELECT '1_pinned_old' AS phase, a.vec_id,
                 ${Exact.microsSql(cosSql("a.embedding", "q.qv"))}
                   AS cos_micros
          FROM assigned a JOIN probed USING (cluster) CROSS JOIN q
          ORDER BY ${cosSql("a.embedding", "q.qv")} DESC, a.vec_id
          LIMIT 10),
        p2 AS (
          SELECT '2_refreshed' AS phase, a.vec_id,
                 ${Exact.microsSql(cosSql("a.embedding", "q.qv"))}
                   AS cos_micros
          FROM reassigned a JOIN probed2 USING (cluster) CROSS JOIN q
          ORDER BY ${cosSql("a.embedding", "q.qv")} DESC, a.vec_id
          LIMIT 10)
        SELECT * FROM p1 UNION ALL SELECT * FROM p2""")),

    // Product quantization with asymmetric distance (q221): each 64-dim
    // vector is stored as 8 codeword ids (one per 8-dim subspace; the
    // codebooks here are the 16 seed vectors' subvectors, fixed so the
    // oracle can replay them — Lloyd-refined codebooks are PqSpec's
    // recall test). The probe never decodes: the query's distance to
    // every codeword is computed ONCE driver-side (an 8×16 table baked
    // into the plan as array literals), so scoring a row is 8 lookups +
    // adds in codegen and top-k is TakeOrderedAndProject. This is the
    // 32× memory-compression path that puts a billion-vector index in
    // RAM; the oracle replays encode (per-subspace argmin) and the ADC
    // chain exactly.
    QuerySpec("q221_pq_adc",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val m = 8; val subDim = 8
        val books = graft.ml.Pq.collectBooks(
          (0 until m).map { sub =>
            emb.filter(col("vec_id") < 16)
              .select(lit(sub).as("sub"), col("vec_id").as("cluster"),
                transform(graft.ml.Pq.subvector(col("embedding"), sub,
                  subDim), _.cast("double")).as("centroid"))
          }.reduce(_.unionByName(_)), m)
        val encoded = graft.ml.Pq.encode(emb, books, subDim)
        graft.ml.Pq.adcTopK(encoded, books, queryVec(s, dir), 10, subDim)
          .select(col("vec_id"), Exact.micros(col("adc")).as("adc_micros"))
      },
      Some {
        def sub(a: String, b: String, s: Int): String =
          (s * 8 + 1 to s * 8 + 8).map { i =>
            s"(CAST($a[$i] AS DOUBLE) - CAST($b[$i] AS DOUBLE)) * " +
              s"(CAST($a[$i] AS DOUBLE) - CAST($b[$i] AS DOUBLE))"
          }.mkString(" + ")
        val subs = 0 until 8
        s"""
        WITH cb AS MATERIALIZED (
          SELECT vec_id AS cluster, embedding AS cvec
          FROM embeddings WHERE vec_id < 16),
        q AS MATERIALIZED (
          SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        dists AS (
          SELECT e.vec_id, c.cluster,
                 ${subs.map(s => sub("e.embedding", "c.cvec", s) +
                     s" AS d$s").mkString(",\n                 ")}
          FROM embeddings e CROSS JOIN cb c),
        ranked AS (
          SELECT vec_id, cluster,
                 ${subs.map(s => "row_number() OVER (PARTITION BY " +
                     s"vec_id ORDER BY d$s, cluster) AS rn$s")
                   .mkString(",\n                 ")}
          FROM dists),
        codes AS (
          SELECT vec_id,
                 ${subs.map(s => s"max(CASE WHEN rn$s = 1 THEN " +
                     s"cluster END) AS c$s")
                   .mkString(",\n                 ")}
          FROM ranked GROUP BY vec_id),
        qd AS MATERIALIZED (
          SELECT c.cluster,
                 ${subs.map(s => sub("q.qv", "c.cvec", s) +
                     s" AS qd$s").mkString(",\n                 ")}
          FROM cb c CROSS JOIN q)
        SELECT codes.vec_id,
               ${Exact.microsSql(
                 subs.map(s => s"j$s.qd$s").mkString(" + "))} AS adc_micros
        FROM codes
        ${subs.map(s => s"JOIN qd j$s ON j$s.cluster = codes.c$s")
            .mkString("\n        ")}
        ORDER BY ${subs.map(s => s"j$s.qd$s").mkString(" + ")},
                 codes.vec_id
        LIMIT 10"""
      }),

    // IVF-PQ (q222): the production ANN composition — the coarse
    // quantizer (q41's fixed 8 centroids) prunes the corpus to the
    // nprobe=3 nearest clusters, and the survivors are scored by PQ
    // asymmetric distance (q221's 16-seed codebooks): ~3/8 of the
    // corpus touched, each survivor costing 8 codeword lookups instead
    // of 64-dim float math. The oracle chains both replays — coarse
    // assignment + probe, then encode + ADC over the pruned set only.
    QuerySpec("q222_ivfpq",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val m = 8; val subDim = 8
        val coarse = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cluster"),
            transform(col("embedding"), _.cast("double")).as("centroid"))
        val idx = graft.ml.Ivf.Index(
          graft.ml.Ivf.assign(emb, coarse), coarse)
        val books = graft.ml.Pq.collectBooks(
          (0 until m).map { sub =>
            emb.filter(col("vec_id") < 16)
              .select(lit(sub).as("sub"), col("vec_id").as("cluster"),
                transform(graft.ml.Pq.subvector(col("embedding"), sub,
                  subDim), _.cast("double")).as("centroid"))
          }.reduce(_.unionByName(_)), m)
        graft.ml.Pq.ivfPqTopK(idx, books, queryVec(s, dir), 10,
            nprobe = 3, subDim = subDim)
          .select(col("vec_id"), Exact.micros(col("adc")).as("adc_micros"))
      },
      Some {
        def sub(a: String, b: String, s: Int): String =
          (s * 8 + 1 to s * 8 + 8).map { i =>
            s"(CAST($a[$i] AS DOUBLE) - CAST($b[$i] AS DOUBLE)) * " +
              s"(CAST($a[$i] AS DOUBLE) - CAST($b[$i] AS DOUBLE))"
          }.mkString(" + ")
        val subs = 0 until 8
        s"""
        WITH coarse AS MATERIALIZED (
          SELECT vec_id AS cluster, embedding AS cvec
          FROM embeddings WHERE vec_id < 8),
        q AS MATERIALIZED (
          SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        probed AS MATERIALIZED (
          SELECT cluster FROM (
            SELECT c.cluster, ${sqDistSql("q.qv", "c.cvec")} AS d
            FROM coarse c CROSS JOIN q
            ORDER BY d, cluster LIMIT 3)),
        assigned AS MATERIALIZED (
          SELECT vec_id, embedding, cluster FROM (
            SELECT e.vec_id, e.embedding, c.cluster,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${sqDistSql("e.embedding", "c.cvec")},
                              c.cluster) AS rn
            FROM embeddings e CROSS JOIN coarse c)
          WHERE rn = 1),
        cand AS MATERIALIZED (
          SELECT a.vec_id, a.embedding
          FROM assigned a JOIN probed USING (cluster)),
        cb AS MATERIALIZED (
          SELECT vec_id AS cluster, embedding AS cvec
          FROM embeddings WHERE vec_id < 16),
        dists AS (
          SELECT e.vec_id, c.cluster,
                 ${subs.map(s => sub("e.embedding", "c.cvec", s) +
                     s" AS d$s").mkString(",\n                 ")}
          FROM cand e CROSS JOIN cb c),
        ranked AS (
          SELECT vec_id, cluster,
                 ${subs.map(s => "row_number() OVER (PARTITION BY " +
                     s"vec_id ORDER BY d$s, cluster) AS rn$s")
                   .mkString(",\n                 ")}
          FROM dists),
        codes AS (
          SELECT vec_id,
                 ${subs.map(s => s"max(CASE WHEN rn$s = 1 THEN " +
                     s"cluster END) AS c$s")
                   .mkString(",\n                 ")}
          FROM ranked GROUP BY vec_id),
        qd AS MATERIALIZED (
          SELECT c.cluster,
                 ${subs.map(s => sub("q.qv", "c.cvec", s) +
                     s" AS qd$s").mkString(",\n                 ")}
          FROM cb c CROSS JOIN q)
        SELECT codes.vec_id,
               ${Exact.microsSql(
                 subs.map(s => s"j$s.qd$s").mkString(" + "))} AS adc_micros
        FROM codes
        ${subs.map(s => s"JOIN qd j$s ON j$s.cluster = codes.c$s")
            .mkString("\n        ")}
        ORDER BY ${subs.map(s => s"j$s.qd$s").mkString(" + ")},
                 codes.vec_id
        LIMIT 10"""
      }),

    // Residual IVF-PQ (q238) — full IVFADC (Jégou 2011 §IV): q222's
    // composition, but PQ quantizes RESIDUALS (vector − coarse
    // centroid) instead of raw vectors — the accuracy-critical half
    // the raw variant omits (residuals concentrate near zero, so the
    // same codebook budget covers a far smaller cell). The query-side
    // table is now PER PROBED CLUSTER (q − c_i differs per cell); it
    // rides into codegen as one map-of-arrays literal per subspace and
    // scoring stays two lookups + an add per subspace. Codebooks =
    // residuals of seed vectors 16..31 (fixed, so the oracle replays
    // encode + ADC end-to-end: residual argmin per subspace, then the
    // cluster-keyed table chain).
    QuerySpec("q238_ivfpq_residual",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val m = 8; val subDim = 8
        val coarse = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cluster"),
            transform(col("embedding"), _.cast("double")).as("centroid"))
        val idx = graft.ml.Ivf.Index(
          graft.ml.Ivf.assign(emb, coarse), coarse)
        val seedRes = graft.ml.Pq.residuals(idx)
          .filter(col("vec_id") >= 16 && col("vec_id") < 32)
        val books = graft.ml.Pq.collectBooks(
          (0 until m).map { sub =>
            seedRes.select(lit(sub).as("sub"),
              col("vec_id").as("cluster"),
              graft.ml.Pq.subvector(col("res"), sub, subDim)
                .as("centroid"))
          }.reduce(_.unionByName(_)), m)
        graft.ml.Pq.ivfPqResidualTopK(idx, books, queryVec(s, dir), 10,
            nprobe = 3, subDim = subDim)
          .select(col("vec_id"), Exact.micros(col("adc")).as("adc_micros"))
      },
      Some {
        // ((a[i]−ac[i]) − (b[i]−bc[i]))² summed over subspace s — the
        // residual-space squared distance, parenthesized exactly as
        // the Spark side (residual first, then the difference)
        def resSub(a: String, ac: String, b: String, bc: String,
                   s: Int): String =
          (s * 8 + 1 to s * 8 + 8).map { i =>
            val d = s"((CAST($a[$i] AS DOUBLE) - CAST($ac[$i] AS DOUBLE))" +
              s" - (CAST($b[$i] AS DOUBLE) - CAST($bc[$i] AS DOUBLE)))"
            s"$d * $d"
          }.mkString(" + ")
        val subs = 0 until 8
        s"""
        WITH coarse AS MATERIALIZED (
          SELECT vec_id AS cluster, embedding AS cvec
          FROM embeddings WHERE vec_id < 8),
        q AS MATERIALIZED (
          SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        probed AS MATERIALIZED (
          SELECT cluster FROM (
            SELECT c.cluster, ${sqDistSql("q.qv", "c.cvec")} AS d
            FROM coarse c CROSS JOIN q
            ORDER BY d, cluster LIMIT 3)),
        assigned AS MATERIALIZED (
          SELECT vec_id, embedding, cluster FROM (
            SELECT e.vec_id, e.embedding, c.cluster,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${sqDistSql("e.embedding", "c.cvec")},
                              c.cluster) AS rn
            FROM embeddings e CROSS JOIN coarse c)
          WHERE rn = 1),
        cb AS MATERIALIZED (
          SELECT a.vec_id AS cluster, a.embedding AS svec,
                 co.cvec AS scent
          FROM assigned a JOIN coarse co USING (cluster)
          WHERE a.vec_id >= 16 AND a.vec_id < 32),
        cand AS MATERIALIZED (
          SELECT a.vec_id, a.embedding, a.cluster, co.cvec AS ccent
          FROM assigned a JOIN probed USING (cluster)
          JOIN coarse co ON co.cluster = a.cluster),
        dists AS (
          SELECT e.vec_id, e.cluster AS ecl, c.cluster,
                 ${subs.map(s =>
                     resSub("e.embedding", "e.ccent", "c.svec",
                       "c.scent", s) + s" AS d$s")
                   .mkString(",\n                 ")}
          FROM cand e CROSS JOIN cb c),
        ranked AS (
          SELECT vec_id, ecl, cluster,
                 ${subs.map(s => "row_number() OVER (PARTITION BY " +
                     s"vec_id ORDER BY d$s, cluster) AS rn$s")
                   .mkString(",\n                 ")}
          FROM dists),
        codes AS (
          SELECT vec_id, any_value(ecl) AS ecl,
                 ${subs.map(s => s"max(CASE WHEN rn$s = 1 THEN " +
                     s"cluster END) AS c$s")
                   .mkString(",\n                 ")}
          FROM ranked GROUP BY vec_id),
        qd AS MATERIALIZED (
          SELECT p.cluster AS pcluster, c.cluster,
                 ${subs.map(s =>
                     resSub("q.qv", "p.cvec", "c.svec", "c.scent", s) +
                       s" AS qd$s")
                   .mkString(",\n                 ")}
          FROM (SELECT co.cluster, co.cvec
                FROM coarse co JOIN probed USING (cluster)) p
          CROSS JOIN cb c CROSS JOIN q)
        SELECT codes.vec_id,
               ${Exact.microsSql(
                 subs.map(s => s"j$s.qd$s").mkString(" + "))} AS adc_micros
        FROM codes
        ${subs.map(s => s"JOIN qd j$s ON j$s.pcluster = codes.ecl " +
            s"AND j$s.cluster = codes.c$s").mkString("\n        ")}
        ORDER BY ${subs.map(s => s"j$s.qd$s").mkString(" + ")},
                 codes.vec_id
        LIMIT 10"""
      }),

    // Embedding-cosine near-dup detection, banded sign-LSH: the corpus
    // has no organic near-dups (max pairwise cos ≈ 0.51), so perturbed
    // copies are planted at vec_id+100000 (element 1 replaced by a
    // constant — no float arithmetic, exact cross-engine parity). A
    // 24-bit signature split into 4 bands of 6 bits generates candidates
    // (minhash-style: match ≥ 1 whole band), exact cosine ≥ 0.85
    // verifies. Band math at the planted cosines (~0.90): per-plane
    // collision ≈ 0.86, per-band 0.86^6 ≈ 0.39, ≥1-of-4 ≈ 0.86 recall.
    // The banded key is the scale shape: bucket count per band is
    // 2^bitsPerBand, so pick bitsPerBand ≈ log2(N/targetBucketSize) —
    // a 100 TB corpus widens each band to 16-20+ bits (and adds bands
    // to buy recall back), the join cost staying Σ bucket² ≈ N²/2^bits
    // per band.
    QuerySpec("q38_embedding_neardup",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val aug = emb.unionAll(emb.filter(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 100000).as("vec_id"),
            concat(array(lit(0.5f)),
              slice(col("embedding"), 2, Dim - 1)).as("embedding")))
        Similarity.nearPairs(aug, planes = 24, minCos = 0.85, bands = 4)
          .select(col("a"), col("b"), Exact.micros(col("cos")).as("cos_micros"))
          .orderBy("a", "b")
      },
      Some(s"""
        WITH aug AS MATERIALIZED (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 100000,
                 [CAST(0.5 AS FLOAT)] || embedding[2:$Dim]
          FROM embeddings WHERE vec_id % 20 = 0),
        ba AS MATERIALIZED (
          SELECT vec_id, embedding, ${bucketSql("embedding", 24)} AS bucket
          FROM aug),
        bb AS MATERIALIZED (
          SELECT vec_id, band,
                 (bucket >> CAST(band * 6 AS INT)) & 63 AS key
          FROM ba CROSS JOIN (SELECT unnest(range(0, 4)) AS band)),
        cand AS MATERIALIZED (
          SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
          FROM bb l JOIN bb r
            ON l.band = r.band AND l.key = r.key AND l.vec_id < r.vec_id)
        SELECT c.a, c.b,
               ${Exact.microsSql(cosSql("la.embedding", "rb.embedding"))}
                 AS cos_micros
        FROM cand c
        JOIN aug la ON la.vec_id = c.a
        JOIN aug rb ON rb.vec_id = c.b
        WHERE ${cosSql("la.embedding", "rb.embedding")} >= 0.85
        ORDER BY a, b""")),

    // ------------------------------------------------------------------
    // SemDedup (Abbas et al. 2023): coarse-quantize the embedding space
    // (the q41 fixed centroids — every arithmetic step an ordered fold),
    // then drop vectors with a smaller-id cluster-mate at cosine ≥ 0.85.
    // The planted q38-style copies are the semantic duplicates the prune
    // must catch; pairwise work is cluster-local on both engines.
    QuerySpec("q65_semdedup",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val aug = emb.unionAll(emb.filter(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 100000).as("vec_id"),
            concat(array(lit(0.5f)),
              slice(col("embedding"), 2, Dim - 1)).as("embedding")))
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cluster"),
            transform(col("embedding"), _.cast("double")).as("centroid"))
        graft.ml.SemDedup.prune(aug, cents, minCos = 0.85)
          .orderBy("vec_id")
      },
      Some(s"""
        WITH aug AS MATERIALIZED (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 100000,
                 [CAST(0.5 AS FLOAT)] || embedding[2:$Dim]
          FROM embeddings WHERE vec_id % 20 = 0),
        cents AS MATERIALIZED (
          SELECT vec_id AS cluster, embedding AS cvec
          FROM embeddings WHERE vec_id < 8),
        assigned AS MATERIALIZED (
          SELECT vec_id, embedding, cluster FROM (
            SELECT a.vec_id, a.embedding, c.cluster,
                   row_number() OVER (PARTITION BY a.vec_id
                     ORDER BY ${sqDistSql("a.embedding", "c.cvec")},
                              c.cluster) AS rn
            FROM aug a CROSS JOIN cents c)
          WHERE rn = 1),
        dropped AS MATERIALIZED (
          SELECT DISTINCT r.vec_id
          FROM assigned l JOIN assigned r
            ON l.cluster = r.cluster AND l.vec_id < r.vec_id
          WHERE ${cosSql("l.embedding", "r.embedding")} >= 0.85)
        SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS keep
        FROM assigned a LEFT JOIN dropped d USING (vec_id)
        ORDER BY a.vec_id""")),

    // ------------------------------------------------------------------
    // Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009):
    // BM25 lexical top-50 + embedding-cosine semantic top-50, fused as
    // Σ 1/(60 + rank) — no score calibration across the two systems.
    // Both rankings order by the micros-SNAPPED score (integers, so the
    // cross-engine rank order is exact, not ulp-fragile); each RRF term
    // is one IEEE division and their sum one add → micros-exact.
    QuerySpec("q69_hybrid_rrf",
      (s, dir) => {
        import graft.search.Search
        val bm = Search.bm25Scores(Tables.documents(s, dir),
            Seq("spark", "join", "window"))
          .select(col("doc_id"), Exact.micros(col("score")).as("m"))
        val qv = queryVec(s, dir)
        val cosScored = Tables.embeddings(s, dir)
          .select(col("vec_id").as("doc_id"),
            Exact.micros(Similarity.cosine(col("embedding"),
              array(qv.map(lit(_)): _*))).as("m"))
        // the two top-50 frames feed the fuse AND the rank projection —
        // page-sized, but persist keeps the corpus-sized scoring single-run
        val bmTop = Search.rankedTopN(bm, "m", 50)
          .select(col("doc_id"), col("rank")).persist()
        val cosTop = Search.rankedTopN(cosScored, "m", 50)
          .select(col("doc_id"), col("rank")).persist()
        Search.rrfFuse(Seq(bmTop, cosTop))
          .join(bmTop.select(col("doc_id"), col("rank").as("r_bm")),
            Seq("doc_id"), "left")
          .join(cosTop.select(col("doc_id"), col("rank").as("r_cos")),
            Seq("doc_id"), "left")
          .select(col("doc_id"), col("r_bm"), col("r_cos"),
            Exact.micros(col("rrf")).as("rrf_micros"))
          .orderBy(col("rrf_micros").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""
        WITH tok AS MATERIALIZED (
          SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(trim(text)), '\\s+'), x -> x <> ''))
            AS term
          FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        adl AS (SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  AS avgdl FROM dl),
        qt AS (SELECT doc_id, term FROM tok
               WHERE term IN ('spark', 'join', 'window')),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM qt GROUP BY 1, 2),
        dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM qt GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        bm AS MATERIALIZED (
          SELECT tf.doc_id,
                 ${Exact.microsSql(
                   "sum(ln((CAST(n.n AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5)" +
                   " / (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0)" +
                   " * (CAST(tf.tf AS DOUBLE) * (1.2 + 1))" +
                   " / (CAST(tf.tf AS DOUBLE) + 1.2 *" +
                   " (1.0 - 0.75 + 0.75 * (CAST(dl.dl AS DOUBLE) / adl.avgdl))))")}
                   AS m
          FROM tf
          JOIN dfreq USING (term)
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN n CROSS JOIN adl
          GROUP BY tf.doc_id),
        bmtop AS MATERIALIZED (
          SELECT doc_id, row_number() OVER (ORDER BY m DESC, doc_id) AS r_bm
          FROM bm ORDER BY m DESC, doc_id LIMIT 50),
        qv AS MATERIALIZED (
          SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        cosx AS MATERIALIZED (
          SELECT e.vec_id AS doc_id,
                 ${Exact.microsSql(cosSql("e.embedding", "q.qv"))} AS m
          FROM embeddings e CROSS JOIN qv q),
        costop AS MATERIALIZED (
          SELECT doc_id, row_number() OVER (ORDER BY m DESC, doc_id) AS r_cos
          FROM cosx ORDER BY m DESC, doc_id LIMIT 50),
        f AS (
          SELECT coalesce(b.doc_id, c.doc_id) AS doc_id, b.r_bm, c.r_cos,
                 coalesce(CAST(1.0 AS DOUBLE) /
                   (CAST(60 AS DOUBLE) + CAST(b.r_bm AS DOUBLE)),
                   CAST(0 AS DOUBLE)) +
                 coalesce(CAST(1.0 AS DOUBLE) /
                   (CAST(60 AS DOUBLE) + CAST(c.r_cos AS DOUBLE)),
                   CAST(0 AS DOUBLE)) AS rrf
          FROM bmtop b FULL OUTER JOIN costop c ON b.doc_id = c.doc_id)
        SELECT doc_id, CAST(r_bm AS INTEGER) AS r_bm,
               CAST(r_cos AS INTEGER) AS r_cos,
               ${Exact.microsSql("rrf")} AS rrf_micros
        FROM f ORDER BY rrf_micros DESC, doc_id LIMIT 20""")),

    // ------------------------------------------------------------------
    // int8 quantization round-trip (FAISS-style SQ8, per-vector scale):
    // scale + max reconstruction error per vector, all scan-stage column
    // math. floor(x+0.5) not round(): engines disagree on round's tie
    // rule. Max error must sit under scale/254 + fp noise (spec'd too).
    QuerySpec("q57_int8_quantize",
      (s, dir) => graft.ml.Quantize.roundtripStats(
          Tables.embeddings(s, dir))
        .orderBy("vec_id"),
      Some("""
        WITH sc AS (SELECT vec_id,
            list_max(list_transform(embedding,
              x -> abs(CAST(x AS DOUBLE)))) AS scale
          FROM embeddings),
        e AS (SELECT em.vec_id, sc.scale,
            list_max(list_transform(em.embedding, x ->
              abs(floor(CAST(x AS DOUBLE) * 127.0
                        / greatest(sc.scale, 1e-30) + 0.5)
                  * sc.scale / 127.0 - CAST(x AS DOUBLE)))) AS max_err
          FROM embeddings em JOIN sc USING (vec_id))
        SELECT vec_id,
          CAST(floor(scale * 1000000 + 0.5) AS BIGINT) AS scale_micros,
          CAST(floor(max_err * 1000000 + 0.5) AS BIGINT) AS max_err_micros
        FROM e ORDER BY vec_id""")),

    // ------------------------------------------------------------------
    // All-pairs sparse TF-IDF cosine (Bayardo-style df-capped candidate
    // generation): related-document pairs from the inverted index alone,
    // no embeddings. Hub terms (df > 64) stay in the norms but never
    // generate candidates — the stopword-pruning contract, mirrored in
    // the oracle. Per-term products micros-snap before integer sums.
    QuerySpec("q102_sparse_cosine",
      (s, dir) => {
        graft.ml.SparseSim.tfidfCosinePairs(
            Tables.documents(s, dir), maxDf = 64L, minCosMicros = 250000L)
          .select(col("id_a"), col("id_b"), col("shared_terms"),
            Exact.micros(col("cos")).as("cos_micros"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id AS id, unnest(list_filter(
            string_split_regex(lower(trim(text)), '\\s+'), x -> x <> ''))
            AS term
          FROM documents),
        tf AS (SELECT id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        w AS (SELECT tf.id, tf.term, dfreq.df,
                tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df) AS w
              FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        norms AS (
          SELECT id, sqrt(CAST(sum(${Exact.microsSql("w * w")}) AS DOUBLE)
                 / 1000000.0) AS norm
          FROM w GROUP BY id),
        probe AS (SELECT * FROM w WHERE df <= 64 AND df >= 2),
        dots AS (
          SELECT a.id AS id_a, b.id AS id_b,
                 count(*) AS shared_terms,
                 CAST(sum(${Exact.microsSql("a.w * b.w")}) AS BIGINT)
                   AS dot_micros
          FROM probe a JOIN probe b
            ON a.term = b.term AND a.id < b.id
          GROUP BY 1, 2)
        SELECT d.id_a, d.id_b, d.shared_terms,
               ${Exact.microsSql(
                 "(CAST(d.dot_micros AS DOUBLE) / 1000000.0)" +
                 " / (na.norm * nb.norm)")} AS cos_micros
        FROM dots d
        JOIN norms na ON na.id = d.id_a
        JOIN norms nb ON nb.id = d.id_b
        WHERE ${Exact.microsSql(
          "(CAST(d.dot_micros AS DOUBLE) / 1000000.0)" +
          " / (na.norm * nb.norm)")} >= 250000
        ORDER BY id_a, id_b""")),

    // Label-blocked exact cosine kNN graph (k=5) + reciprocal-NN pairs
    // — the mutual-neighbour edge set that graph-based dedup/clustering
    // builds on (mutuality filters hub asymmetry). Blocking = one
    // equi-join on the label, so candidates are Σ_b |b|², never
    // corpus²; ranking is on the µs-snapped cosine (integer order,
    // engine-exact), ties to the smaller neighbour id.
    QuerySpec("q140_knn_graph",
      (s, dir) => {
        graft.ml.Similarity.blockedKnnGraph(
            Tables.embeddings(s, dir), col("label"), k = 5)
          .orderBy("a", "b")
      },
      Some(s"""
        WITH p AS MATERIALIZED (
          SELECT a.vec_id AS a, b.vec_id AS b,
                 ${Exact.microsSql(cosSql("a.embedding", "b.embedding"))}
                   AS cos_micros
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id <> b.vec_id),
        r AS MATERIALIZED (
          SELECT a, b, cos_micros,
                 row_number() OVER (PARTITION BY a
                   ORDER BY cos_micros DESC, b) AS rn
          FROM p),
        knn AS MATERIALIZED (
          SELECT a, b, cos_micros FROM r WHERE rn <= 5)
        SELECT x.a, x.b, x.cos_micros
        FROM knn x JOIN knn y ON x.a = y.b AND x.b = y.a
        WHERE x.a < x.b
        ORDER BY x.a, x.b""")),

    // ------------------------------------------------------------------
    // The SQL surface end-to-end: the query text is pure spark.sql(...)
    // over a temp view, calling the REGISTERED native expression
    // (graft_dot — graft.functions.Registry) instead of the Column API.
    // Identical plan and codegen as q18's DataFrame route; the oracle
    // unrolls the same left-to-right dot product.
    QuerySpec("q158_sql_surface",
      (s, dir) => {
        graft.functions.Registry.register(s)
        Tables.embeddings(s, dir).createOrReplaceTempView("emb_sql158")
        s.sql("""
          WITH q AS (SELECT embedding AS qv FROM emb_sql158
                     WHERE vec_id = 0)
          SELECT e.vec_id,
                 CAST(floor(graft_dot(e.embedding, q.qv) * 1000000 + 0.5)
                   AS BIGINT) AS dot_micros
          FROM emb_sql158 e CROSS JOIN q
          WHERE e.vec_id <> 0
          ORDER BY dot_micros DESC, e.vec_id
          LIMIT 10""")
      },
      Some(s"""
        WITH q AS MATERIALIZED (
          SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, ${Exact.microsSql(dotSql("e.embedding", "q.qv"))}
                 AS dot_micros
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 0
        ORDER BY dot_micros DESC, e.vec_id
        LIMIT 10""")),

    // ------------------------------------------------------------------
    // Leading principal direction of the embedding corpus (uncentered
    // PCA) via Gram + power iteration — see [[graft.ml.Pca]] for the
    // data/model split (one d²-sized mapPartitions combine over the
    // corpus; the 64×64 eigen-iteration on the collected Gram). The
    // oracle rebuilds the SAME integer-exact Gram by brute double
    // explode (n·d² rows — affordable in DuckDB at sf0.01, which is
    // precisely what the Spark side's partition-local accumulation
    // avoids) and unrolls the four max-norm-rescaled iterations as
    // CTEs; `//` truncates like JVM long division, so every iterate
    // matches bit-for-bit.
    QuerySpec("q169_pca_direction",
      (s, dir) => graft.ml.Pca.leadingDirection(
          Tables.embeddings(s, dir)).orderBy("i"),
      Some {
        val iters = (1 to 4).map { t =>
          s"""w$t AS (
            SELECT g.i AS i, CAST(sum(g.g * v${t - 1}.v) AS BIGINT) AS w
            FROM g JOIN v${t - 1} ON g.j = v${t - 1}.i GROUP BY 1),
          m$t AS (SELECT max(abs(w)) AS m FROM w$t),
          v$t AS (SELECT i, (w * 1000) // m AS v FROM w$t, m$t)"""
        }.mkString(",\n")
        s"""
        WITH idx AS (SELECT range AS i FROM range(64)),
        xi AS (
          SELECT vec_id, idx.i AS i,
                 CAST(embedding[idx.i + 1] AS DOUBLE) AS x
          FROM embeddings, idx),
        g AS MATERIALIZED (
          SELECT a.i AS i, b.i AS j,
                 CAST(sum(CAST(floor(a.x * b.x * 1000000 + 0.5) AS BIGINT))
                   AS BIGINT) AS g
          FROM xi a JOIN xi b USING (vec_id) GROUP BY 1, 2),
        v0 AS (SELECT i, CAST(1000 AS BIGINT) AS v FROM idx),
        $iters
        SELECT i, CAST(v AS BIGINT) AS comp FROM v4 ORDER BY i"""
      }),

    // ------------------------------------------------------------------
    // Item-item collaborative filtering (co-occurrence cosine): parts
    // bought together in the same order, scored cos(u,v) =
    // |orders(u)∩orders(v)| / √(|orders(u)|·|orders(v)|), top-3
    // neighbours per target part. The pair generation is order-keyed
    // (never all-pairs across the catalogue); per-part order counts
    // ride back in as broadcasts; the per-target top-3 prunes with
    // WindowGroupLimit, not a global sort. √ on exact integers is one
    // IEEE op — identical in both engines — then snapped to micros.
    QuerySpec("q170_item_cf",
      (s, dir) => {
        val op = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val cnt = op.groupBy("p").agg(count(lit(1)).as("n"))
        val pairs = op.as("a").join(op.as("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("u"), col("b.p").as("v"))
          .agg(count(lit(1)).as("co"))
          .filter(col("co") >= 2)
        val sym = pairs.unionAll(
          pairs.select(col("v").as("u"), col("u").as("v"), col("co")))
        val scored = sym
          .join(broadcast(cnt.select(col("p").as("u"), col("n").as("nu"))),
            Seq("u"))
          .join(broadcast(cnt.select(col("p").as("v"), col("n").as("nv"))),
            Seq("v"))
          .select(col("u"), col("v"), col("co"),
            Exact.micros(col("co").cast("double") /
              sqrt((col("nu") * col("nv")).cast("double")))
              .as("cos_micros"))
        import org.apache.spark.sql.expressions.Window
        scored
          .withColumn("rk", row_number().over(Window.partitionBy("u")
            .orderBy(col("cos_micros").desc, col("v"))))
          .filter(col("rk") <= 3 && col("u") % 10 === 0)
          .select(col("u"), col("rk").cast("long").as("rk"), col("v"),
            col("co"), col("cos_micros"))
          .orderBy("u", "rk")
      },
      Some(s"""
        WITH op AS MATERIALIZED (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        cnt AS (SELECT p, count(*) AS n FROM op GROUP BY 1),
        pairs AS (
          SELECT a.p AS u, b.p AS v, count(*) AS co
          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2 HAVING count(*) >= 2),
        sym AS (SELECT u, v, co FROM pairs
                UNION ALL SELECT v AS u, u AS v, co FROM pairs),
        scored AS (
          SELECT u, v, CAST(co AS BIGINT) AS co,
                 ${Exact.microsSql("CAST(co AS DOUBLE) / " +
                   "sqrt(CAST(cu.n * cv.n AS DOUBLE))")} AS cos_micros
          FROM sym
          JOIN cnt cu ON sym.u = cu.p
          JOIN cnt cv ON sym.v = cv.p),
        ranked AS (
          SELECT u, v, co, cos_micros,
                 row_number() OVER (PARTITION BY u
                   ORDER BY cos_micros DESC, v) AS rk
          FROM scored)
        SELECT u, CAST(rk AS BIGINT) AS rk, v, co, cos_micros
        FROM ranked WHERE rk <= 3 AND u % 10 = 0
        ORDER BY u, rk""")),

    // ------------------------------------------------------------------
    // Clustering agreement — Adjusted Rand Index (Hubert & Arabie 1985)
    // between two labelings of the document corpus (lang vs source):
    // the pair-counting metric every clustering-eval harness ships.
    // Entirely integer until the last division: the contingency table
    // is one (lang, source) hash-agg, the three Σ C(n,2) terms are
    // integer sums over its margins, and only the final ARI ratio
    // touches floats (then snaps to micros). At 100 TB the contingency
    // table is |labels₁|·|labels₂| rows — metric-sized, not data-sized.
    QuerySpec("q177_cluster_ari",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val cells = docs.groupBy("lang", "source")
          .agg(count(lit(1)).as("nij"))
        // n·(n−1) is even and nonnegative, so halving via shiftright is
        // the exact integer `// 2` of the oracle — and it stays on
        // LongType end-to-end (Column./ promotes to double first, which
        // loses exactness once n·(n−1) exceeds 2^53).
        val c2 = (c: org.apache.spark.sql.Column) =>
          shiftright(c * (c - lit(1L)), 1)
        val sij = cells.agg(sum(c2(col("nij"))).as("sij"))
        val sa = cells.groupBy("lang").agg(sum("nij").as("a"))
          .agg(sum(c2(col("a"))).as("sa"))
        val sb = cells.groupBy("source").agg(sum("nij").as("b"))
          .agg(sum(c2(col("b"))).as("sb"))
        val n = docs.agg(count(lit(1)).as("n"))
        sij.crossJoin(sa).crossJoin(sb).crossJoin(n)
          .select(col("n"), col("sij"), col("sa"), col("sb"),
            Exact.micros(
              (col("sij").cast("double") -
                col("sa").cast("double") * col("sb").cast("double") /
                  c2(col("n")).cast("double")) /
              ((col("sa").cast("double") + col("sb").cast("double")) / 2d -
                col("sa").cast("double") * col("sb").cast("double") /
                  c2(col("n")).cast("double"))).as("ari_micros"))
      },
      Some(s"""
        WITH cells AS (
          SELECT lang, source, count(*) AS nij
          FROM documents GROUP BY 1, 2),
        sij AS (SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS sij
                FROM cells),
        sa AS (SELECT CAST(sum(a * (a - 1) // 2) AS BIGINT) AS sa FROM
               (SELECT sum(nij) AS a FROM cells GROUP BY lang)),
        sb AS (SELECT CAST(sum(b * (b - 1) // 2) AS BIGINT) AS sb FROM
               (SELECT sum(nij) AS b FROM cells GROUP BY source)),
        n AS (SELECT count(*) AS n FROM documents)
        SELECT n, sij, sa, sb,
          ${Exact.microsSql(
            "(CAST(sij AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)" +
              " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2)) / " +
            "((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) / 2 - " +
              "CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)" +
              " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2))")}
          AS ari_micros
        FROM sij, sa, sb, n""")),

    // ------------------------------------------------------------------
    // Matryoshka truncation audit (Kusupati et al. 2022, "Matryoshka
    // representation learning"): how much cosine geometry survives
    // keeping only the first d dimensions — cos(v, v[1..d] zero-padded)
    // collapses to ‖v[1..d]‖/‖v‖, so the whole audit is ONE scan
    // computing four prefix-norm ratios per row (micros-snapped), one
    // aggregate, and a 4-row unpivot. The decision table for "can we
    // store/serve 8× smaller vectors" — at 100 TB of embeddings that
    // is the storage bill.
    QuerySpec("q198_matryoshka",
      (s, dir) => {
        val dims = Seq(8, 16, 32)
        val v = col("embedding")
        def normSq(c: org.apache.spark.sql.Column) =
          graft.functions.VecFunctions.dotFF(c, c)
        val perRow = Tables.embeddings(s, dir).select(
          dims.map { d =>
            Exact.micros(sqrt(normSq(slice(v, 1, d))) / sqrt(normSq(v)))
              .as(s"m$d")
          }: _*)
        val agg = perRow.agg(
          count(lit(1)).as("n"),
          dims.flatMap(d => Seq(
            sum(col(s"m$d")).as(s"sum$d"),
            min(col(s"m$d")).as(s"min$d"))): _*)
        agg.select(expr(
          "stack(3, " + dims.map(d =>
            s"$d, CAST(sum$d div n AS BIGINT), min$d").mkString(", ") +
            ") AS (dim, mean_cos_micros, min_cos_micros)"))
          .orderBy("dim")
      },
      Some {
        def chain(d: Int, a: String) = (1 to d)
          .map(i => s"CAST($a[$i] AS DOUBLE) * CAST($a[$i] AS DOUBLE)")
          .mkString(" + ")
        val rows = Seq(8, 16, 32).map { d =>
          s"""SELECT $d AS dim,
             CAST(sum(m) // count(*) AS BIGINT) AS mean_cos_micros,
             min(m) AS min_cos_micros
           FROM (SELECT ${Exact.microsSql(
              s"sqrt(${chain(d, "embedding")}) / " +
                s"sqrt(${chain(Dim, "embedding")})")} AS m
                 FROM embeddings)"""
        }.mkString("\nUNION ALL\n")
        s"$rows\nORDER BY dim"
      }),

    // ------------------------------------------------------------------
    // Trainable quality classifier: full-batch GD logistic regression
    // over micro fixed-point document features (length, en-marker
    // ratio, mean token length) predicting lang='en'. Three unrolled
    // iterations; gradients are exact integer sums, so the oracle
    // replays the whole descent as a CTE chain. One collected row per
    // iteration (inherently sequential, cf. BPE).
    QuerySpec("q225_logreg_quality",
      (s, dir) => {
        val f = logRegFeatures(s, dir)
        val w = graft.ml.LogReg.fit(f, Seq("x1", "x2", "x3"), "y",
          iters = 3, lr = 0.5)
        f.select(col("doc_id"), col("y"),
            graft.ml.LogReg.probMicros(w, Seq("x1", "x2", "x3"))
              .as("p_micros"))
          .orderBy("doc_id")
      },
      Some(logRegOracleSql(iters = 3))),

    // ------------------------------------------------------------------
    // Classifier evaluation: exact tie-corrected ROC-AUC per source
    // (Mann-Whitney rank-sum — never materializes the pos×neg pair
    // space). Score = n_chars, label = lang='en'.
    // ------------------------------------------------------------------
    // ROUGE-2 overlap between paired documents (Lin 2004): candidate =
    // doc d, reference = doc (d+250) mod 500-ish via a half-rotation
    // join — the eval-suite metric for summarization/caption quality
    // and eval-set leakage audits. Clipped counts are exact integers;
    // P/R/Dice are one snapped divide each. Work is two (pair, gram)
    // hash-aggs + a pair-local full-outer gram join — never
    // corpus-quadratic.
    QuerySpec("q245_rouge_overlap",
      (s, dir) => {
        val d = Tables.documents(s, dir).select("doc_id", "text")
        val nDocs = 500L // pinned by TablesSpec for sf0.01
        val pairs = d.select(col("doc_id").as("pair_id"),
            col("text").as("cand"),
            pmod(col("doc_id") + lit(nDocs / 2), lit(nDocs)).as("rid"))
          .join(d.select(col("doc_id").as("rid"),
            col("text").as("ref")), "rid")
          .drop("rid")
        graft.ml.Eval.rougeN(pairs, n = 2).orderBy("pair_id")
      },
      Some(s"""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)),
                       '\\s+'), x -> x <> '') AS l
                   FROM documents),
        g AS (SELECT doc_id,
                unnest(CASE WHEN len(l) >= 2 THEN list_transform(
                  generate_series(1, len(l) - 1),
                  i -> l[i] || ' ' || l[i+1]) ELSE [] END) AS g
              FROM d),
        c AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
              FROM g GROUP BY 1, 2),
        pairs AS (SELECT doc_id AS pair_id, (doc_id + 250) % 500 AS rid
                  FROM d),
        cand AS (SELECT p.pair_id, c.g, c.c AS cc
                 FROM pairs p JOIN c ON c.doc_id = p.pair_id),
        refc AS (SELECT p.pair_id, c.g, c.c AS rc
                 FROM pairs p JOIN c ON c.doc_id = p.rid),
        u AS (SELECT pair_id, g, cc, rc
              FROM cand FULL JOIN refc USING (pair_id, g)),
        agg AS (SELECT pair_id,
                  CAST(sum(least(coalesce(cc, 0), coalesce(rc, 0)))
                    AS BIGINT) AS clip,
                  CAST(sum(coalesce(cc, 0)) AS BIGINT) AS cand_grams,
                  CAST(sum(coalesce(rc, 0)) AS BIGINT) AS ref_grams
                FROM u GROUP BY 1),
        j AS (SELECT p.pair_id, coalesce(clip, 0) AS clip,
                coalesce(cand_grams, 0) AS cand_grams,
                coalesce(ref_grams, 0) AS ref_grams
              FROM pairs p LEFT JOIN agg USING (pair_id))
        SELECT pair_id, clip, cand_grams, ref_grams,
          CASE WHEN cand_grams > 0 THEN ${Exact.microsSql(
            "CAST(clip AS DOUBLE) / CAST(cand_grams AS DOUBLE)")}
            ELSE 0 END AS p_micros,
          CASE WHEN ref_grams > 0 THEN ${Exact.microsSql(
            "CAST(clip AS DOUBLE) / CAST(ref_grams AS DOUBLE)")}
            ELSE 0 END AS r_micros,
          CASE WHEN cand_grams + ref_grams > 0 THEN ${Exact.microsSql(
            "CAST(2 * clip AS DOUBLE) / " +
              "CAST(cand_grams + ref_grams AS DOUBLE)")}
            ELSE 0 END AS f_micros
        FROM j ORDER BY pair_id""")),

    QuerySpec("q226_auc",
      (s, dir) => {
        graft.ml.Eval.groupedAuc(
            Tables.documents(s, dir)
              .select(col("source"), col("n_chars").as("score"),
                (col("lang") === "en").cast("long").as("y")),
            "source", "score", "y")
          .orderBy("source")
      },
      Some(s"""
        WITH d AS (
          SELECT source, n_chars AS score,
                 CAST(lang = 'en' AS BIGINT) AS y
          FROM documents),
        r AS (
          SELECT source, y,
                 2 * rank() OVER (PARTITION BY source ORDER BY score)
                   + count(*) OVER (PARTITION BY source, score) - 1 AS r2
          FROM d),
        a AS (
          SELECT source,
                 CAST(sum(CASE WHEN y = 1 THEN r2 ELSE 0 END) AS BIGINT)
                   AS s2,
                 CAST(sum(y) AS BIGINT) AS npos,
                 CAST(count(*) - sum(y) AS BIGINT) AS nneg
          FROM r GROUP BY source)
        SELECT source, ${Exact.microsSql(
          "CAST(s2 - npos * (npos + 1) AS DOUBLE) / " +
          "(2.0 * CAST(npos * nneg AS DOUBLE))")} AS auc_micros
        FROM a WHERE npos > 0 AND nneg > 0
        ORDER BY source""")),

    // ------------------------------------------------------------------
    // MMR diversity re-rank (Carbonell & Goldstein 1998) of the
    // brute-force top-20 ANN page: greedy k=5 at λ=0.7, every score in
    // exact integer micros (λ as an integer weight), min-id ties. The
    // corpus-scale work (candidate probe, pairwise page sims) stays in
    // plans; the greedy loop runs on the collected page — page-sized by
    // construction, like Search.paginate.
    QuerySpec("q227_mmr_diverse",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val cands = Similarity.bruteForceTopK(emb, queryVec(s, dir), 20)
          .join(emb.select("vec_id", "embedding"), "vec_id")
          .select(col("vec_id"), Exact.micros(col("cos")).as("rel_micros"),
            col("embedding"))
        graft.ml.Mmr.select(s, cands, k = 5, lambdaMicros = 700000L)
          .orderBy("step")
      },
      Some(mmrOracleSql(n = 20, k = 5, lam = 700000L))),

    // ------------------------------------------------------------------
    // Calibration (reliability) table of the q225 classifier: fixed-
    // width probability bins (p div 10000) → count, exact Σp, observed
    // positives — the "is a 0.46 really a 0.46" readout that pairs with
    // q226's ranking AUC. Fixed bins, not ntile: a pure hash-agg with
    // no rank window, so the readout is one map-side-combinable pass at
    // any corpus size.
    QuerySpec("q229_calibration",
      (s, dir) => {
        val f = logRegFeatures(s, dir)
        val w = graft.ml.LogReg.fit(f, Seq("x1", "x2", "x3"), "y",
          iters = 3, lr = 0.5)
        f.select(col("y"),
            graft.ml.LogReg.probMicros(w, Seq("x1", "x2", "x3")).as("p"))
          .groupBy(expr("p div 10000").as("bin"))
          .agg(count(lit(1)).as("n"), sum(col("p")).as("sum_p_micros"),
            sum(col("y")).as("n_pos"))
          .orderBy("bin")
      },
      Some(s"""${logRegChainSql(iters = 3)},
        scored AS (
          SELECT f.y, ${logRegPExpr("w3t")} AS p
          FROM f CROSS JOIN w3t)
        SELECT p // 10000 AS bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(p) AS BIGINT) AS sum_p_micros,
               CAST(sum(y) AS BIGINT) AS n_pos
        FROM scored GROUP BY 1 ORDER BY 1""")),

    // ------------------------------------------------------------------
    // ANN recall@10 harness: 10 queries probe the IVF index in ONE
    // batched plan (Ivf.topKBatch — per-query WindowGroupLimit top-k,
    // corpus rows scored only for queries probing their cluster) and
    // are scored against batched brute-force ground truth. hits ≥ 1
    // always (a corpus query finds itself), so the per-query census is
    // total. The recall readout every ANN deployment publishes.
    QuerySpec("q232_ann_recall",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cluster"),
            transform(col("embedding"), _.cast("double")).as("centroid"))
        val idx = graft.ml.Ivf.Index(
          graft.ml.Ivf.assign(emb, cents), cents)
        val queries = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val approx = graft.ml.Ivf.topKBatch(idx, queries, k = 10,
          nprobe = 2)
        val wTop = Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("vec_id"))
        val exact = emb.crossJoin(broadcast(queries))
          .select(col("qid"), col("vec_id"),
            Similarity.cosine(col("embedding"), col("qv")).as("cos"))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 10)
        exact.select("qid", "vec_id")
          .join(approx.select("qid", "vec_id"), Seq("qid", "vec_id"),
            "left_semi")
          .groupBy("qid").agg(count(lit(1)).as("hits"))
          .orderBy("qid")
      },
      Some(s"""
        WITH qs AS MATERIALIZED (
          SELECT vec_id AS qid, embedding AS qv
          FROM embeddings WHERE vec_id < 10),
        cents AS MATERIALIZED (
          SELECT vec_id AS cluster, embedding AS cvec
          FROM embeddings WHERE vec_id < 8),
        probed AS MATERIALIZED (
          SELECT qid, qv, cluster FROM (
            SELECT q.qid, q.qv, c.cluster,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY ${sqDistSql("q.qv", "c.cvec")},
                              c.cluster) AS rn
            FROM qs q CROSS JOIN cents c)
          WHERE rn <= 2),
        assigned AS MATERIALIZED (
          SELECT vec_id, embedding, cluster FROM (
            SELECT e.vec_id, e.embedding, c.cluster,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${sqDistSql("e.embedding", "c.cvec")},
                              c.cluster) AS rn
            FROM embeddings e CROSS JOIN cents c)
          WHERE rn = 1),
        approx AS MATERIALIZED (
          SELECT qid, vec_id FROM (
            SELECT p.qid, a.vec_id,
                   row_number() OVER (PARTITION BY p.qid
                     ORDER BY ${cosSql("a.embedding", "p.qv")} DESC,
                              a.vec_id) AS rn
            FROM assigned a JOIN probed p USING (cluster))
          WHERE rn <= 10),
        exact AS MATERIALIZED (
          SELECT qid, vec_id FROM (
            SELECT q.qid, e.vec_id,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY ${cosSql("e.embedding", "q.qv")} DESC,
                              e.vec_id) AS rn
            FROM embeddings e CROSS JOIN qs q)
          WHERE rn <= 10)
        SELECT x.qid, CAST(count(*) AS BIGINT) AS hits
        FROM exact x JOIN approx USING (qid, vec_id)
        GROUP BY 1 ORDER BY 1"""))
  )

  /** Integer-micros document features for q225: x1 = tokens/50,
    * x2 = en-marker ratio, x3 = mean token length / 10. */
  private def logRegFeatures(s: org.apache.spark.sql.SparkSession,
                             dir: String) =
    graft.ml.LogReg.docFeatures(Tables.documents(s, dir))

  /** Unrolled GD chain: w(i) CTEs over the feature frame, replaying
    * LogReg.fit's integer-gradient updates exactly. */
  private def logRegOracleSql(iters: Int): String =
    s"""${logRegChainSql(iters)}
      SELECT f.doc_id, f.y, ${logRegPExpr(s"w${iters}t")} AS p_micros
      FROM f CROSS JOIN w${iters}t
      ORDER BY f.doc_id"""

  private def logRegPExpr(w: String): String =
    s"CAST(floor(1.0 / (1.0 + exp(-(CAST($w.w0 * 1000000 + " +
      s"$w.wa * x1 + $w.wb * x2 + $w.wc * x3 AS DOUBLE) / 1e12))) " +
      "* 1000000 + 0.5) AS BIGINT)"

  /** The WITH-prefix of the GD replay (features, n, w0t..w{iters}t). */
  private def logRegChainSql(iters: Int): String = {
    def pExpr(w: String): String = logRegPExpr(w)
    val enList = graft.text.TextStats.LangMarkers.head._2
      .map(w => s"'$w'").mkString(", ")
    val steps = (1 to iters).map { i =>
      val pw = s"w${i - 1}t"
      s"""g$i AS (SELECT
          CAST(sum((p - y * 1000000) * 1000000) AS BIGINT) AS g0,
          CAST(sum((p - y * 1000000) * x1) AS BIGINT) AS ga,
          CAST(sum((p - y * 1000000) * x2) AS BIGINT) AS gb,
          CAST(sum((p - y * 1000000) * x3) AS BIGINT) AS gc
        FROM (SELECT f.*, ${pExpr(pw)} AS p FROM f CROSS JOIN $pw)),
      w${i}t AS (SELECT
          w.w0 - CAST(floor(0.5 * CAST(g.g0 AS DOUBLE) /
            (nn.n * 1000000.0) + 0.5) AS BIGINT) AS w0,
          w.wa - CAST(floor(0.5 * CAST(g.ga AS DOUBLE) /
            (nn.n * 1000000.0) + 0.5) AS BIGINT) AS wa,
          w.wb - CAST(floor(0.5 * CAST(g.gb AS DOUBLE) /
            (nn.n * 1000000.0) + 0.5) AS BIGINT) AS wb,
          w.wc - CAST(floor(0.5 * CAST(g.gc AS DOUBLE) /
            (nn.n * 1000000.0) + 0.5) AS BIGINT) AS wc
        FROM $pw w CROSS JOIN g$i g CROSS JOIN nn)"""
    }.mkString(",\n")
    s"""
      WITH lt AS (SELECT doc_id, lang,
          list_filter(string_split_regex(lower(trim(text)), '\\s+'),
            x -> x <> '') AS l
        FROM documents),
      f AS MATERIALIZED (
        SELECT doc_id, CAST(lang = 'en' AS BIGINT) AS y,
          ${Exact.microsSql("CAST(len(l) AS DOUBLE) / 50.0")} AS x1,
          ${Exact.microsSql(
            s"CAST(len(list_filter(l, x -> list_contains([$enList], x))) " +
            "AS DOUBLE) / CAST(greatest(len(l), 1) AS DOUBLE)")} AS x2,
          ${Exact.microsSql(
            "CAST(coalesce(list_sum(list_transform(l, x -> length(x))), 0) " +
            "AS DOUBLE) / (CAST(greatest(len(l), 1) AS DOUBLE) * 10.0)")}
            AS x3
        FROM lt),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
      w0t AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS wa,
                     CAST(0 AS BIGINT) AS wb, CAST(0 AS BIGINT) AS wc),
      $steps"""
  }

  /** Unrolled MMR greedy chain over the top-`n` candidate page. */
  private def mmrOracleSql(n: Int, k: Int, lam: Long): String = {
    val muLam = 1000000L - lam
    def selAll(i: Int): String =
      (1 to i).map(j => s"SELECT vec_id FROM sel$j").mkString(" UNION ALL ")
    val steps = (2 to k).map { i =>
      s"""sel$i AS MATERIALIZED (
        SELECT c.vec_id, $lam * c.rel - $muLam * max(s.sim) AS sc
        FROM cand c JOIN sims s ON s.va = c.vec_id
        WHERE s.vb IN (${selAll(i - 1)})
          AND c.vec_id NOT IN (${selAll(i - 1)})
        GROUP BY c.vec_id, c.rel
        ORDER BY sc DESC, c.vec_id LIMIT 1)"""
    }.mkString(",\n")
    val out = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS step, vec_id, sc AS mmr_p12 " +
        s"FROM sel$i").mkString(" UNION ALL ")
    s"""
      WITH q AS MATERIALIZED (
        SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      cand AS MATERIALIZED (
        SELECT e.vec_id,
               ${Exact.microsSql(cosSql("e.embedding", "q.qv"))} AS rel,
               e.embedding
        FROM embeddings e CROSS JOIN q
        ORDER BY ${cosSql("e.embedding", "q.qv")} DESC, e.vec_id
        LIMIT $n),
      sims AS MATERIALIZED (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               ${Exact.microsSql(cosSql("a.embedding", "b.embedding"))}
                 AS sim
        FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
      sel1 AS MATERIALIZED (
        SELECT vec_id, $lam * rel AS sc FROM cand
        ORDER BY rel DESC, vec_id LIMIT 1),
      $steps
      SELECT * FROM ($out) ORDER BY step"""
  }
}
