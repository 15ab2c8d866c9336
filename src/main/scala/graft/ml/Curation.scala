package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.store.Versioned
import graft.text.Quality

/** The end-to-end data-curation pipeline as ONE versioned lineage:
  * every stage reads its input FROM the versioned store and commits its
  * output back as the next version, so "the corpus the model trained on"
  * is a version number — pin it and the exact training set is
  * reproducible forever, vacuum-able once retention passes, and every
  * intermediate (what the gopher gate dropped, what the quality gate
  * scored, what the mixer allocated) is itself a pinned, reviewable
  * version. This is the composition of the standalone curation
  * operators (q223–q234) into the lakehouse-lineage shape production
  * pipelines actually run:
  *
  *   v1 raw snapshot
  *   v2 Gopher rule gate              (Rae et al. 2021 §A1.1)
  *   v3 scores: GD logreg p + DSIR w  (CCNet-style; Xie et al. 2023)
  *   v4 quality gate, top keepFrac    (calibration table → QA sidecar)
  *   v5 temperature-flattened mix     (Raffel et al. 2020 §3.4.3)
  *   v6 semantic near-dup prune       (Abbas et al. 2023 SemDeDup;
  *                                     MMR showcase page → QA sidecar)
  *   v7 training shuffle + split      ("the corpus version k")
  *
  * Each commit is an overwrite stamped with the ("curation", stage)
  * fingerprint txn, so the lineage is self-describing in the manifest
  * history. A re-run appends a NEW v8..v14 generation; pinned reads of
  * the old generation are untouched (the q216 pinned-probe property).
  *
  * Scale shape: every stage is the already-plan-audited operator it
  * composes — the store adds one parquet write/read boundary per stage
  * (what a multi-job production pipeline pays anyway, and what makes
  * each stage independently restartable). The only driver-side
  * materializations are the model weights (a handful of longs), the
  * per-stage row counts for the lineage record, and the page-sized MMR
  * showcase.
  */
object Curation {

  /** One committed stage of the lineage. */
  final case class StageCommit(stage: Long, name: String, version: Long,
                               rows: Long)

  private def hashRank(stratum: Column, key: Column): Column =
    row_number().over(Window.partitionBy(stratum)
      .orderBy(xxhash64(concat_ws("|", lit("curation"), key)), key))

  /** Run the lineage over `dir`'s documents+embeddings into the
    * versioned store at `root` (QA artifacts — calibration table, MMR
    * showcase — go to `root + "_qa"`). Returns one [[StageCommit]] per
    * stage; the last one is the training corpus version. */
  def lineage(spark: SparkSession, dir: String, root: String,
              keepFrac: Double = 0.5, budget: Long = 120L,
              tau: Double = 0.5, dedupClusters: Int = 8,
              dedupMinCos: Double = 0.99, showcaseK: Int = 5)
      : Seq[StageCommit] = {
    val qaRoot = root + "_qa"
    val commits = scala.collection.mutable.ArrayBuffer[StageCommit]()
    def commit(name: String, df: DataFrame): DataFrame = {
      val stage = commits.size + 1L
      val v = Versioned.commitOverwrite(df, root,
        txn = Some(("curation", stage)))
      val out = Versioned.read(spark, root, version = v)
      commits += StageCommit(stage, name, v, out.count())
      out
    }

    // v1: the raw snapshot — curation starts from a pinned corpus, not
    // a live directory, so the whole lineage is re-derivable
    val raw = commit("raw",
      graft.Tables.documents(spark, dir)
        .select("doc_id", "source", "lang", "text"))

    // v2: Gopher gate — quality rules AND repetition rules, both
    // conjunctive (the flags themselves are reviewable via q223/q241
    // on the pinned v1)
    val gated = commit("gopher_gate",
      raw.join(Quality.gopherRules(raw).filter(col("keep") === 1)
          .select("doc_id"), "doc_id")
        .join(Quality.repetitionRules(raw).filter(col("keep") === 1)
          .select("doc_id"), "doc_id"))

    // v3: score — train the GD logreg quality classifier ON the gated
    // corpus read back from the store (the model's provenance is v2),
    // and attach the DSIR target-likeness weight
    val feats = LogReg.docFeatures(gated)
    val w = LogReg.fit(feats, Seq("x1", "x2", "x3"), "y",
      iters = 3, lr = 0.5)
    val scored = commit("scored",
      gated.join(
        feats.select(col("doc_id"),
          LogReg.probMicros(w, Seq("x1", "x2", "x3")).as("p_micros")),
        "doc_id")
        .join(Dsir.importanceWeights(gated, col("lang") === "en"),
          "doc_id"))

    // QA sidecar: the calibration table of the scorer over v3 — the
    // "is a 0.46 really a 0.46" readout reviewers check before trusting
    // the v4 gate
    Versioned.commitOverwrite(
      scored.groupBy(expr("p_micros div 10000").as("bin"))
        .agg(count(lit(1)).as("n"), sum("p_micros").as("sum_p_micros")),
      qaRoot + "/calibration",
      txn = Some(("curation_calibration", commits.last.version)))

    // v4: quality gate — keep the top `keepFrac` slice by classifier
    // probability (quantile, not an absolute score: a 3-iteration
    // linear model's probabilities are RANKING signal; q229's
    // calibration table is exactly the check of their absolute level).
    // The threshold is exact via a value histogram: p_micros has at
    // most 1e6+1 distinct values, so the cum-count window runs over a
    // domain-bounded frame regardless of corpus size.
    val target = math.max(1L,
      (commits.last.rows * keepFrac).toLong)
    val thr = scored.groupBy("p_micros").agg(count(lit(1)).as("c"))
      .withColumn("cum",
        sum("c").over(Window.orderBy(col("p_micros").desc)))
      .filter(col("cum") >= target)
      .agg(max("p_micros")).head().getLong(0)
    val kept = commit("quality_gate",
      scored.filter(col("p_micros") >= thr))

    // v5: temperature-flattened mixing — Hamilton-apportion the budget
    // across sources at τ, then take each stratum's hash-smallest
    // min(alloc, n) rows (cap at availability: the store holds each row
    // once; epoch repetition is the trainer's loop, not the corpus's)
    val alloc = Sampling.temperatureAllocation(kept, col("source"),
      budget, tau)
    val mixed = commit("temperature_mix",
      kept.withColumn("mix_rank", hashRank(col("source"), col("doc_id")))
        .join(broadcast(alloc.select(col("stratum"), col("alloc"))),
          col("source") === col("stratum"))
        .filter(col("mix_rank") <= col("alloc"))
        .drop("stratum", "alloc", "mix_rank"))

    // v6: semantic near-dup prune (cluster-local pairwise only), keyed
    // by doc_id = vec_id; docs without an embedding pass through (no
    // evidence of duplication)
    val emb = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val centroids = Ivf.build(emb, k = dedupClusters, iters = 2).centroids
    val dropped = SemDedup.prune(
        emb.join(mixed.select(col("doc_id").as("vec_id")), "vec_id"),
        centroids, dedupMinCos)
      .filter(!col("keep")).select(col("vec_id").as("doc_id"))
    val deduped = commit("semantic_dedup",
      mixed.join(dropped.withColumn("hit", lit(true)), Seq("doc_id"),
          "left")
        .filter(col("hit").isNull).drop("hit"))

    // QA sidecar: an MMR-diversified showcase page of the surviving
    // corpus (top quality page, re-ranked for diversity) — page-sized
    // by construction, the human-review sample of this generation
    val page = deduped
      .select(col("doc_id").as("vec_id"), col("p_micros").as("rel_micros"))
      .orderBy(col("rel_micros").desc, col("vec_id")).limit(20)
      .join(emb, "vec_id")
    Versioned.commitOverwrite(
      Mmr.select(spark, page, k = showcaseK, lambdaMicros = 700000L),
      qaRoot + "/showcase",
      txn = Some(("curation_showcase", commits.last.version)))

    // v7: training shuffle + group-stable split — THE corpus version
    commit("train_ready",
      Sampling.shuffleShards(deduped, col("doc_id"), nShards = 4)
        .withColumn("split", Sampling.splitLabel(col("doc_id"), 80, 10))
        .drop("shuffle_h"))

    commits.toSeq
  }
}
