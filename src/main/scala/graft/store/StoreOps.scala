package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-merge re-expressions of uSearch's mutable-store semantics
  * (reference S5–S9). The reference upserts row-at-a-time into
  * CockroachDB/Elasticsearch; in a Spark engine "storage" is an immutable
  * table and each semantic becomes a declarative merge:
  *
  *  - S5 link upsert (`linkgraph/store/cdb/cdb.go:16-22`: `ON CONFLICT (url)
  *    DO UPDATE ... GREATEST(retrieved_at)`) → window-dedup keeping newest.
  *  - S6 edge upsert (`cdb.go:30-36`: key (src,dest), FK endpoints must
  *    exist, `memory.go:144-148`) → semi-join FK check + window-dedup.
  *  - S7 stale-edge GC (`cdb.go:42,149-159`) → negated predicate filter.
  *  - S9 score write-back (`textindexer/store/es/es.go:231-257`: placeholder
  *    doc created when score arrives first) → full-outer join + coalesce.
  *
  * All shapes are shuffle-minimal: one hash partition by the merge key; FK
  * checks are semi-joins that Catalyst can broadcast when the key side is
  * small.
  */
object StoreOps {

  /** Keep the newest row per key (ties broken by `tieBreak` descending).
    * This is the reference's upsert-keep-GREATEST discipline as a batch op. */
  def latestByKey(df: DataFrame, keys: Seq[String], ts: String,
                  tieBreak: Seq[String] = Nil): DataFrame = {
    val ord: Seq[Column] = (ts +: tieBreak).map(c => col(c).desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Edge upsert: FK-validate both endpoints (src against `srcVertices`,
    * dst against `dstVertices` — same table for a homogeneous graph), then
    * dedup (src,dst) keeping the newest observation. */
  def mergeEdges(edges: DataFrame,
                 srcVertices: DataFrame, srcVertexId: String,
                 dstVertices: DataFrame, dstVertexId: String,
                 src: String, dst: String, ts: String,
                 tieBreak: Seq[String] = Nil): DataFrame = {
    val fkOk = edges
      .join(srcVertices.select(col(srcVertexId).as(src)), Seq(src), "left_semi")
      .join(dstVertices.select(col(dstVertexId).as(dst)), Seq(dst), "left_semi")
    latestByKey(fkOk, Seq(src, dst), ts, tieBreak)
  }

  /** Stale GC: drop rows matching (keyPred AND ts < cutoff) — the batch form
    * of `DELETE WHERE src=$1 AND updated_at < $2`. */
  def gcStale(df: DataFrame, keyPred: Column, ts: String,
              cutoff: Column): DataFrame =
    df.filter(!(keyPred && col(ts) < cutoff))

  /** Score write-back with placeholder creation: docs FULL OUTER scores;
    * a score with no doc yields a placeholder row, a doc with no score
    * keeps its previous score (here: defaultScore). */
  def writeScores(docs: DataFrame, scores: DataFrame, idCol: String,
                  scoreCol: String, defaultScore: Double = 0d): DataFrame =
    docs.join(scores, Seq(idCol), "full_outer")
      .withColumn("final_score",
        coalesce(col(scoreCol).cast("double"), lit(defaultScore)))

  /** Slowly-changing-dimension TYPE 2 history build: a change stream
    * (key, change-time, attributes) becomes versioned rows with
    * half-open validity intervals [valid_from, valid_to) — each
    * version's `valid_to` is the NEXT change's time for that key (NULL
    * while current), plus an `is_current` flag. The warehouse upsert
    * discipline that [[latestByKey]] collapses, kept as full history.
    *
    * One shuffle keyed by the dimension key; `lead()` over
    * (`tsCol`, `tieBreak…`) — pass a unique tie-break column when two
    * changes of one key can share a timestamp, or version order (and
    * any engine-parity check) is underdetermined. */
  def scd2(changes: DataFrame, keys: Seq[String], tsCol: String,
           tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Change-point compression (CDC capture): collapse a RAW observation
    * stream to only the rows where `attrCol` differs from the key's
    * previous observation — the run-length front end that turns noisy
    * repeated readings into the change stream [[scd2]] expects.
    * (scd2 itself assumes its input rows ARE changes; feeding it raw
    * observations would emit one zero-information version per reading.)
    *
    * Same window shape as scd2 — one shuffle by key, lag() over
    * (`tsCol`, `tieBreak…`) — so a changePoints |> scd2 pipeline plans
    * ONE exchange + one sort shared by both windows. NULL-safe: a NULL
    * attribute following a non-NULL (or vice versa) is a change;
    * consecutive NULLs are not (eqNullSafe comparison). One edge
    * follows: a key whose FIRST observation is NULL matches the
    * lag()'s no-previous-row NULL, so its history starts at the first
    * non-NULL attribute. */
  def changePoints(stream: DataFrame, keys: Seq[String], tsCol: String,
                   attrCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val prev = "__prev_" + attrCol
    stream
      .withColumn(prev, lag(col(attrCol), 1).over(w))
      .filter(!col(prev).eqNullSafe(col(attrCol)))
      .drop(prev)
  }
}
