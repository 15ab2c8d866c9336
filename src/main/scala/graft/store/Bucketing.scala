package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: the storage-side answer to repeated shuffles.
  *
  * A `bucketBy(n, key)` + `sortBy(key)` table write hash-partitions rows
  * into `n` files per partition and sorts within each bucket. Every later
  * equi-join or aggregation keyed on the bucket column then satisfies its
  * distribution requirement straight from the file layout — NO Exchange,
  * and with sorted buckets no Sort either. At 100 TB this converts the
  * nightly fact⋈fact orderkey shuffle (the single largest wire cost in
  * the plan) into a one-time write cost amortized across every downstream
  * consumer; bucket pruning additionally skips `n−1` of `n` files on
  * point predicates over the bucket key.
  *
  * Spark only honors bucket metadata through the catalog, so tables go
  * through `saveAsTable` with an explicit external `path` (stable across
  * working directories, safe to overwrite per run).
  */
object Bucketing {

  /** Write `df` as a bucketed + per-bucket-sorted external table and
    * return the catalog-backed relation (which carries the bucket spec —
    * reading the parquet path directly would NOT).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): DataFrame = {
    val spark = df.sparkSession
    // One file per bucket: repartition on the bucket key (same murmur3
    // hash as the bucket spec) so each writer task owns whole buckets.
    // Spark only elides the downstream Sort when a bucket is a single
    // file (multi-file buckets interleave), and tasks×buckets small
    // files is the classic bucketed-write scale trap anyway.
    df.repartition(buckets, df(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    spark.table(table)
  }

  /** Append a new batch into an existing bucketed table, preserving
    * the bucket spec (same column, same count — Spark validates) so
    * downstream joins stay exchange-free across ingest cycles. Each
    * append adds one file per bucket; after many cycles run
    * [[writeBucketed]] again as the compaction pass (sorted-read
    * elision needs one file per bucket — appends trade that per-bucket
    * Sort for cheap ingest, the exchange elision is layout-level and
    * survives). */
  def appendBucketed(df: DataFrame, table: String,
                     key: String, buckets: Int): DataFrame = {
    val spark = df.sparkSession
    df.repartition(buckets, df(key))
      .write.mode("append")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    spark.table(table)
  }

  /** Compaction pass: rewrite a bucketed table whose buckets have grown
    * multi-file through [[appendBucketed]] cycles back to one file per
    * bucket, restoring the sorted-read elision appends traded away (the
    * exchange elision never left — it's layout-level). The rewrite goes
    * to a NEW table + path so the pass is crash-safe: the old table
    * stays readable until the caller swaps consumers over, the standard
    * compact-then-swap discipline of every LSM/lakehouse OPTIMIZE. Cost
    * is one read + one clustered write of the table — amortized across
    * every downstream per-bucket Sort it deletes.
    *
    * Concurrency note: the bucketed-scan toggle below is SESSION-global
    * for the duration of the rewrite, so a concurrent query on the same
    * session loses bucketed scans (a perf-only effect) while compaction
    * runs. This matches the single-writer assumption of the compact-
    * then-swap discipline; callers sharing a session across threads
    * should run compaction on its own `spark.newSession()`, which has
    * independent SQL conf. */
  def compact(spark: SparkSession, from: String, to: String, path: String,
              key: String, buckets: Int): DataFrame = {
    // Read the source WITHOUT bucket metadata: a bucketed scan claims
    // hashpartitioning(key, n), which lets the planner elide the
    // rewrite's repartition exchange — but the scan's actual splits are
    // per-FILE, so writer tasks would straddle buckets and emit
    // task×bucket files (observed: 36 files for 16 buckets), defeating
    // the one-file-per-bucket goal of the pass. A plain scan keeps the
    // exchange and lands exactly one file per bucket.
    val prev = spark.conf.get("spark.sql.sources.bucketing.enabled")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "false")
    try writeBucketed(spark.table(from), to, path, key, buckets)
    finally spark.conf.set("spark.sql.sources.bucketing.enabled", prev)
  }

  /** Drop the catalog entry (data files at `path` are external and
    * overwritten by the next write). */
  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
