package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-versioned parquet store: snapshot isolation + time travel
  * over plain parquet files, the minimal lakehouse commit protocol.
  *
  * Layout under `root`:
  * {{{
  *   data/<commit-uuid>/part-*.parquet   -- immutable once written
  *   manifest-v<N>.json                  -- {"version",N files...}
  * }}}
  *
  * A table VERSION is a manifest: the explicit list of data files that
  * make up that snapshot. Commit protocol: (1) write the batch's
  * parquet files into a fresh `data/<uuid>/` directory; (2) compose the
  * new manifest = parent manifest's files + the new files; (3) write it
  * to a temp name and ATOMIC-RENAME it to `manifest-v<N>.json`. The
  * rename is the only visibility event — a crash before it leaves
  * orphaned data files (harmless, GC-able) but NEVER a torn table, and
  * readers that pinned version k keep a consistent file list forever
  * (files are immutable and never deleted by commits). This is the
  * core argument of every lakehouse log (Delta/Iceberg): correctness
  * lives in one atomic metadata operation, not in the data path.
  *
  * Why it matters at 100 TB: readers never LIST the data directory —
  * the manifest IS the listing, so planning cost tracks the manifest
  * (one small JSON) instead of object-store enumeration over millions
  * of files; appends cost O(delta) with zero read-side disruption; and
  * time travel / reproducible training runs are "pin version k" — the
  * exact corpus a model trained on is re-readable verbatim while
  * ingest keeps committing. Concurrency: single-writer (version
  * numbers race otherwise) — the standard lakehouse assumption absent
  * a coordination service; readers are lock-free at any version.
  *
  * Scala-side I/O is driver-only and manifest-sized; the data path is
  * ordinary `spark.read.parquet(files*)`, so pushdown, pruning and
  * split planning are unchanged. */
object Versioned {

  private def fs(root: String) = new java.io.File(root)

  private def manifestFile(root: String, v: Long) =
    new java.io.File(fs(root), s"manifest-v$v.json")

  /** Highest committed version at `root`, or 0 if none. */
  def latestVersion(root: String): Long = {
    val names = Option(fs(root).list()).getOrElse(Array.empty[String])
    val vs = names.collect {
      case n if n.startsWith("manifest-v") && n.endsWith(".json") =>
        n.stripPrefix("manifest-v").stripSuffix(".json").toLong
    }
    if (vs.isEmpty) 0L else vs.max
  }

  private def readManifest(root: String, v: Long): Seq[String] = {
    val src = scala.io.Source.fromFile(manifestFile(root, v), "UTF-8")
    try {
      // one quoted file path per line between header and footer — no
      // JSON parser dependency needed for a list-of-strings manifest
      src.getLines().map(_.trim).filter(_.startsWith("\""))
        .map(_.stripPrefix("\"").stripSuffix(",").stripSuffix("\""))
        .toList
    } finally src.close()
  }

  private def writeManifest(root: String, v: Long,
                            files: Seq[String]): Unit = {
    val tmp = java.io.File.createTempFile(s"manifest-v$v", ".tmp",
      fs(root))
    val body = (s"""{"version": $v, "files": [""" ::
      files.map("\"" + _ + "\"" + ",").toList).mkString("\n")
        .stripSuffix(",") + "\n]}"
    java.nio.file.Files.write(tmp.toPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // atomic rename = the commit point
    java.nio.file.Files.move(tmp.toPath, manifestFile(root, v).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Append-commit `df` as the next version; returns the new version
    * number. The parquet write lands in an isolated `data/<uuid>/`
    * directory first; the table only advances when the manifest rename
    * succeeds. */
  def commitAppend(df: DataFrame, root: String): Long = {
    fs(root).mkdirs()
    val parent = latestVersion(root)
    val base = parent match {
      case 0L => Nil
      case v  => readManifest(root, v)
    }
    val dir = new java.io.File(new java.io.File(fs(root), "data"),
      java.util.UUID.randomUUID().toString)
    df.write.parquet(dir.getAbsolutePath)
    val added = Option(dir.listFiles()).getOrElse(Array.empty)
      .collect { case f if f.getName.endsWith(".parquet") =>
        f.getAbsolutePath }.sorted.toSeq
    writeManifest(root, parent + 1, base ++ added)
    parent + 1
  }

  /** Read the snapshot at `version` (latest when 0) — exactly the
    * manifest's files, never a directory listing, so concurrent
    * commits and orphaned half-written data are invisible. */
  def read(spark: SparkSession, root: String, version: Long = 0L)
      : DataFrame = {
    val v = if (version == 0L) latestVersion(root) else version
    require(v > 0 && manifestFile(root, v).exists(),
      s"no committed version $v at $root")
    val files = readManifest(root, v)
    spark.read.parquet(files: _*)
  }
}
