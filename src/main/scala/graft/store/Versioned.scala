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

  private def commit(df: DataFrame, root: String,
                     baseOf: Long => Seq[String]): Long = {
    fs(root).mkdirs()
    val parent = latestVersion(root)
    val base = if (parent == 0L) Nil else baseOf(parent)
    val dir = new java.io.File(new java.io.File(fs(root), "data"),
      java.util.UUID.randomUUID().toString)
    df.write.parquet(dir.getAbsolutePath)
    val added = Option(dir.listFiles()).getOrElse(Array.empty)
      .collect { case f if f.getName.endsWith(".parquet") =>
        f.getAbsolutePath }.sorted.toSeq
    writeManifest(root, parent + 1, base ++ added)
    parent + 1
  }

  /** Append-commit `df` as the next version; returns the new version
    * number. The parquet write lands in an isolated `data/<uuid>/`
    * directory first; the table only advances when the manifest rename
    * succeeds. */
  def commitAppend(df: DataFrame, root: String): Long =
    commit(df, root, readManifest(root, _))

  /** Overwrite-commit: the new version's manifest lists ONLY this
    * batch's files — the compaction / full-rewrite commit. Older
    * versions keep reading their pinned files untouched until
    * [[vacuum]] retires them; this is what makes history reclaimable
    * in an otherwise append-only store. */
  def commitOverwrite(df: DataFrame, root: String): Long =
    commit(df, root, _ => Nil)

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

  /** Garbage-collect history: retire versions < `keepFrom` and delete
    * every data file not reachable from any RETAINED manifest — which
    * also sweeps orphaned half-commits. Returns (files deleted, bytes
    * reclaimed).
    *
    * Safety is set arithmetic, not bookkeeping: the delete set is
    * (all files on disk) − (union of retained manifests' files), so a
    * file shared by a retired and a retained version survives — append
    * manifests overlap heavily, and this is why vacuum reclaims only
    * what NO retained snapshot can ever read. Retired manifest files
    * are removed after the data sweep; reads at retained versions are
    * byte-identical before/after (VersionedSpec pins it). Driver-side
    * and manifest-sized, like every other metadata op here; production
    * note: run under the same single-writer lock as commits, and age-
    * guard orphans if writers can be mid-commit (the replay harness is
    * single-threaded, so the sweep here is unconditional). */
  def vacuum(root: String, keepFrom: Long): (Long, Long) = {
    val latest = latestVersion(root)
    require(keepFrom >= 1 && keepFrom <= latest,
      s"keepFrom $keepFrom outside committed range 1..$latest")
    val keep = (keepFrom to latest)
      .flatMap(v => readManifest(root, v)).toSet
    val dataDir = new java.io.File(fs(root), "data")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    val (nDel, bytes) = walk(dataDir)
      .filter(f => !keep.contains(f.getAbsolutePath))
      .foldLeft((0L, 0L)) { case ((n, b), f) =>
        val sz = f.length()
        if (f.delete()) (n + 1, b + sz) else (n, b)
      }
    // drop now-empty commit directories, then the retired manifests
    Option(dataDir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        Option(d.listFiles()).forall(_.isEmpty))
      .foreach(_.delete())
    (1L until keepFrom).map(manifestFile(root, _)).foreach(_.delete())
    (nDel, bytes)
  }
}
