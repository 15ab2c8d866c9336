package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Scheme-agnostic file metadata through the Hadoop `FileSystem` API.
  * Warm-snapshot staging stamps a SOURCE FINGERPRINT (the input table's
  * modification time) into its versioned commit's manifest so a stale
  * snapshot is detected by metadata alone; reading that mtime through
  * `java.io.File` would silently return 0 for any non-local scheme,
  * making every hdfs://-rooted snapshot read as permanently fresh —
  * this helper keeps the staleness check honest on any scheme the
  * store itself supports. */
object FsMeta {

  private def conf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** Modification time (epoch millis) of `path` — for a directory
    * (e.g. a multi-file parquet table), the newest mtime of the
    * directory itself and its direct children, so a regenerated part
    * file bumps the fingerprint even when the directory inode's own
    * mtime is preserved. */
  def mtime(path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (!st.isDirectory) st.getModificationTime
    else (st.getModificationTime +:
      fs.listStatus(p).map(_.getModificationTime).toSeq).max
  }
}
