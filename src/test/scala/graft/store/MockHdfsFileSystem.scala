package graft.store

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import java.net.URI

/** HDFS-contract `FileSystem` double for VersionedSpec: local storage,
  * but `rename` FAILS when the destination exists (the HDFS rename
  * contract `publishExclusive` relies on for its non-POSIX branch) —
  * `RawLocalFileSystem.rename` would silently REPLACE via
  * `File.renameTo`, which is exactly the hazard the store's exclusive
  * publish must never inherit. Registered under the `mockhdfs://`
  * scheme via `fs.mockhdfs.impl`, so `Versioned.fsRoot` resolves it
  * like any remote scheme and takes the rename branch of
  * `publishExclusive` instead of the `link(2)` branch. */
class MockHdfsFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mockhdfs"
  override def getUri: URI = URI.create("mockhdfs:///")

  override def rename(src: Path, dst: Path): Boolean = {
    // HDFS contract: rename to an existing destination fails (returns
    // false) instead of replacing it
    if (exists(dst)) false
    else super.rename(src, dst)
  }
}
