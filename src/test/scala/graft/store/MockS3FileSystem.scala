package graft.store

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import java.net.URI

/** Object-store `FileSystem` double for VersionedSpec: local storage
  * with S3 semantics — `rename` is copy+delete and silently REPLACES
  * an existing destination (exactly the hazard the store's documented
  * S3 caveat names), while `create(path, overwrite = false)` is the
  * exclusive primitive (the conditional-put / If-None-Match contract).
  * `RawLocalFileSystem` already behaves this way — `File.renameTo`
  * replaces, `create(overwrite = false)` throws
  * FileAlreadyExistsException — so the double only claims the scheme;
  * registering it under `mocks3://` makes `Versioned.publishExclusive`
  * take its conditional-put branch, giving the object-store path the
  * same deterministic race coverage as the POSIX link(2) and HDFS
  * rename branches. */
class MockS3FileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3:///")

  // pin the hazard the branch exists for: rename NEVER fails on an
  // existing destination here (delete-then-rename, the copy+delete
  // object-store emulation) — any publish path trusting rename
  // exclusivity on this scheme would silently orphan a racer's commit
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, false)
    super.rename(src, dst)
  }
}
