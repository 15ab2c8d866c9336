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

  // the double models a store WITH atomic conditional creates
  // (RawLocalFileSystem's create(overwrite = false) really is
  // exclusive); advertise the capability the publish path probes for
  override def hasPathCapability(path: Path, capability: String)
      : Boolean =
    capability.contains("conditional") ||
      super.hasPathCapability(path, capability)
}

/** A capable object store whose lost conditional write surfaces at
  * CLOSE time as hadoop-aws's RemoteFileChangedException (the 412
  * PreconditionFailed path) instead of a create()-time
  * FileAlreadyExistsException — publishExclusive must classify it as
  * a lost race and retry, never abort. */
class MockS3CondPutFileSystem extends MockS3FileSystem {
  override def getScheme: String = "mocks3c"
  override def getUri: URI = URI.create("mocks3c:///")
  override def create(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite && exists(f))
      throw new RemoteFileChangedException(
        s"$f: PUT returned 412 PreconditionFailed (If-None-Match)")
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }
}

/** Shares hadoop-aws's exception SIMPLE NAME so the publish path's
  * by-name classification (the aws jar is not a compile-time
  * dependency) matches it — exactly how a real S3A 412 would look. */
class RemoteFileChangedException(msg: String)
  extends java.io.IOException(msg)

/** An object store that does NOT advertise conditional creates: the
  * publish path must fail fast (loudly) rather than trust a create()
  * that can silently lose a racing commit. */
class MockS3NoCondFileSystem extends MockS3FileSystem {
  override def getScheme: String = "mocks3n"
  override def getUri: URI = URI.create("mocks3n:///")
  override def hasPathCapability(path: Path, capability: String)
      : Boolean = false
}
