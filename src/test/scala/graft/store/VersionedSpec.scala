package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() = java.nio.file.Files
    .createTempDirectory("versioned_spec").toString

  test("commits advance versions; each pinned version is its snapshot") {
    val root = freshRoot()
    assert(Versioned.latestVersion(root) == 0L)
    val v1 = Versioned.commitAppend(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root)
    val v2 = Versioned.commitAppend(Seq((3L, "c")).toDF("k", "s"), root)
    assert((v1, v2) == (1L, 2L))
    assert(Versioned.read(spark, root, 1).count() == 2)
    assert(Versioned.read(spark, root, 2).count() == 3)
    // default = latest
    assert(Versioned.read(spark, root).count() == 3)
  }

  test("old versions are immune to later commits (file-pinned)") {
    val root = freshRoot()
    Versioned.commitAppend(Seq((1L, 10L)).toDF("k", "v"), root)
    val before = Versioned.read(spark, root, 1)
    Versioned.commitAppend(Seq((2L, 20L), (3L, 30L)).toDF("k", "v"), root)
    Versioned.commitAppend(Seq((4L, 40L)).toDF("k", "v"), root)
    // both a pre-commit handle and a fresh pin read the v1 snapshot
    assert(before.as[(Long, Long)].collect().toSet == Set((1L, 10L)))
    assert(Versioned.read(spark, root, 1).as[(Long, Long)]
      .collect().toSet == Set((1L, 10L)))
    assert(Versioned.read(spark, root, 3).count() == 4)
  }

  test("an orphaned half-commit (no manifest rename) is invisible") {
    val root = freshRoot()
    Versioned.commitAppend(Seq((1L, "a")).toDF("k", "s"), root)
    // crash between data write and manifest rename: files exist under
    // data/, no manifest points at them
    Seq((99L, "orphan")).toDF("k", "s").write.parquet(
      new java.io.File(new java.io.File(root, "data"), "half")
        .getAbsolutePath)
    assert(Versioned.latestVersion(root) == 1L)
    assert(Versioned.read(spark, root).as[(Long, String)]
      .collect().toSet == Set((1L, "a")))
  }

  test("vacuum deletes only what no retained manifest reaches") {
    val root = freshRoot()
    Versioned.commitAppend(Seq((1L, "a")).toDF("k", "s"), root)
    Versioned.commitAppend(Seq((2L, "b")).toDF("k", "s"), root)
    // overwrite-commit: v3 pins only its own files
    val v3 = Versioned.commitOverwrite(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"), root)
    // orphan from a crashed writer
    Seq((99L, "x")).toDF("k", "s").write.parquet(
      new java.io.File(new java.io.File(root, "data"), "half")
        .getAbsolutePath)
    val (nDel, bytes) = Versioned.vacuum(root, v3)
    assert(nDel > 0 && bytes > 0)
    assert(Versioned.read(spark, root, v3).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // retired versions now fail loudly
    intercept[IllegalArgumentException] {
      Versioned.read(spark, root, 1)
    }
  }

  test("vacuum keeps files shared between retired and retained versions") {
    val root = freshRoot()
    Versioned.commitAppend(Seq((1L, "a")).toDF("k", "s"), root)
    val v2 = Versioned.commitAppend(Seq((2L, "b")).toDF("k", "s"), root)
    // v2's manifest includes v1's files (append) — retiring v1 must
    // delete NOTHING from the data path
    val (nDel, _) = Versioned.vacuum(root, v2)
    assert(Versioned.read(spark, root, v2).count() == 2)
    // only _SUCCESS/.crc side files are sweepable; every parquet file
    // survives because v2 still reaches them
    assert(Versioned.read(spark, root, v2).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("read of an uncommitted version fails loudly") {
    val root = freshRoot()
    intercept[IllegalArgumentException] {
      Versioned.read(spark, root, 1)
    }
    Versioned.commitAppend(Seq((1L, "a")).toDF("k", "s"), root)
    intercept[IllegalArgumentException] {
      Versioned.read(spark, root, 7)
    }
  }
}
