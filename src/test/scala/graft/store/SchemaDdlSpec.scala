package graft.store

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** Metadata-only schema DDL: ADD COLUMNS / RENAME COLUMN / DROP
  * COLUMN never rewrite a data file — files keep their physical
  * column names, reads and writes translate at the facade boundary,
  * and the data-skipping sidecars keep pruning across renames. */
class SchemaDdlSpec extends SparkSpec {

  private def scratch(tag: String): String =
    graft.util.TempDirs.scratch(tag)

  private def dataFilesOf(root: String): Seq[String] =
    Versioned.files(root).filter(_.contains("/data/"))

  test("RENAME COLUMN is metadata-only and reads translate") {
    val root = scratch("graft_ddl_rename")
    Versioned.commitAppend(spark.range(10).toDF("k")
      .withColumn("v", col("k") * 2), root)
    val filesBefore = dataFilesOf(root).toSet
    Versioned.renameColumn(spark, root, "v", "value")
    assert(dataFilesOf(root).toSet == filesBefore,
      "rename must not rewrite a single data file")
    val df = Versioned.read(spark, root)
    assert(df.columns.toSeq == Seq("k", "value"))
    assert(df.filter(col("value") === 6L).select("k")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // the files still carry the OLD (physical) name
    val raw = spark.read.parquet(dataFilesOf(root).head)
    assert(raw.columns.contains("v") && !raw.columns.contains("value"))
  }

  test("time travel shows each version under its own schema") {
    val root = scratch("graft_ddl_tt")
    Versioned.commitAppend(spark.range(3).toDF("k")
      .withColumn("v", lit(1L)), root) // v1
    val v2 = Versioned.renameColumn(spark, root, "v", "w") // v2
    assert(Versioned.read(spark, root, 1L).columns.toSeq == Seq("k", "v"),
      "pre-DDL versions keep their original names")
    assert(Versioned.read(spark, root, v2).columns.toSeq == Seq("k", "w"))
    assert(Versioned.read(spark, root).columns.toSeq == Seq("k", "w"))
  }

  test("ADD COLUMNS null-fills old rows; writes after carry it") {
    val root = scratch("graft_ddl_add")
    Versioned.commitAppend(spark.range(4).toDF("k"), root)
    Versioned.addColumns(spark, root,
      StructType(Seq(StructField("tag", StringType))))
    val after = Versioned.read(spark, root)
    assert(after.columns.toSeq == Seq("k", "tag"))
    assert(after.filter(col("tag").isNull).count() == 4L)
    Versioned.commitAppend(spark.range(4, 6).toDF("k")
      .withColumn("tag", lit("new")), root)
    val all = Versioned.read(spark, root)
    assert(all.count() == 6L)
    assert(all.filter(col("tag") === "new").count() == 2L)
  }

  test("DROP COLUMN hides the bytes; re-adding the name cannot " +
      "resurrect them") {
    val root = scratch("graft_ddl_drop")
    Versioned.commitAppend(spark.range(5).toDF("k")
      .withColumn("secret", col("k") * 100), root)
    Versioned.dropColumn(spark, root, "secret")
    assert(Versioned.read(spark, root).columns.toSeq == Seq("k"))
    // re-add the same logical name: fresh physical, old values gone
    Versioned.addColumns(spark, root,
      StructType(Seq(StructField("secret", LongType))))
    val readd = Versioned.read(spark, root)
    assert(readd.columns.toSeq == Seq("k", "secret"))
    assert(readd.filter(col("secret").isNotNull).count() == 0L,
      "dropped bytes must never resurrect under a re-added name")
  }

  test("stats/bloom file skipping keeps pruning across a rename " +
      "and probes translate to the physical key space") {
    val root = scratch("graft_ddl_skip")
    // three commits with disjoint key ranges => 3 files with stats
    (0 until 3).foreach { i =>
      Versioned.commitAppend(
        spark.range(i * 100L, i * 100L + 100L).toDF("id")
          .withColumn("v", col("id") % 7).repartition(1),
        root, statsCols = Seq("id"), bloomCols = Seq("id"))
    }
    Versioned.renameColumn(spark, root, "id", "ident")
    // facade probe in the NEW logical name must still skip files
    val (kept, total) = Versioned.prunedFiles(root,
      Map("ident" -> (250L, 260L)))
    assert(total == 3L)
    assert(kept.size == 1,
      s"rename must not break stats pruning (kept ${kept.size}/3)")
    val rows = Versioned.readSkipped(spark, root,
      Map("ident" -> (250L, 260L))).filter(
      col("ident").between(250L, 260L))
    assert(rows.count() == 11L)
    // new appends keep maintaining the same (physical) sidecar lineage
    Versioned.commitAppend(spark.range(300L, 400L).toDF("ident")
      .withColumn("v", col("ident") % 7).repartition(1), root)
    val (kept2, total2) = Versioned.prunedFiles(root,
      Map("ident" -> (350L, 360L)))
    assert(total2 == 4L && kept2.size == 1,
      s"post-rename appends must keep skipping (kept ${kept2.size}/$total2)")
  }

  test("DML under a rename: merge, update, delete, replaceWhere all " +
      "speak the new name") {
    val root = scratch("graft_ddl_dml")
    Versioned.commitAppend(spark.range(10).toDF("k")
      .withColumn("v", lit(0L)), root)
    Versioned.renameColumn(spark, root, "v", "val")
    // copy-on-write merge keyed on k, updating val
    Versioned.commitMerge(spark.range(2, 4).toDF("k")
      .withColumn("val", lit(9L)), root, Seq("k"))
    assert(Versioned.read(spark, root).filter(col("val") === 9L)
      .count() == 2L)
    // UPDATE via the renamed column in predicate AND assignment
    Versioned.commitUpdate(spark, root, col("val") === 9L,
      Seq("val" -> lit(7L)))
    assert(Versioned.read(spark, root).filter(col("val") === 7L)
      .count() == 2L)
    // DELETE by the renamed column
    Versioned.commitDelete(spark, root, col("val") === 7L)
    assert(Versioned.read(spark, root).count() == 8L)
    // replaceWhere over the renamed column's region
    Versioned.commitReplaceWhere(
      spark.range(100, 103).toDF("k").withColumn("val", lit(5L)),
      root, col("val") === 5L)
    val after = Versioned.read(spark, root)
    assert(after.count() == 11L)
    assert(after.filter(col("val") === 5L).count() == 3L)
  }

  test("deletion vectors + change feed survive a rename") {
    val root = scratch("graft_ddl_dvcdf")
    Versioned.commitAppend(spark.range(10).toDF("k")
      .withColumn("v", col("k")), root)
    Versioned.renameColumn(spark, root, "v", "vv")
    val v = Versioned.commitDeleteVectors(spark, root, col("vv") < 3L)
    assert(Versioned.read(spark, root).count() == 7L)
    val feed = Versioned.readChangeFeed(spark, root, v - 1, v)
    assert(feed.columns.toSeq ==
      Seq("k", "vv", "_change_type", "_commit_version"))
    assert(feed.filter(col("_change_type") === "delete").count() == 3L)
    // purge folds tombstones in; contents unchanged, still logical
    Versioned.commitPurgeDeleteVectors(spark, root)
    val purged = Versioned.read(spark, root)
    assert(purged.columns.toSeq == Seq("k", "vv"))
    assert(purged.count() == 7L)
  }

  test("merge-on-read + compaction under a rename") {
    val root = scratch("graft_ddl_mor")
    Versioned.commitAppend(spark.range(8).toDF("k")
      .withColumn("v", lit(1L)), root)
    Versioned.renameColumn(spark, root, "v", "score")
    Versioned.commitMergeOnRead(spark.range(2, 4).toDF("k")
      .withColumn("score", lit(99L)), root, Seq("k"))
    val read = Versioned.read(spark, root)
    assert(read.count() == 8L)
    assert(read.filter(col("score") === 99L).count() == 2L)
    Versioned.commitPurgeDeleteVectors(spark, root)
    Versioned.commitCompact(spark, root)
    val compacted = Versioned.read(spark, root)
    assert(compacted.columns.toSeq == Seq("k", "score"))
    assert(compacted.count() == 8L)
    assert(compacted.filter(col("score") === 99L).count() == 2L)
  }

  test("constraints guard DDL: a referenced column refuses rename " +
      "and drop; constraints still enforce over the logical names") {
    val root = scratch("graft_ddl_cons")
    Versioned.commitAppend(spark.range(5).toDF("k")
      .withColumn("v", lit(10L)), root)
    Versioned.addCheckConstraint(spark, root, "v_pos", "v > 0")
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, root, "v", "w")
    }
    intercept[IllegalArgumentException] {
      Versioned.dropColumn(spark, root, "v")
    }
    // renaming an unreferenced column is fine, and the constraint
    // still validates the staged bytes afterwards
    Versioned.renameColumn(spark, root, "k", "key")
    intercept[IllegalArgumentException] {
      Versioned.commitAppend(spark.range(1).toDF("key")
        .withColumn("v", lit(-5L)), root)
    }
  }

  test("partition columns refuse rename/drop (their values live in " +
      "paths); other columns of a partitioned table rename fine") {
    val root = scratch("graft_ddl_part")
    Versioned.commitAppend(spark.range(20).toDF("k")
      .withColumn("p", col("k") % 2)
      .withColumn("v", col("k") * 3), root, partitionBy = Seq("p"))
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, root, "p", "bucket")
    }
    intercept[IllegalArgumentException] {
      Versioned.dropColumn(spark, root, "p")
    }
    Versioned.renameColumn(spark, root, "v", "triple")
    val df = Versioned.read(spark, root)
    assert(df.columns.toSeq == Seq("k", "p", "triple"))
    assert(df.filter(col("p") === 1L && col("triple") === 9L)
      .count() == 1L)
    // partition-path pruning still admits by the (unrenamed) column
    val (kept, total) = Versioned.prunedFiles(root,
      equalities = Map("p" -> 1L), bounds = Map.empty)
    assert(kept.size < total,
      "path-level partition pruning must survive unrelated renames")
  }

  test("schema DDL commits appear in DESCRIBE HISTORY and conflict-" +
      "detect like any commit") {
    val root = scratch("graft_ddl_hist")
    Versioned.commitAppend(spark.range(3).toDF("k")
      .withColumn("v", lit(1L)), root)
    Versioned.renameColumn(spark, root, "v", "w")
    val ops = Versioned.history(spark, root)
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.contains("rename-column v->w"), s"got $ops")
  }

  test("incremental readChanges projects the logical schema") {
    val root = scratch("graft_ddl_inc")
    val v1 = Versioned.commitAppend(spark.range(3).toDF("k")
      .withColumn("v", lit(1L)), root)
    Versioned.renameColumn(spark, root, "v", "w")
    val v3 = Versioned.commitAppend(spark.range(3, 6).toDF("k")
      .withColumn("w", lit(2L)), root)
    val delta = Versioned.readChanges(spark, root, v1, v3)
    assert(delta.columns.toSeq == Seq("k", "w"))
    assert(delta.count() == 3L)
  }

  test("empty table + DDL: a schema-only table takes DDL and serves " +
      "the evolved typed empty frame") {
    val root = scratch("graft_ddl_empty")
    Versioned.commitAppend(spark.range(2).toDF("k")
      .withColumn("v", lit(1L)), root)
    Versioned.commitDelete(spark, root, lit(true)) // now zero files
    Versioned.renameColumn(spark, root, "v", "w")
    val df = Versioned.read(spark, root)
    assert(df.columns.toSeq == Seq("k", "w") && df.count() == 0L)
  }

  test("rename into another field's physical name is refused " +
      "(one unambiguous probe namespace)") {
    val root = scratch("graft_ddl_amb")
    Versioned.commitAppend(spark.range(3).toDF("a")
      .withColumn("b", lit(1L)), root)
    Versioned.renameColumn(spark, root, "a", "c") // c stored as 'a'
    intercept[IllegalArgumentException] {
      // 'b' -> 'a' would make logical 'a' shadow c's physical 'a'
      Versioned.renameColumn(spark, root, "b", "a")
    }
    // chain-rename the same field is fine: c -> d (still stored 'a')
    Versioned.renameColumn(spark, root, "c", "d")
    assert(Versioned.read(spark, root).columns.toSeq == Seq("d", "b"))
  }

  test("schema evolution on write under mapping: a new column in an " +
      "appended frame extends the state with a safe physical name") {
    val root = scratch("graft_ddl_evolve")
    Versioned.commitAppend(spark.range(3).toDF("k"), root)
    Versioned.renameColumn(spark, root, "k", "key")
    Versioned.commitAppend(spark.range(3, 5).toDF("key")
      .withColumn("extra", lit("x")), root)
    val df = Versioned.read(spark, root)
    assert(df.columns.toSeq == Seq("key", "extra"))
    assert(df.filter(col("extra").isNull).count() == 3L)
    assert(df.filter(col("extra") === "x").count() == 2L)
  }
}
