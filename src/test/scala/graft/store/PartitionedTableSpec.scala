package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hive-style partition columns in the versioned store: values are
  * duplicated into type-tagged shadow dirs (`__pi_c=v` / `__ps_c=v`)
  * so data files keep every real column, and file skipping prunes
  * from the PATH before any sidecar is read. */
class PartitionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(tag: String) = graft.util.TempDirs.scratch(tag)

  test("partitioned commit keeps all columns and round-trips") {
    val root = scratch("graft_part_rt")
    val df = spark.range(0, 400).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(8L)))
      .withColumn("payload", col("k") * 3L)
    Versioned.commitAppend(df, root, partitionBy = Seq("bucket"))
    val back = Versioned.read(spark, root)
    assert(back.columns.sorted.toSeq == Seq("bucket", "k", "payload"),
      "shadow partition dirs must never surface as columns")
    assert(back.count() == 400L)
    assert(back.agg(sum("payload")).head.getLong(0) == (0L until 400L).map(_ * 3).sum)
    assert(back.filter(col("bucket") =!= pmod(col("k"), lit(8L))).count() == 0L,
      "partition values must ride inside the data files")
  }

  test("integral partition bounds prune files from the path alone") {
    val root = scratch("graft_part_int")
    val df = spark.range(0, 400).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(8L)))
    Versioned.commitAppend(df, root, partitionBy = Seq("bucket"))
    // deliberately NO sidecars: the path is the only skipping metadata
    val (kept, total) = Versioned.prunedFiles(root,
      Map("bucket" -> (3L, 3L)))
    assert(total >= 8 && kept.size < total / 4,
      s"bucket=3 admitted ${kept.size} of $total files")
    val rows = Versioned.readPruned(spark, root,
      Map("bucket" -> (3L, 3L)))
    assert(rows.filter(col("bucket") === 3L).count() == 50L)
    // range probe spans two partitions
    val (kept2, _) = Versioned.prunedFiles(root,
      Map("bucket" -> (5L, 6L)))
    assert(kept2.size <= 2 * kept.size && kept2.size > 0)
    // a probe on an UNpartitioned column admits everything (no stats)
    val (kept3, _) = Versioned.prunedFiles(root, Map("k" -> (0L, 1L)))
    assert(kept3.size == total)
  }

  test("string partitions prune via prefix-key bounds and value hashes") {
    val root = scratch("graft_part_str")
    val df = spark.range(0, 300).toDF("k")
      .withColumn("src", concat(lit("src"), pmod(col("k"), lit(10L))))
    Versioned.commitAppend(df, root, partitionBy = Seq("src"))
    val (kept, total) = Versioned.prunedFiles(root, Map.empty,
      stringEqualities = Map("src" -> "src7"))
    assert(total >= 10 && kept.size < total / 4,
      s"src7 admitted ${kept.size} of $total files")
    val rows = Versioned.readSkipped(spark, root, Map.empty,
      stringEqualities = Map("src" -> "src7"))
      .filter(col("src") === "src7")
    assert(rows.count() == 30L)
    // special characters survive the path escape round-trip
    val root2 = scratch("graft_part_esc")
    val weird = Seq(("a/b:c d%e", 1L), ("plain", 2L)).toDF("src", "k")
    Versioned.commitAppend(weird, root2, partitionBy = Seq("src"))
    val (keptW, totalW) = Versioned.prunedFiles(root2, Map.empty,
      stringEqualities = Map("src" -> "a/b:c d%e"))
    assert(totalW == 2 && keptW.size == 1,
      s"escaped partition value admitted ${keptW.size} of $totalW")
    assert(Versioned.readPruned(spark, root2, Map.empty,
      stringEqualities = Map("src" -> "a/b:c d%e"))
      .head.getAs[Long]("k") == 1L)
  }

  test("null partitions read back but never satisfy a probe") {
    val root = scratch("graft_part_null")
    val df = Seq((Some("s0"), 1L), (None, 2L), (Some("s1"), 3L))
      .toDF("src", "k")
    Versioned.commitAppend(df, root, partitionBy = Seq("src"))
    assert(Versioned.read(spark, root).count() == 3L)
    assert(Versioned.read(spark, root)
      .filter(col("src").isNull).head.getAs[Long]("k") == 2L)
    val (kept, total) = Versioned.prunedFiles(root, Map.empty,
      stringEqualities = Map("src" -> "s0"))
    assert(total == 3 && kept.size == 1,
      "the null partition cannot satisfy an equality probe")
  }

  test("replaceWhere swaps one partition atomically, leaves the rest by reference") {
    val root = scratch("graft_part_rw")
    val df = spark.range(0, 240).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(6L)))
      .withColumn("v", lit(1L))
    Versioned.commitAppend(df, root, partitionBy = Seq("bucket"))
    // a frame carrying rows OUTSIDE the predicate is refused loudly
    val strays = spark.range(1000, 1010).toDF("k")
      .withColumn("bucket", lit(3L)).withColumn("v", lit(2L))
    intercept[IllegalArgumentException] {
      Versioned.commitReplaceWhere(strays, root, col("bucket") === 2L)
    }
    val repl = spark.range(1000, 1010).toDF("k")
      .withColumn("bucket", lit(2L)).withColumn("v", lit(2L))
    Versioned.commitReplaceWhere(repl, root, col("bucket") === 2L,
      partitionBy = Seq("bucket"))
    val after = Versioned.read(spark, root)
    assert(after.count() == 210L) // 200 untouched + 10 replacement
    assert(after.filter(col("bucket") === 2L).count() == 10L)
    assert(after.filter(col("bucket") === 2L)
      .agg(sum("v")).head.getLong(0) == 20L)
    assert(after.filter(col("bucket") =!= 2L)
      .agg(sum("v")).head.getLong(0) == 200L)
    // untouched partitions persist BY REFERENCE (no rewrite); the
    // replaced partition's old files are gone from the new manifest
    val v1Files = Versioned.files(root, 1L)
    val v2Files = Versioned.files(root, 2L).toSet
    assert(v1Files.filter(_.contains("__pi_bucket=1"))
      .forall(v2Files.contains), "bucket 1 must not be rewritten")
    assert(!v1Files.filter(_.contains("__pi_bucket=2"))
      .exists(v2Files.contains), "old bucket 2 files must be dropped")
    // an empty match region degrades to a plain append
    val fresh = spark.range(2000, 2005).toDF("k")
      .withColumn("bucket", lit(9L)).withColumn("v", lit(3L))
    Versioned.commitReplaceWhere(fresh, root, col("bucket") === 9L)
    assert(Versioned.read(spark, root).count() == 215L)
    // time travel still sees the pre-replacement region
    assert(Versioned.read(spark, root, 1L)
      .filter(col("bucket") === 2L).count() == 40L)
  }

  test("replaceWhere with cdc stages exact delete+insert change records") {
    val root = scratch("graft_part_rwcdc")
    val df = spark.range(0, 60).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(3L)))
    Versioned.commitAppend(df, root, partitionBy = Seq("bucket"))
    val repl = spark.range(500, 504).toDF("k")
      .withColumn("bucket", lit(1L))
    Versioned.commitReplaceWhere(repl, root, col("bucket") === 1L,
      cdc = true)
    val feed = Versioned.readChangeFeed(spark, root, 1L)
    assert(feed.filter(col("_change_type") === "delete").count() == 20L)
    assert(feed.filter(col("_change_type") === "insert").count() == 4L)
    assert(feed.filter(col("_change_type") === "insert")
      .agg(min("k")).head.getLong(0) == 500L)
  }

  test("every rewrite auto-preserves the layout: merge, delete, DV purge, compact") {
    val root = scratch("graft_part_auto")
    val df = spark.range(0, 120).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(4L)))
      .withColumn("v", col("k"))
    Versioned.commitAppend(df, root, partitionBy = Seq("bucket"))
    def allPartitioned(): Boolean = Versioned.files(root)
      .forall(f => f.contains("__pi_bucket=") || f.contains("/cdc/"))
    // copy-on-write MERGE re-lands survivors + updates partitioned
    val upd = spark.range(0, 10).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(4L)))
      .withColumn("v", col("k") + 1000L)
    Versioned.commitMerge(upd, root, Seq("k"))
    assert(allPartitioned(), "merge flattened the layout")
    // copy-on-write DELETE
    Versioned.commitDelete(spark, root, col("k") === 5L)
    assert(allPartitioned(), "delete flattened the layout")
    // deletion-vector delete + purge (tombstone keys stay consistent
    // across the partition dirs' extra path segment)
    Versioned.commitDeleteVectors(spark, root, col("k") === 6L)
    Versioned.commitPurgeDeleteVectors(spark, root)
    assert(Versioned.files(root).forall(_.contains("__pi_bucket=")),
      "purge flattened the layout")
    // compaction auto-detects the layout with no param
    Versioned.commitCompact(spark, root)
    assert(allPartitioned(), "compaction flattened the layout")
    // pruning still engages and contents survived the whole chain
    val (kept, total) = Versioned.prunedFiles(root,
      Map("bucket" -> (2L, 2L)))
    assert(kept.size < total)
    val t = Versioned.read(spark, root)
    assert(t.count() == 118L) // 120 - k=5 - k=6
    val lowSum = t.filter(col("k") < 10L).agg(sum("v")).head.getLong(0)
    assert(lowSum == (0 until 10).filter(x => x != 5 && x != 6)
      .map(_ + 1000L).sum)
  }

  test("partition-aware compaction keeps the hive layout and the path prune") {
    val root = scratch("graft_part_compact")
    (0 until 5).foreach { i =>
      val df = spark.range(i * 40L, i * 40L + 40L).toDF("k")
        .withColumn("bucket", pmod(col("k"), lit(4L)))
      Versioned.commitAppend(df, root, partitionBy = Seq("bucket"))
    }
    val before = Versioned.files(root).size
    val sumBefore = Versioned.read(spark, root)
      .agg(sum("k")).head.getLong(0)
    Versioned.commitCompact(spark, root,
      partitionBy = Seq("bucket"), zorderBy = Seq("k"))
    val afterFiles = Versioned.files(root)
    assert(afterFiles.size < before,
      s"compaction left ${afterFiles.size} of $before files")
    assert(afterFiles.forall(_.contains("__pi_bucket=")),
      "the hive layout must survive compaction")
    val after = Versioned.read(spark, root)
    assert(after.count() == 200L)
    assert(after.agg(sum("k")).head.getLong(0) == sumBefore)
    val (kept, total) = Versioned.prunedFiles(root,
      Map("bucket" -> (1L, 1L)))
    assert(kept.size < total,
      s"post-compaction prune admitted ${kept.size} of $total")
    assert(Versioned.readPruned(spark, root, Map("bucket" -> (1L, 1L)))
      .filter(col("bucket") === 1L).count() == 50L)
  }

  test("partition pruning composes with merge, DV delete and the format read") {
    val root = scratch("graft_part_mix")
    val df = spark.range(0, 240).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(6L)))
      .withColumn("v", lit(1L))
    Versioned.commitAppend(df, root, partitionBy = Seq("bucket"),
      statsCols = Seq("k"))
    // a DV delete whose predicate names the partition column scans
    // (and tombstones) only that partition's files
    Versioned.commitDeleteVectors(spark, root,
      col("bucket") === 2L && col("k") < 100L)
    val live = Versioned.read(spark, root)
    assert(live.count() == 240L - 17L) // k%6==2 && k<100: 17 values
    assert(live.filter(col("bucket") === 2L && col("k") < 100L).count() == 0L)
    // format("graft") write with the partitionBy option + filter-driven
    // pruning through the FileIndex
    val root2 = scratch("graft_part_fmt")
    spark.range(0, 200).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(4L)))
      .write.format("graft").mode("append")
      .option("partitionBy", "bucket").save(root2)
    val t = spark.read.format("graft").load(root2)
      .filter(col("bucket") === 1L)
    val scans = t.queryExecution.executedPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }
    val planned = scans.map(sc => sc.relation.location
      .listFiles(sc.partitionFilters, sc.dataFilters)
      .map(_.files.size).sum).sum
    val totalFiles = Versioned.files(root2).size
    assert(planned < totalFiles,
      s"bucket=1 planned $planned of $totalFiles files")
    assert(t.count() == 50L)
  }
}
