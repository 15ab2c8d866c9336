package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-14 write-path contracts: constraints validated on the staged
  * bytes and published race-safely, and partition layout behaving as
  * table metadata for every append path. */
class Round14StoreSpec extends SparkSpec {

  private def scratch(tag: String): String =
    graft.util.TempDirs.scratch(tag)

  test("constraints validate the STAGED bytes - a non-deterministic " +
      "frame cannot slip violating rows past the CHECK") {
    val root = scratch("graft_r14_nondet")
    Versioned.commitAppend(spark.range(10).toDF("k")
      .withColumn("v", lit(1L)), root)
    Versioned.addCheckConstraint(spark, root, "v_small", "v < 1000000")
    // rand() re-evaluates per action: were the constraint checked on a
    // SEPARATE pass over the input, the validated rows would not be
    // the written rows. Checking the staged files makes the outcome
    // exact either way: whatever landed is what was judged.
    val nondet = spark.range(1000).toDF("k")
      .withColumn("v", (rand() * 2000000).cast("long"))
    val before = Versioned.latestVersion(root)
    val threw =
      try { Versioned.commitAppend(nondet, root); false }
      catch { case _: IllegalArgumentException => true }
    assert(threw, "a frame with ~50% violating rows must be refused")
    assert(Versioned.latestVersion(root) == before)
    // the refused staging directory must not leak files
    val (fs, rootPath) = {
      val p = new org.apache.hadoop.fs.Path(root)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    val dataDir = new org.apache.hadoop.fs.Path(rootPath, "data")
    val commitDirs = fs.listStatus(dataDir).count(_.isDirectory)
    assert(commitDirs == 1,
      s"refused staging dirs must be cleaned up, found $commitDirs")
  }

  test("malformed constraint predicates are refused at ADD time, " +
      "even on an empty table") {
    val root = scratch("graft_r14_badpred")
    val threw =
      try {
        Versioned.addCheckConstraint(spark, root, "broken",
          "v >>>> NOT SQL")
        false
      } catch { case _: Exception => true }
    assert(threw, "a typo'd predicate must fail at ADD, not poison " +
      "every later write")
    assert(Versioned.checkConstraints(root).isEmpty)
  }

  test("constraint adds compose through versioned exclusive publish") {
    val root = scratch("graft_r14_conspub")
    Versioned.commitAppend(spark.range(5).toDF("k")
      .withColumn("a", lit(1L)).withColumn("b", lit(2L)), root)
    Versioned.addCheckConstraint(spark, root, "a_pos", "a > 0")
    Versioned.addCheckConstraint(spark, root, "b_pos", "b > 0")
    assert(Versioned.checkConstraints(root).map(_._1).sorted ==
      Seq("a_pos", "b_pos"))
    Versioned.dropCheckConstraint(root, "a_pos")
    assert(Versioned.checkConstraints(root).map(_._1) == Seq("b_pos"))
    // each mutation published a NEW constraints-v<n>.json exclusively
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val states = fs.listStatus(p).map(_.getPath.getName)
      .count(n => n.startsWith("constraints-v") && n.endsWith(".json"))
    assert(states == 3, s"expected 3 published states, found $states")
  }

  test("table properties round-trip; the CDF property turns every " +
      "rewrite's change records on") {
    val root = scratch("graft_r14_props")
    Versioned.commitAppend(spark.range(20).toDF("k")
      .withColumn("v", col("k")), root)
    Versioned.setTableProperties(root,
      Seq(Versioned.EnableChangeDataFeedKey -> "true", "owner" -> "me"))
    assert(Versioned.cdfEnabled(root))
    assert(Versioned.tableProperties(root).toMap.get("owner")
      .contains("me"))
    // a plain Scala DELETE (cdc defaulted false) now stages change
    // records because the table property is on
    Versioned.commitDelete(spark, root, col("k") < 5L)
    val feed = Versioned.readChangeFeed(spark, root, 1L)
    assert(feed.filter(col("_change_type") === "delete").count() == 5L)
    Versioned.unsetTableProperties(root,
      Seq(Versioned.EnableChangeDataFeedKey))
    assert(!Versioned.cdfEnabled(root))
    // SQL surface
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_r14_props " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql("ALTER TABLE graft_r14_props SET TBLPROPERTIES " +
      "('graft.enableChangeDataFeed' = 'true')")
    assert(Versioned.cdfEnabled(root))
    spark.sql("ALTER TABLE graft_r14_props UNSET TBLPROPERTIES " +
      "('graft.enableChangeDataFeed')")
    assert(!Versioned.cdfEnabled(root))
  }

  test("concurrent constraint ALTERs compose (no lost update)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val root = scratch("graft_r14_consrace")
    Versioned.commitAppend(spark.range(4).toDF("k")
      .withColumn("a", lit(1L)).withColumn("b", lit(1L))
      .withColumn("c", lit(1L)).withColumn("d", lit(1L)), root)
    // four racing ADDs of distinct rules: the versioned exclusive
    // publish must compose ALL of them — the read-modify-write race
    // the flat constraints.json lost one to
    val names = Seq("a_pos", "b_pos", "c_pos", "d_pos")
    val adds = names.map { n =>
      Future(Versioned.addCheckConstraint(spark, root, n,
        s"${n.take(1)} > 0"))
    }
    Await.result(Future.sequence(adds), 60.seconds)
    assert(Versioned.checkConstraints(root).map(_._1).sorted == names,
      s"racing ALTERs lost a rule: ${Versioned.checkConstraints(root)}")
  }

  test("replaceWhere evaluates its frame ONCE (staged bytes drive " +
      "both validation and cdc)") {
    val root = scratch("graft_r14_rwonce")
    Versioned.commitAppend(spark.range(100).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(4L))), root,
      partitionBy = Seq("bucket"))
    // a stray frame is refused AND its staging dir cleaned up
    val before = Versioned.latestVersion(root)
    val threw =
      try {
        Versioned.commitReplaceWhere(
          spark.range(200, 210).toDF("k")
            .withColumn("bucket", pmod(col("k"), lit(4L))),
          root, col("bucket") === 1L)
        false
      } catch { case _: IllegalArgumentException => true }
    assert(threw)
    assert(Versioned.latestVersion(root) == before)
    // a clean region replacement with cdc records exact changes
    val repl = spark.range(300, 325).toDF("k")
      .withColumn("bucket", lit(1L))
    Versioned.commitReplaceWhere(repl, root, col("bucket") === 1L,
      cdc = true)
    val feed = Versioned.readChangeFeed(spark, root, before)
    assert(feed.filter(col("_change_type") === "insert").count() == 25L)
    assert(feed.filter(col("_change_type") === "delete").count() == 25L)
    assert(Versioned.read(spark, root).count() == 100L)
  }

  test("writer ergonomics: maxRecordsPerFile bounds file sizes at " +
      "write time; zorderBy clusters the landing batch") {
    val root = scratch("graft_r14_writer")
    spark.range(1000).toDF("k").withColumn("x", pmod(col("k"), lit(32L)))
      .withColumn("y", pmod(col("k") * 7L, lit(32L)))
      .coalesce(1)
      .write.format("graft")
      .option("maxRecordsPerFile", "100")
      .save(root)
    val files = Versioned.files(root)
    assert(files.size == 10,
      s"1000 rows at 100/file from one partition must land 10 files, " +
        s"got ${files.size}")
    // z-order write: stats sidecars on the z dims should file-skip a box
    val rootZ = scratch("graft_r14_zwrite")
    spark.range(4096).toDF("k")
      .withColumn("x", pmod(col("k"), lit(64L)))
      .withColumn("y", pmod(col("k") * 13L, lit(64L)))
      .write.format("graft")
      .option("zorderBy", "x,y").option("zorderFiles", "16")
      .option("statsCols", "x,y")
      .save(rootZ)
    val (kept, total) = Versioned.prunedFiles(rootZ,
      Map("x" -> (0L, 7L), "y" -> (0L, 7L)))
    assert(total == 16L)
    assert(kept.size < total / 2,
      s"a z-ordered 8x8 box must skip most of $total files, " +
        s"admitted ${kept.size}")
    assert(spark.read.format("graft").load(rootZ).count() == 4096L)
  }

  test("DataFrameWriter.partitionBy lands the hive layout natively") {
    val root = scratch("graft_r14_natpby")
    spark.range(256).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(4L)))
      .write.format("graft").partitionBy("bucket").save(root)
    val files = Versioned.files(root)
    assert(files.nonEmpty && files.forall(_.contains("__pi_bucket=")),
      s"partitionBy must not be silently dropped: ${files.take(2)}")
    val (kept, total) = Versioned.prunedFiles(root,
      Map("bucket" -> (2L, 2L)))
    assert(kept.size < total, "the layout must path-prune")
    assert(spark.read.format("graft").load(root)
      .filter(col("bucket") === 2L).count() == 64L)
  }

  test("appends without partitionBy land under the table's layout " +
      "(partition columns are table metadata)") {
    val root = scratch("graft_r14_layout")
    Versioned.commitAppend(spark.range(64).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(4L))), root,
      partitionBy = Seq("bucket"))
    // plain Scala append names no layout — must inherit
    Versioned.commitAppend(spark.range(64, 128).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(4L))), root)
    // format writer append names no layout — must inherit
    spark.range(128, 192).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(4L)))
      .write.format("graft").mode("append").save(root)
    val files = Versioned.files(root)
    assert(files.nonEmpty && files.forall(_.contains("__pi_bucket=")),
      "every file of every append must carry the partition path")
    // and a merge afterwards still auto-preserves (nothing flattened)
    Versioned.commitMerge(spark.range(10).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(4L))), root, Seq("k"))
    assert(Versioned.files(root).forall(_.contains("__pi_bucket=")))
    assert(Versioned.read(spark, root).count() == 192L)
  }
}
