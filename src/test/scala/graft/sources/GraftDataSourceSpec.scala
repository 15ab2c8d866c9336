package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.Versioned

/** `format("graft")` — the versioned store as a Spark data source:
  * filters written as plain DataFrame predicates must reach the
  * store's file skipping through Catalyst, and every answer must match
  * the store's own read path. */
class GraftDataSourceSpec extends SparkSpec {

  private def scratch(tag: String): String =
    graft.util.TempDirs.scratch(tag)

  /** Files the query's scan ACTUALLY plans, asked of the relation's
    * own FileIndex with the scan's pushed-down data filters. */
  private def plannedFiles(df: DataFrame): Int = {
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one file scan:\n" +
      df.queryExecution.executedPlan.toString.take(2000))
    val s = scans.head
    s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
      .map(_.files.size).sum
  }

  /** 8 single-file commits keyed by disjoint k-ranges (file i holds
    * k in [100i, 100i+99]) with stats+bloom sidecars on k and url. */
  private def slicedTable(tag: String): String = {
    val root = scratch(tag)
    (0 until 8).foreach { i =>
      val df = spark.range(100L * i, 100L * i + 100).toDF("k")
        .withColumn("url",
          concat(lit("https://host"), col("k") % 4,
            lit(".example/p/"), col("k")))
        .withColumn("payload", col("k") * 7L)
      Versioned.commitAppend(df.coalesce(1), root,
        statsCols = Seq("k", "url"), bloomCols = Seq("k", "url"))
    }
    root
  }

  test("format write + read round-trip with time travel") {
    val root = scratch("graft_dsrc_rt")
    spark.range(0, 50).toDF("k")
      .write.format("graft").mode("append").save(root)
    spark.range(50, 80).toDF("k")
      .write.format("graft").mode("append").save(root)
    val all = spark.read.format("graft").load(root)
    assert(all.count() == 80L)
    assert(all.agg(sum("k")).head.getLong(0) == (0L until 80L).sum)
    val v1 = spark.read.format("graft")
      .option("versionAsOf", "1").load(root)
    assert(v1.count() == 50L)
    // the store's own API sees format-written commits identically
    assert(Versioned.read(spark, root).count() == 80L)
  }

  test("integral equality and range filters skip files") {
    val root = slicedTable("graft_dsrc_skip")
    val t = spark.read.format("graft").load(root)
    assert(plannedFiles(t) == 8)

    val eq = t.filter(col("k") === 333L)
    assert(plannedFiles(eq) == 1, "k=333 must plan exactly file 3")
    assert(eq.select("payload").head.getLong(0) == 333L * 7)

    val rng = t.filter(col("k") >= 150L && col("k") < 420L)
    assert(plannedFiles(rng) == 4, "range must plan exactly files 1..4")
    assert(rng.count() == 270L)

    val in = t.filter(col("k").isin(5L, 17L, 23L))
    assert(plannedFiles(in) == 1, "IN within one slice must plan 1 file")
    assert(in.count() == 3L)

    // contradiction: crossed bounds survive the optimizer (unlike a
    // twice-pinned equality, which Catalyst folds to an empty
    // relation before the index is consulted) and must plan ZERO files
    val none = t.filter(col("k") >= 600L && col("k") < 10L)
    assert(plannedFiles(none) == 0)
    assert(none.count() == 0L)
  }

  test("string equality prunes through hash blooms, prefixes through stats") {
    val root = slicedTable("graft_dsrc_str")
    val t = spark.read.format("graft").load(root)
    // every URL shares the 8-byte "https://" prefix: only the
    // full-value hash bloom can discriminate equality here
    val probe = "https://host1.example/p/401"
    val hit = t.filter(col("url") === probe)
    assert(plannedFiles(hit) < 8, "URL equality must prune via bloom")
    assert(hit.count() == 1L && hit.head.getAs[Long]("k") == 401L)
    // a miss still answers empty, whatever was admitted
    assert(t.filter(col("url") === "https://nowhere.example/x")
      .count() == 0L)
  }

  test("SQL over a temp view drives the same skipping") {
    val root = slicedTable("graft_dsrc_sql")
    spark.read.format("graft").load(root).createOrReplaceTempView("gds")
    val q = spark.sql("SELECT sum(payload) AS s FROM gds WHERE k = 212")
    assert(q.head.getLong(0) == 212L * 7)
    val scan = spark.sql("SELECT * FROM gds WHERE k = 212")
    assert(plannedFiles(scan) == 1)
  }

  test("deletion-vector tables fall back to the store's scan path") {
    val root = slicedTable("graft_dsrc_dv")
    Versioned.commitDeleteVectors(spark, root,
      col("k") % 100L === 42L) // one row tombstoned per file
    assert(Versioned.hasDeleteVectors(root))
    val t = spark.read.format("graft").load(root)
    assert(t.count() == 792L, "8 tombstoned rows must vanish")
    assert(t.filter(col("k") === 42L).count() == 0L)
    assert(t.filter(col("k") === 43L).count() == 1L)
    // column pruning + row filters through the fallback relation
    val s = t.filter(col("k") >= 100L && col("k") < 200L)
      .agg(sum("payload")).head.getLong(0)
    val expect = (100L until 200L).filter(_ != 142L).map(_ * 7).sum
    assert(s == expect)
    // purge restores the native file-scan relation
    Versioned.commitPurgeDeleteVectors(spark, root)
    val purged = spark.read.format("graft").load(root)
    assert(plannedFiles(purged.filter(col("k") === 43L)) >= 1)
    assert(purged.count() == 792L)
  }

  test("CREATE TEMPORARY VIEW ... USING graft serves pure-SQL users") {
    val root = slicedTable("graft_dsrc_ddl")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gds_ddl " +
      s"USING graft OPTIONS (path '$root')")
    assert(spark.sql("SELECT count(*) AS n FROM gds_ddl")
      .head.getLong(0) == 800L)
    assert(spark.sql("SELECT payload FROM gds_ddl WHERE k = 212")
      .head.getLong(0) == 212L * 7)
    assert(plannedFiles(
      spark.sql("SELECT * FROM gds_ddl WHERE k = 212")) == 1)
    // time travel through DDL options
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gds_v1 " +
      s"USING graft OPTIONS (path '$root', versionAsOf '1')")
    assert(spark.sql("SELECT count(*) AS n FROM gds_v1")
      .head.getLong(0) == 100L)
  }

  test("SQL INSERT INTO commits through the manifest protocol") {
    val root = scratch("graft_dsrc_ins")
    spark.range(0, 10).toDF("k")
      .withColumn("bucket", pmod(col("k"), lit(2L)))
      .write.format("graft").mode("append")
      .option("partitionBy", "bucket").save(root)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW ins_t " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql("INSERT INTO ins_t VALUES (100, 0)")
    assert(Versioned.latestVersion(root) == 2L,
      "INSERT must publish a manifest version")
    assert(Versioned.read(spark, root).count() == 11L,
      "inserted rows must be visible to protocol reads")
    assert(Versioned.files(root).forall(_.contains("__pi_bucket=")),
      "SQL appends must land under the table's own layout")
    spark.sql("INSERT INTO ins_t SELECT id + 200, id % 2 FROM range(3)")
    assert(Versioned.read(spark, root).count() == 14L)
    // INSERT OVERWRITE = overwrite commit; history stays readable
    spark.sql("INSERT OVERWRITE ins_t VALUES (7, 1)")
    assert(Versioned.read(spark, root).count() == 1L)
    assert(Versioned.read(spark, root, 2L).count() == 11L)
    // nothing bypassed the protocol into the table root
    assert(!new java.io.File(root).listFiles()
      .exists(f => f.getName.endsWith(".parquet") ||
        f.getName == "_SUCCESS"),
      "no orphan files may land beside the manifests")
  }

  test("SQL DELETE, UPDATE and MERGE route through the commit protocol") {
    import spark.implicits._
    val root = scratch("graft_dsrc_dml")
    spark.range(0, 100).toDF("k").withColumn("v", col("k") * 2L)
      .write.format("graft").mode("append").save(root)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW dml_t " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql("UPDATE dml_t SET v = v + 1000 WHERE k < 10")
    assert(Versioned.read(spark, root).count() == 100L)
    assert(Versioned.read(spark, root).filter(col("k") < 10L)
      .agg(sum("v")).head.getLong(0) ==
      (0 until 10).map(k => 2L * k + 1000L).sum)
    // copy-on-write DELETE (no tombstones yet)
    spark.sql("DELETE FROM dml_t WHERE k >= 90")
    assert(Versioned.read(spark, root).count() == 90L)
    // a DV-carrying table stays merge-on-read under SQL DELETE
    Versioned.commitDeleteVectors(spark, root, col("k") === 0L)
    spark.sql("DELETE FROM dml_t WHERE k = 1")
    assert(Versioned.hasDeleteVectors(root))
    assert(Versioned.read(spark, root).count() == 88L)
    // canonical-upsert MERGE (purge first: commitMerge is CoW)
    Versioned.commitPurgeDeleteVectors(spark, root)
    spark.range(85, 95).toDF("k").withColumn("v", lit(7L))
      .createOrReplaceTempView("dml_src")
    spark.sql("MERGE INTO dml_t USING dml_src ON dml_t.k = dml_src.k " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(Versioned.read(spark, root).count() == 93L,
      "5 matched updates + 5 re-inserts of deleted keys")
    assert(Versioned.read(spark, root)
      .filter(col("k") >= 85L && col("k") < 95L)
      .agg(sum("v")).head.getLong(0) == 70L)
    // the statements read back as ordinary commits
    val ops = Versioned.history(spark, root)
      .select("operation").as[String].collect().toSet
    assert(Set("update", "delete", "merge").subsetOf(ops), s"ops=$ops")
    // matched DELETE is part of the supported grammar (round 14)
    spark.sql("MERGE INTO dml_t USING dml_src ON dml_t.k = dml_src.k " +
      "WHEN MATCHED THEN DELETE")
    assert(Versioned.read(spark, root).count() == 83L,
      "the 10 source keys must delete")
    // only a non-equality ON clause is refused, naming the contract
    val ex = intercept[Exception] {
      spark.sql("MERGE INTO dml_t USING dml_src ON dml_t.k < dml_src.k " +
        "WHEN MATCHED THEN DELETE")
    }
    assert(ex.getMessage.contains("identically-named"))
  }

  test("batch change feed through format options") {
    val root = scratch("graft_dsrc_cdf")
    spark.range(0, 20).toDF("k")
      .write.format("graft").mode("append").save(root)
    spark.range(20, 30).toDF("k")
      .write.format("graft").mode("append").save(root)
    Versioned.commitDeleteVectors(spark, root, col("k") < 5L)
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").load(root)
    assert(feed.columns.contains("_change_type") &&
      feed.columns.contains("_commit_version"))
    assert(feed.filter(col("_change_type") === "insert").count() == 10L)
    assert(feed.filter(col("_change_type") === "delete").count() == 5L)
    // ending bound cuts the range
    assert(spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "2")
      .load(root).count() == 10L)
    // an empty range answers empty, not an error
    val v = Versioned.latestVersion(root)
    assert(spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", v.toString).load(root).count() == 0L)
  }

  test("save modes honor existing tables") {
    val root = scratch("graft_dsrc_modes")
    spark.range(0, 10).toDF("k")
      .write.format("graft").mode("errorifexists").save(root)
    intercept[IllegalArgumentException] {
      spark.range(0, 10).toDF("k")
        .write.format("graft").mode("errorifexists").save(root)
    }
    spark.range(10, 20).toDF("k")
      .write.format("graft").mode("ignore").save(root)
    assert(spark.read.format("graft").load(root).count() == 10L)
    spark.range(0, 3).toDF("k")
      .write.format("graft").mode("overwrite").save(root)
    assert(spark.read.format("graft").load(root).count() == 3L)
    assert(spark.read.format("graft").option("versionAsOf", "1")
      .load(root).count() == 10L)
  }
}
