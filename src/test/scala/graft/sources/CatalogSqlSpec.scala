package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.Versioned

/** Graft tables as first-class CATALOG citizens plus the SQL
  * governance verbs: create/read/DML by NAME, time travel by name,
  * DESCRIBE HISTORY / OPTIMIZE / VACUUM / ALTER TABLE ADD CONSTRAINT
  * entirely in SQL. */
class CatalogSqlSpec extends SparkSpec {

  private def scratch(tag: String): String =
    graft.util.TempDirs.scratch(tag)

  test("CREATE TABLE ... USING graft registers in the session catalog") {
    val root = scratch("graft_cat_create")
    spark.range(20).toDF("k").withColumn("v", col("k") * 3L)
      .write.format("graft").save(root)
    spark.sql(s"CREATE TABLE graft_cat_t USING graft LOCATION '$root'")
    try {
      assert(spark.sql("SELECT count(*) FROM graft_cat_t")
        .head.getLong(0) == 20L)
      // reads by name observe later commits (lazy snapshot)
      spark.sql("INSERT INTO graft_cat_t VALUES (100, 300)")
      assert(spark.sql("SELECT count(*) FROM graft_cat_t")
        .head.getLong(0) == 21L)
      assert(Versioned.latestVersion(root) == 2L,
        "INSERT by name must commit through the manifest protocol")
      // a FRESH session over the same shared state sees the table
      val s2 = spark.newSession()
      assert(s2.sql("SELECT sum(v) FROM graft_cat_t").head.getLong(0) ==
        (0L until 20L).map(_ * 3).sum + 300L)
      // DML by name
      spark.sql("UPDATE graft_cat_t SET v = 0 WHERE k = 100")
      assert(spark.sql(
        "SELECT v FROM graft_cat_t WHERE k = 100").head.getLong(0) == 0L)
      spark.sql("DELETE FROM graft_cat_t WHERE k = 100")
      assert(spark.sql("SELECT count(*) FROM graft_cat_t")
        .head.getLong(0) == 20L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_cat_t")
  }

  test("saveAsTable creates a managed graft table") {
    spark.sql("DROP TABLE IF EXISTS graft_cat_m")
    spark.range(10).toDF("k")
      .write.format("graft").saveAsTable("graft_cat_m")
    try {
      assert(spark.sql("SELECT count(*) FROM graft_cat_m")
        .head.getLong(0) == 10L)
      spark.range(10, 15).toDF("k")
        .write.format("graft").mode("append").saveAsTable("graft_cat_m")
      assert(spark.sql("SELECT count(*) FROM graft_cat_m")
        .head.getLong(0) == 15L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_cat_m")
  }

  test("time travel by name: VERSION AS OF and TIMESTAMP AS OF") {
    val root = scratch("graft_cat_tt")
    spark.range(5).toDF("k").write.format("graft").save(root)
    spark.range(5, 12).toDF("k")
      .write.format("graft").mode("append").save(root)
    spark.sql(s"CREATE TABLE graft_cat_tt USING graft LOCATION '$root'")
    try {
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat_tt VERSION AS OF 1")
        .head.getLong(0) == 5L)
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat_tt VERSION AS OF 2")
        .head.getLong(0) == 12L)
      // a temp view travels too
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_cat_ttv " +
        s"USING graft OPTIONS (path '$root')")
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat_ttv VERSION AS OF 1")
        .head.getLong(0) == 5L)
      // TIMESTAMP AS OF now = latest
      val nowMs = System.currentTimeMillis() + 60000L
      val ts = new java.sql.Timestamp(nowMs).toString
      assert(spark.sql("SELECT count(*) FROM graft_cat_tt " +
        s"TIMESTAMP AS OF '$ts'").head.getLong(0) == 12L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_cat_tt")
  }

  test("governance verbs: DESCRIBE HISTORY, constraints, OPTIMIZE, " +
      "VACUUM - all in SQL") {
    val root = scratch("graft_cat_gov")
    (0 until 4).foreach { i =>
      spark.range(i * 10L, i * 10L + 10).toDF("k")
        .withColumn("v", col("k") * 2L)
        .coalesce(1)
        .write.format("graft").mode("append").save(root)
    }
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_gov " +
      s"USING graft OPTIONS (path '$root')")
    // history: 4 append commits, newest first
    val hist = spark.sql("DESCRIBE HISTORY graft_gov").collect()
    assert(hist.length == 4)
    assert(hist.head.getLong(0) == 4L)
    assert(hist.forall(_.getString(2) == "append"))
    // constraint: violating insert refused, clean insert commits
    spark.sql("ALTER TABLE graft_gov ADD CONSTRAINT v_even " +
      "CHECK (v % 2 = 0)")
    val threw =
      try { spark.sql("INSERT INTO graft_gov VALUES (99, 3)"); false }
      catch { case _: Throwable => true }
    assert(threw, "an odd v must be refused by the SQL-added CHECK")
    spark.sql("INSERT INTO graft_gov VALUES (99, 4)")
    assert(spark.sql("SELECT count(*) FROM graft_gov")
      .head.getLong(0) == 41L)
    spark.sql("ALTER TABLE graft_gov DROP CONSTRAINT v_even")
    assert(Versioned.checkConstraints(root).isEmpty)
    // OPTIMIZE packs the small files into one
    val before = Versioned.files(root).size
    val newV = spark.sql("OPTIMIZE graft_gov").head.getLong(0)
    assert(newV > 0L)
    assert(Versioned.files(root).size < before)
    assert(spark.sql("SELECT count(*) FROM graft_gov")
      .head.getLong(0) == 41L)
    // OPTIMIZE ZORDER BY re-clusters
    spark.sql("OPTIMIZE graft_gov ZORDER BY (k, v)")
    assert(spark.sql("SELECT sum(v) FROM graft_gov").head.getLong(0) ==
      (0L until 40L).map(_ * 2).sum + 4L)
    // VACUUM DRY RUN reports, RETAIN 0 HOURS reclaims retired history
    val dry = spark.sql(s"VACUUM '$root' RETAIN 0 HOURS DRY RUN").head
    assert(dry.getLong(0) > 0L, "dry run must report reclaimable files")
    spark.sql(s"VACUUM '$root' RETAIN 0 HOURS")
    assert(spark.sql("SELECT count(*) FROM graft_gov")
      .head.getLong(0) == 41L, "vacuum must not touch the live version")
    // other statements pass through the delegating parser untouched
    assert(spark.sql("SELECT 1 + 1").head.getInt(0) == 2)
  }

  test("CONVERT TO GRAFT adopts a plain parquet dir by reference; " +
      "hive trees are refused") {
    val root = scratch("graft_cat_conv")
    // a plain parquet dir written by Spark (multiple part files)
    spark.range(100).toDF("k").repartition(4)
      .write.mode("overwrite").parquet(root)
    val v = spark.sql(s"CONVERT TO GRAFT '$root'").head.getLong(0)
    assert(v == 1L)
    assert(spark.read.format("graft").load(root).count() == 100L)
    // adopted files are listed by reference (no data/ staging dir)
    assert(Versioned.files(root).forall(f => !f.contains("/data/")))
    // the full surface applies post-conversion
    Versioned.commitDelete(spark, root,
      org.apache.spark.sql.functions.col("k") < 50L)
    assert(spark.read.format("graft").load(root).count() == 50L)
    assert(spark.read.format("graft").option("versionAsOf", "1")
      .load(root).count() == 100L)
    // double-convert refused; hive-partitioned tree refused
    val again = try { Versioned.convertParquet(spark, root); false }
      catch { case _: IllegalArgumentException => true }
    assert(again, "converting an existing graft table must be refused")
    val hive = scratch("graft_cat_convhive")
    spark.range(100).toDF("k")
      .withColumn("p", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.lit(4L)))
      .write.mode("overwrite").partitionBy("p").parquet(hive)
    val refused = try { Versioned.convertParquet(spark, hive); false }
      catch { case _: IllegalArgumentException => true }
    assert(refused,
      "hive-partitioned trees must be refused (values live in paths)")
  }

  test("RESTORE TABLE and DESCRIBE DETAIL in SQL") {
    val root = scratch("graft_cat_restore")
    spark.range(10).toDF("k").write.format("graft").save(root)
    spark.range(10, 30).toDF("k")
      .write.format("graft").mode("append").save(root)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_cat_r " +
      s"USING graft OPTIONS (path '$root')")
    val d = spark.sql("DESCRIBE DETAIL graft_cat_r").head
    assert(d.getString(0) == root)
    assert(d.getLong(1) == 2L)
    assert(d.getLong(2) > 0L && d.getLong(3) > 0L)
    val v = spark.sql("RESTORE TABLE graft_cat_r TO VERSION AS OF 1")
      .head.getLong(0)
    assert(v == 3L, "restore publishes a NEW auditable version")
    assert(spark.sql("SELECT count(*) FROM graft_cat_r")
      .head.getLong(0) == 10L,
      "the restored view must read version 1's contents")
  }
}
