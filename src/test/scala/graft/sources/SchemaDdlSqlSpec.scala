package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.Versioned

/** Schema DDL through the SQL surface and the `format("graft")`
  * relation: ALTER TABLE ADD/RENAME/DROP COLUMN by name or path, with
  * reads staying native vectorized scans (the mapping is a pure alias
  * projection) and file skipping pushing through the rename. */
class SchemaDdlSqlSpec extends SparkSpec {

  private def scratch(tag: String): String =
    graft.util.TempDirs.scratch(tag)

  test("ALTER TABLE RENAME/ADD/DROP COLUMN on a catalog table: " +
      "reads, DML and DESCRIBE follow the declared names") {
    val root = scratch("graft_sqlddl_cat")
    spark.range(10).toDF("k").withColumn("v", col("k") * 2L)
      .write.format("graft").save(root)
    spark.sql(s"CREATE TABLE graft_sqlddl_t USING graft LOCATION '$root'")
    try {
      spark.sql("ALTER TABLE graft_sqlddl_t RENAME COLUMN v TO value")
      assert(spark.sql("SELECT value FROM graft_sqlddl_t WHERE k = 3")
        .head.getLong(0) == 6L)
      spark.sql("ALTER TABLE graft_sqlddl_t ADD COLUMNS (tag STRING)")
      assert(spark.sql(
        "SELECT count(*) FROM graft_sqlddl_t WHERE tag IS NULL")
        .head.getLong(0) == 10L)
      // DML speaks the new names
      spark.sql("UPDATE graft_sqlddl_t SET tag = 'big' WHERE value >= 10")
      assert(spark.sql(
        "SELECT count(*) FROM graft_sqlddl_t WHERE tag = 'big'")
        .head.getLong(0) == 5L)
      spark.sql("DELETE FROM graft_sqlddl_t WHERE value = 0")
      assert(spark.sql("SELECT count(*) FROM graft_sqlddl_t")
        .head.getLong(0) == 9L)
      spark.sql("INSERT INTO graft_sqlddl_t VALUES (50, 100, 'new')")
      assert(spark.sql(
        "SELECT value FROM graft_sqlddl_t WHERE k = 50")
        .head.getLong(0) == 100L)
      spark.sql("ALTER TABLE graft_sqlddl_t DROP COLUMN tag")
      assert(spark.sql("SELECT * FROM graft_sqlddl_t").columns.toSeq ==
        Seq("k", "value"))
      // catalog stays in step: DESCRIBE shows the declared names
      val described = spark.sql("DESCRIBE TABLE graft_sqlddl_t")
        .select("col_name").collect().map(_.getString(0)).toSeq
      assert(described.contains("value") && !described.contains("v") &&
        !described.contains("tag"), s"catalog schema stale: $described")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sqlddl_t")
  }

  test("a renamed table's format read stays a native vectorized scan " +
      "and still file-skips on the new name") {
    val root = scratch("graft_sqlddl_scan")
    (0 until 3).foreach { i =>
      spark.range(i * 100L, i * 100L + 100L).toDF("id")
        .withColumn("v", col("id") % 7).repartition(1)
        .write.format("graft").mode("append")
        .option("statsCols", "id").save(root)
    }
    Versioned.renameColumn(spark, root, "id", "ident")
    val q = spark.read.format("graft").load(root)
      .filter(col("ident").between(250L, 260L))
    assert(q.count() == 11L)
    val scans = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty,
      "mapped reads must stay native FileSourceScanExec")
    // the filter pushed through the alias projection into the
    // physical attribute => the index admitted ONE of three files
    // (selectedPartitions lists with the scan's own pushed filters)
    val admitted = scans.head.selectedPartitions.totalNumberOfFiles
    assert(admitted == 1L, s"expected 1 admitted file, got $admitted")
  }

  test("SQL DDL by path plus MERGE over the renamed schema") {
    val root = scratch("graft_sqlddl_path")
    spark.range(6).toDF("k").withColumn("n", lit(1L))
      .write.format("graft").save(root)
    spark.sql(s"ALTER TABLE '$root' RENAME COLUMN n TO cnt")
    spark.read.format("graft").load(root)
      .createOrReplaceTempView("graft_sqlddl_v")
    spark.range(4, 8).toDF("k").withColumn("cnt", lit(5L))
      .createOrReplaceTempView("graft_sqlddl_src")
    spark.sql(
      """MERGE INTO graft_sqlddl_v t USING graft_sqlddl_src s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET cnt = s.cnt
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = Versioned.read(spark, root)
    assert(after.count() == 8L)
    assert(after.filter(col("cnt") === 5L).count() == 4L)
  }

  test("DV-carrying mapped table reads correctly (logical anti-join)") {
    val root = scratch("graft_sqlddl_dv")
    spark.range(10).toDF("k").withColumn("v", col("k"))
      .write.format("graft").save(root)
    Versioned.renameColumn(spark, root, "v", "w")
    Versioned.commitDeleteVectors(spark, root, col("w") < 3L)
    val df = spark.read.format("graft").load(root)
    assert(df.columns.toSeq == Seq("k", "w"))
    assert(df.count() == 7L)
    assert(df.filter(col("w") >= 8L).count() == 2L)
  }

  test("time travel by name crosses the rename boundary") {
    val root = scratch("graft_sqlddl_tt")
    spark.range(4).toDF("k").withColumn("v", lit(1L))
      .write.format("graft").save(root) // v1
    Versioned.renameColumn(spark, root, "v", "w") // v2
    spark.sql(s"CREATE TABLE graft_sqlddl_tt USING graft LOCATION '$root'")
    try {
      assert(spark.sql(
        "SELECT * FROM graft_sqlddl_tt VERSION AS OF 1").columns.toSeq
        == Seq("k", "v"))
      assert(spark.sql(
        "SELECT * FROM graft_sqlddl_tt VERSION AS OF 2").columns.toSeq
        == Seq("k", "w"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_sqlddl_tt")
  }
}
