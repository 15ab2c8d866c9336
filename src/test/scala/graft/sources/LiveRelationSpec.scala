package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.Versioned

/** Round-14 read-path contracts: lazily-resolved snapshots
  * (read-your-writes through long-lived views), DV reads that keep the
  * vectorized file scan, and typed empty-table reads. */
class LiveRelationSpec extends SparkSpec {

  private def scratch(tag: String): String =
    graft.util.TempDirs.scratch(tag)

  test("a USING graft view sees commits made after its creation") {
    val root = scratch("graft_live_view")
    spark.range(10).toDF("k").write.format("graft").save(root)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW glive " +
      s"USING graft OPTIONS (path '$root')")
    assert(spark.sql("SELECT count(*) FROM glive").head.getLong(0) == 10L)
    // read-your-writes: SQL INSERT through the SAME view, then count
    spark.sql("INSERT INTO glive VALUES (100)")
    assert(spark.sql("SELECT count(*) FROM glive").head.getLong(0) == 11L,
      "a view must observe later commits (lazy snapshot resolution)")
    // a Scala-side commit is equally visible
    Versioned.commitAppend(spark.range(200, 203).toDF("k"), root)
    assert(spark.sql("SELECT count(*) FROM glive").head.getLong(0) == 14L)
    // pinned time travel still pins
    assert(spark.read.format("graft").option("versionAsOf", "1")
      .load(root).count() == 10L)
  }

  test("a pre-DV view applies tombstones committed after creation") {
    val root = scratch("graft_live_dv")
    spark.range(100).toDF("k").write.format("graft").save(root)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW glive_dv " +
      s"USING graft OPTIONS (path '$root')")
    assert(spark.sql("SELECT count(*) FROM glive_dv")
      .head.getLong(0) == 100L)
    // an already-ANALYZED Dataset from before the tombstone commit
    val stale = spark.read.format("graft").load(root)
    assert(stale.count() == 100L)
    Versioned.commitDeleteVectors(spark, root, col("k") < 40L)
    // the optimizer-side GraftDvReadRule runs afresh per execution, so
    // view reads AND the pre-DV Dataset both apply the new tombstones
    assert(spark.sql("SELECT count(*) FROM glive_dv")
      .head.getLong(0) == 60L,
      "a view read must observe tombstones committed after creation")
    assert(stale.count() == 60L,
      "a stale pre-DV Dataset must apply later tombstones, never " +
        "resurrect deleted rows")
  }

  test("DV-carrying reads keep the vectorized file scan (native plan)") {
    val root = scratch("graft_live_dvnative")
    spark.range(1000).toDF("k")
      .withColumn("p", col("k") * 7L)
      .write.format("graft").save(root)
    Versioned.commitDeleteVectors(spark, root, col("k") % 10L === 3L)
    val t = spark.read.format("graft").load(root)
    // AQE wraps the join plan; assert on the full plan rendering
    val plan = t.filter(col("k") < 500L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet") &&
      plan.contains("GraftFileIndex"),
      "a DV read must plan a native FileScan over the GraftFileIndex " +
        "(codegen + vectorized parquet), not an opaque RDD scan:\n" +
        plan.take(1500))
    assert(!plan.contains("RowDataSourceScan"),
      "the PrunedFilteredScan fallback must not execute when " +
        "GraftExtensions is installed:\n" + plan.take(1500))
    assert(t.count() == 900L)
    assert(t.filter(col("k") === 13L).count() == 0L)
    assert(t.agg(sum("p")).head.getLong(0) ==
      (0L until 1000L).filterNot(_ % 10 == 3).map(_ * 7).sum)
  }

  test("delete-everything leaves a readable typed empty table") {
    val root = scratch("graft_live_empty")
    spark.range(50).toDF("k").withColumn("s", concat(lit("v"), col("k")))
      .write.format("graft").save(root)
    val v = Versioned.commitDelete(spark, root, lit(true))
    assert(v == 2L, "delete-everything must commit a new version")
    val r = Versioned.read(spark, root)
    assert(r.count() == 0L)
    assert(r.schema.fieldNames.toSeq == Seq("k", "s"))
    val f = spark.read.format("graft").load(root)
    assert(f.count() == 0L)
    assert(f.schema.fieldNames.toSeq == Seq("k", "s"))
    // UPDATE / replaceWhere on the empty state: no-op / plain append
    assert(Versioned.commitUpdate(spark, root, col("k") > 0L,
      Seq("k" -> lit(9L))) == 2L)
    Versioned.commitReplaceWhere(
      spark.range(5).toDF("k").withColumn("s", lit("x")),
      root, col("k") < 100L)
    assert(Versioned.read(spark, root).count() == 5L)
    // and appends keep working after the empty interlude
    Versioned.commitAppend(
      spark.range(100, 103).toDF("k").withColumn("s", lit("y")), root)
    assert(spark.read.format("graft").load(root).count() == 8L)
  }

  test("readStream/writeStream work under the one format name: graft") {
    val in = scratch("graft_live_sin")
    val out = scratch("graft_live_sout")
    val ckpt = scratch("graft_live_ckpt")
    spark.range(10).toDF("k").write.format("graft").save(in)
    val q = spark.readStream.format("graft").load(in)
      .writeStream.format("graft")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.read.format("graft").load(out).count() == 10L)
    // a second commit streams incrementally through the same names
    Versioned.commitAppend(spark.range(10, 15).toDF("k"), in)
    val q2 = spark.readStream.format("graft").load(in)
      .writeStream.format("graft")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    assert(spark.read.format("graft").load(out).count() == 15L)
  }

  test("CREATE TABLE with declared schema reads empty before any commit") {
    val root = scratch("graft_live_declared")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW gdecl (k BIGINT, s STRING) " +
      s"USING graft OPTIONS (path '$root')")
    assert(spark.sql("SELECT * FROM gdecl").count() == 0L)
    spark.sql("INSERT INTO gdecl VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT count(*) FROM gdecl").head.getLong(0) == 2L)
  }
}
