package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.Versioned

/** Streaming over schema-DDL (column-mapped) tables, and streams
  * addressed by table NAME: the source declares the LOGICAL schema,
  * every batch shape projects to it, and a rename landing mid-stream
  * fails loudly (Delta's restart-to-adopt contract). */
class StreamDdlSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String) = java.nio.file.Files
    .createTempDirectory(tag).toString

  test("a stream over a renamed table speaks the logical schema in " +
      "snapshot AND delta batches") {
    val root = freshDir("sddl_stream") + "/t"
    val ckpt = freshDir("sddl_stream_ckpt")
    Versioned.commitAppend(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      root)
    Versioned.renameColumn(spark, root, "v", "w")
    val collected =
      scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val df = spark.readStream
      .format("graft.sources.VersionedStream").option("root", root)
      .load()
    assert(df.schema.fieldNames.toSeq == Seq("k", "w"),
      "the source must declare the LOGICAL schema")
    val q = df.writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.select("k", "w").as[(Long, Long)].collect()
        collected.synchronized { collected ++= rows }; ()
      }.start()
    try {
      q.processAllAvailable()
      // a post-rename append in the new name arrives as a delta
      Versioned.commitAppend(Seq((3L, 30L)).toDF("k", "w"), root)
      q.processAllAvailable()
    } finally q.stop()
    assert(collected.sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("a paced snapshot stream projects each slice to the logical " +
      "schema") {
    val root = freshDir("sddl_paced") + "/t"
    val ckpt = freshDir("sddl_paced_ckpt")
    (0 until 3).foreach { i =>
      Versioned.commitAppend(
        Seq((i * 10L, i.toLong)).toDF("k", "v").repartition(1), root)
    }
    Versioned.renameColumn(spark, root, "v", "val")
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream
      .format("graft.sources.VersionedStream").option("root", root)
      .option("maxFilesPerBatch", "1").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.select("val").as[Long].collect()
        seen.synchronized { seen ++= rows }; ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(seen.sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("a rename landing mid-stream fails the query loudly (restart " +
      "adopts the new schema)") {
    val root = freshDir("sddl_drift") + "/t"
    val ckpt = freshDir("sddl_drift_ckpt")
    Versioned.commitAppend(Seq((1L, 10L)).toDF("k", "v"), root)
    val q = spark.readStream
      .format("graft.sources.VersionedStream").option("root", root)
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (_: DataFrame, _: Long) => () }.start()
    try {
      q.processAllAvailable()
      Versioned.renameColumn(spark, root, "v", "w")
      Versioned.commitAppend(Seq((2L, 20L)).toDF("k", "w"), root)
      val threw =
        try { q.processAllAvailable(); false }
        catch { case e: Exception =>
          Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null).take(8)
            .exists(_.toString.contains("schema drift"))
        }
      assert(threw, "a mid-stream rename must fail loudly, not " +
        "silently serve old names")
    } finally q.stop()
  }

  test("readStream.table streams a graft catalog table by NAME") {
    val root = freshDir("sddl_byname") + "/t"
    val ckpt = freshDir("sddl_byname_ckpt")
    spark.range(3).toDF("k").write.format("graft").save(root)
    spark.sql(s"CREATE TABLE graft_stream_n USING graft LOCATION '$root'")
    try {
      val seen = scala.collection.mutable.ArrayBuffer[Long]()
      val q = spark.readStream.table("graft_stream_n")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = b.select("k").as[Long].collect()
          seen.synchronized { seen ++= rows }; ()
        }.start()
      try {
        q.processAllAvailable()
        spark.sql("INSERT INTO graft_stream_n VALUES (100)")
        q.processAllAvailable()
      } finally q.stop()
      assert(seen.sorted.toSeq == Seq(0L, 1L, 2L, 100L))
    } finally spark.sql("DROP TABLE IF EXISTS graft_stream_n")
  }

  test("writeStream.toTable sinks into a graft catalog table by NAME") {
    val srcRoot = freshDir("sddl_sink_src") + "/t"
    val dstRoot = freshDir("sddl_sink_dst") + "/t"
    val ckpt = freshDir("sddl_sink_ckpt")
    spark.range(4).toDF("k").write.format("graft").save(srcRoot)
    spark.sql(
      s"CREATE TABLE graft_sink_n (k BIGINT) USING graft " +
        s"LOCATION '$dstRoot'")
    try {
      val q = spark.readStream
        .format("graft").option("path", srcRoot).load()
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .toTable("graft_sink_n")
      try q.processAllAvailable() finally q.stop()
      assert(spark.sql("SELECT count(*) FROM graft_sink_n")
        .head.getLong(0) == 4L)
      assert(Versioned.read(spark, dstRoot).count() == 4L,
        "the sink must commit through the manifest protocol")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sink_n")
  }
}
