package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental-batch upgrade path from SURVEY §2.7: the same events
  * rollup computed (a) as a batch query and (b) as a file-source
  * streaming query over the identical parquet — results must agree.
  * This is the crawl-frontier pattern: a directory of immutable files
  * consumed incrementally with bounded state. */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming file-source rollup equals the batch result") {
    // the file source wants a directory — stage the table into one
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("part-0.parquet"))
    val src = dir.toString
    val batchDf = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val schema = batchDf.schema

    val expected = batchDf.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("user_id").as("us"))
      .as[(String, Long, Long)].collect().toSet

    val stream = spark.readStream.schema(schema).parquet(src)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("user_id").as("us"))
    val q = stream.writeStream.format("memory")
      .queryName("ev_rollup").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM ev_rollup")
        .as[(String, Long, Long)].collect().toSet
      assert(got === expected)
    } finally q.stop()
  }
}
