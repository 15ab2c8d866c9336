package graft

import org.apache.spark.sql.functions._

/** Partition pruning on a partitionBy-written table: a filter on the
  * partition column must surface as PartitionFilters (directories
  * skipped at planning), not a data filter. */
class PartitionPruningSpec extends SparkSpec {

  test("filter on the partition column prunes directories") {
    val dir = java.nio.file.Files.createTempDirectory("ppart").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val q = spark.read.parquet(dir)
      .filter(col("event_type") === "click")
      .agg(count(lit(1)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      plan.linesIterator.take(12).mkString("\n"))
    // and the pushed data-filter list must NOT carry event_type
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type"))

    val expected = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "click").count()
    assert(q.first().getLong(0) == expected)
  }
}
