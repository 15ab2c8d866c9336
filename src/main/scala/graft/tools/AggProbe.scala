package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro A/B: struct-argmax (SortAggregate, interpreted ordering) vs
  * plain long max (HashAggregate) vs two-phase hash argmax, on a
  * synthetic 4M-row (id, lab, cnt) vote table shaped like one LPA /
  * Louvain round. Decides whether the loop bands' per-round argmax is
  * worth restructuring. */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 4000000L
    val votes = spark.range(n).select(
      (col("id") % 600000L).as("id"),
      (col("id") % 97L).as("lab"),
      (col("id") % 13L).as("cnt")).localCheckpoint(true)

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.foreach(_ => ())
        println(f"$tag #$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }

    time("struct-max ") {
      votes.groupBy("id")
        .agg(max(struct(col("cnt"), (-col("lab")).as("nl"))).as("w"))
        .select(col("id"), (-col("w.nl")).as("lab"))
    }
    time("plain-max  ") {
      votes.groupBy("id").agg(max(col("cnt")).as("c"))
    }
    time("two-phase  ") {
      val best = votes.groupBy("id").agg(max(col("cnt")).as("cnt"))
      votes.join(best, Seq("id", "cnt"))
        .groupBy("id").agg(min(col("lab")).as("lab"))
    }
    spark.stop()
  }
}
