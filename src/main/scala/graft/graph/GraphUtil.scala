package graft.graph

import org.apache.spark.sql.SparkSession

/** Shared sizing rules for the iterative graph operators. */
object GraphUtil {

  /** Partition count for a cached edge table of `edges` rows: ~128k
    * edges per partition, floored at 4 (so a small graph still gets a
    * little parallelism) and capped at the cluster's parallelism (so a
    * big one scales out to the full width). The per-superstep frames of
    * a loop inherit this count through the co-partitioned join, so at
    * small scale the loop doesn't pay scheduler + codegen-init overhead
    * for dozens of near-empty tasks, and at 100 TB it grows to the
    * cluster. */
  def partitionLaw(edges: Long, spark: SparkSession): Int =
    math.max(4, math.min(spark.sparkContext.defaultParallelism,
      (edges / 128000L).toInt + 1))
}
