package graft.util

import org.apache.spark.sql.DataFrame

/** Scan-width repair for scan-stage-heavy operators. */
object Par {

  /** Round-robin `df` out to the cluster's width WHEN the source plan
    * supplies fewer partitions than cores. A small parquet file with a
    * single row group plans as ONE scan task no matter how many cores
    * are idle (row groups are the split granularity), so an operator
    * that does heavy per-row work in the scan stage — tokenizing,
    * hashing, string formatting — serializes onto 1-3 tasks (measured:
    * q131's 6-way stack+lpad profile burned 7.5 s in one 3-task stage
    * on a 32-core host). The exchange moves the projected rows once
    * and buys full-width parallelism for everything fused above it.
    *
    * Scale posture (guide §2.5/§6): a production-size table scans as
    * thousands of row-group splits, `getNumPartitions >=`
    * `defaultParallelism` holds, and this is the IDENTITY — no
    * exchange is ever added at scale; operators keep their
    * "corpus never shuffles" plan shape exactly where that matters.
    * Keyless round-robin repartition is retry-deterministic (Spark
    * sorts before round-robin, SPARK-23207) and row-set-preserving, so
    * aggregate results are unchanged.
    *
    * Project BEFORE widening: the exchange should carry only the
    * columns the heavy stage needs (guide §2.3). */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Derive the width WITHOUT executing the plan. Under AQE (the
    // default), `queryExecution.toRdd` on a plan containing an
    // exchange materializes every query stage — i.e. it RUNS the whole
    // upstream as real shuffle jobs just to read a partition count,
    // and the `repartition` below would then re-execute it a second
    // time (no exchange reuse across executions). Widening only ever
    // repairs SCAN width (a single-row-group file planning 1-3 tasks),
    // so: if the plan already contains any exchange, AQE owns the
    // post-shuffle width and widen is the identity; only for
    // exchange-free plans is `toRdd` consulted, where it is free (no
    // query stages exist to materialize).
    val hasExchange = df.queryExecution.sparkPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case _ => false
    }
    if (hasExchange) df
    else if (df.queryExecution.toRdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
