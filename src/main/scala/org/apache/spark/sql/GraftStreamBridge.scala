package org.apache.spark.sql

import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Main-source bridge for DSv1 streaming sources: MicroBatchExecution
  * asserts that a `Source.getBatch` DataFrame is flagged
  * `isStreaming = true`, but the flag lives on `private[sql]` leaf
  * nodes — Spark's own FileStreamSource sets it by constructing its
  * LogicalRelation with `isStreaming = true`. Same sanctioned
  * package-seam as [[GraftFunctionBridge]]: re-flag the batch plan's
  * leaves so a source can hand Spark an ordinary planned parquet scan
  * as a micro-batch (pushdown/pruning intact) instead of reimplementing
  * a parquet reader inside a PartitionReader. */
object GraftStreamBridge {

  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val session = cdf.sparkSession
    val plan = cdf.queryExecution.analyzed.transform {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
      case r: LogicalRDD =>
        r.copy(isStreaming = true)(session, None, None)
    }
    org.apache.spark.sql.classic.Dataset.ofRows(cdf.sparkSession, plan)
  }

  /** [[asStreaming]] for batch plans that are MORE than scans: leaf-
    * flagging a plan containing a join/aggregate would make the
    * incremental planner treat it as a STATEFUL streaming join (state
    * stores, watermarks — and a crash, since the "join" is complete
    * within this one batch). Compile the batch plan to its RDD first
    * (codegen, pushdown, broadcast all happen under the BATCH planner)
    * and hand the stream ONE streaming-flagged leaf wrapping it. */
  def asStreamingOpaque(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val node = LogicalRDD.fromDataset(cdf.queryExecution.toRdd, cdf,
      isStreaming = true)
    org.apache.spark.sql.classic.Dataset.ofRows(cdf.sparkSession, node)
  }

  /** Plan → DataFrame seam for commands handed a resolved
    * LogicalPlan (the graft INSERT command): `Dataset.ofRows` is
    * `private[sql]`, this is its sanctioned doorway. */
  def ofRows(session: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical
               .LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)

  /** Expression → Column seam (the classic `ExpressionUtils.column`
    * is `private[sql]`): lets the graft DML commands re-issue a
    * resolved statement predicate as a DataFrame filter. */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The inverse seam, for DSv1 SINKS: the DataFrame handed to
    * `Sink.addBatch` is streaming-flagged, so direct batch actions on
    * it throw "must be executed with writeStream.start()". Re-wrap its
    * executed RDD as a batch frame — the exact move Spark's own
    * ForeachBatchSink makes before handing users their batch view. */
  def asBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val node = LogicalRDD.fromDataset(cdf.queryExecution.toRdd, cdf,
      isStreaming = false)
    org.apache.spark.sql.classic.Dataset.ofRows(cdf.sparkSession, node)
  }
}
