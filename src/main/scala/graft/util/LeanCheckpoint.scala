// Hosted in a subpackage of org.apache.spark.sql because the seams this
// needs (classic.Dataset.ofRows, execution.LogicalRDD) are private[sql]
// — the same out-of-tree pattern as graftvec. Engine-facing API:
// graft.util.Ckpt.
package org.apache.spark.sql.graftckpt

import org.apache.spark.sql.classic.{DataFrame, Dataset}
import org.apache.spark.sql.execution.LogicalRDD

/** `localCheckpoint` WITHOUT origin-statistics propagation.
  *
  * Spark 4's `Dataset.localCheckpoint` builds its `LogicalRDD` via
  * `fromDataset`, which copies the origin plan's `Statistics` (and
  * constraints) into the checkpoint so downstream planning keeps the
  * estimates (SPARK-42521). For a ONE-shot checkpoint that is strictly
  * better; for an ITERATIVE operator it is a scale trap: round r's
  * plan joins the round-(r−1) checkpoint several times, size-only
  * estimation MULTIPLIES child sizes through joins, and the propagated
  * numbers compound round over round — by round ~10 of a Louvain move
  * schedule the `sizeInBytes` BigIntegers carry 10^5+ digits and the
  * driver burns MINUTES inside `SizeInBytesOnlyStatsPlanVisitor`'s
  * BigInt products (jstack: ToomCook3 multiplication under
  * `InjectRuntimeFilter`), before any task runs. Dropping the origin
  * stats resets every checkpoint to the default leaf estimate, so each
  * round's planning cost is that of ONE round — which is also the
  * honest estimate: after a few self-joins the propagated numbers were
  * astronomically wrong anyway, and a wrong-by-10^500 estimate cannot
  * inform a broadcast decision.
  *
  * Physical `outputPartitioning`/`outputOrdering` are preserved like
  * the stock checkpoint (exchange/sort elision downstream is a
  * correctness-of-plan property, not a statistics one). Lazy, like
  * `localCheckpoint(false)`: blocks materialize at first use. */
object LeanCheckpointBridge {
  def lean(df: DataFrame): DataFrame = {
    val session = df.sparkSession
    val qe = df.queryExecution
    val internalRdd = qe.toRdd.map(_.copy())
    internalRdd.localCheckpoint()
    val partitioning = qe.executedPlan.outputPartitioning match {
      case c: org.apache.spark.sql.catalyst.plans.physical
          .PartitioningCollection => c.partitionings.head
      case p => p
    }
    Dataset.ofRows(session,
      LogicalRDD(qe.analyzed.output, internalRdd, partitioning,
        qe.executedPlan.outputOrdering, isStreaming = false, None)(
        session, None, None))
  }
}
