package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the points not dominated by any other
  * — q dominates p when q.min <= p.min, q.max >= p.max, one strictly.
  * The classic multi-criteria "best tradeoff" operator (Börzsönyi 2001,
  * "The Skyline Operator").
  *
  * Scale shape — two-phase distributed pruning, never an all-pairs
  * dominance join:
  *   1. distinct (min, max) pairs, hash-bucketed; per-bucket sort-scan
  *      skyline via a windowed running max (a point dominated inside
  *      ANY subset is dominated globally, so per-bucket filtering is a
  *      safe prune);
  *   2. the surviving candidates — bounded by buckets × |distinct
  *      maximize values| for 2-D — get the same sort-scan globally.
  * Phase 1 is embarrassingly parallel over buckets; phase 2's single
  * partition only ever sees the pruned candidate set.
  */
object Skyline {

  /** Skyline over distinct (minimize, maximize) value pairs.
    *
    * @return (minCol, maxCol) rows on the frontier, one per distinct
    *         surviving pair. */
  def skyline2d(df: DataFrame, minimize: Column, maximize: Column,
                buckets: Int = 32): DataFrame = {
    val pts = df.select(minimize.as("lo"), maximize.as("hi")).distinct()

    // Sort-scan rule on distinct pairs ordered (lo asc, hi desc): a
    // point is dominated iff some earlier point has hi >= its hi.
    def prune(in: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec) =
      in.withColumn("runmax", max(col("hi")).over(
          w.orderBy(col("lo").asc, col("hi").desc)
            .rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("runmax").isNull || col("runmax") < col("hi"))
        .drop("runmax")

    val local = prune(
      pts.withColumn("b", pmod(hash(col("lo")), lit(buckets))),
      Window.partitionBy("b")).drop("b")
    prune(local, Window.partitionBy())
  }
}
