package graft.util

import org.apache.spark.sql.DataFrame

/** Checkpoint utilities for iterative operators. */
object Ckpt {
  /** Lazy local checkpoint WITHOUT origin-statistics propagation — use
    * this instead of `df.localCheckpoint(false)` inside iterative
    * loops, where Spark 4's stats propagation compounds size estimates
    * multiplicatively across rounds until driver-side planning chokes
    * on astronomically large BigIntegers (see
    * [[org.apache.spark.sql.graftckpt.LeanCheckpointBridge]]). */
  def lean(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftckpt.LeanCheckpointBridge.lean(
      df.asInstanceOf[org.apache.spark.sql.classic.DataFrame])
}
