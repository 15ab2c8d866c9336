package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval (range) join: pair each point row with every
  * interval row of the same key whose closed [start, end] contains the
  * point — WITHOUT the BroadcastNestedLoopJoin / cartesian plan Spark
  * produces for inequality-only join conditions.
  *
  * Shape: intervals explode into the fixed-width buckets they overlap
  * (`sequence(start div w, end div w)`); a point maps to exactly ONE
  * bucket; the join is then a plain EQUI-join on (key…, bucket)
  * followed by the exact containment filter. Because a point lives in
  * one bucket and an interval covers that bucket at most once, every
  * qualifying (point, interval) pair emerges exactly once — no
  * post-join dedup pass.
  *
  * At 100 TB: a native inequality join is O(|P|·|I|) per key. This is
  * O(|P| + Σᵢ lenᵢ/w + matches) rows through one hash-partitioned
  * exchange on (key…, bucket); the interval replication factor
  * (mean interval length / w) is the only knob, traded against
  * per-bucket candidate density. Both sides shuffle-partition — no
  * broadcast, no nested loop (PlanSpec-asserted on q101).
  *
  * Domain note: bucket ids use integral `div`, which rounds toward
  * zero — point and interval bucketing agree for the non-negative
  * coordinates (epoch timestamps) this is built for.
  */
object RangeJoin {

  /** Inner-join `points` to the containing rows of `intervals`.
    * Output columns: all point columns then all non-key interval
    * columns (callers keep the two column sets disjoint apart from
    * `keys`). Zero-length and inverted intervals (end < start) match
    * nothing and are dropped before the explode (`sequence` would
    * otherwise DESCEND for end < start). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], ptCol: String,
                      startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val ivb = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bucket", explode(sequence(
        expr(s"`$startCol` div $bucketWidth"),
        expr(s"`$endCol` div $bucketWidth"))))
    val pb = points.withColumn("__bucket", expr(s"`$ptCol` div $bucketWidth"))
    pb.join(ivb, keys :+ "__bucket")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }
}
