package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-distribution diagnostics — the "should this key be salted?"
  * report every shuffle-tuning session starts with (see the skew-join
  * salting operator, `operators/Skew.scala`, which CONSUMES this kind
  * of finding). All arithmetic is integer-exact: shares are
  * parts-per-million via BIGINT floor division, never a float percent,
  * so the report is bit-stable across engines and reruns.
  *
  * Scale shape: one map-side-combinable hash-agg to the per-key
  * histogram (state = distinct keys, not rows), then a single global
  * window over that BOUNDED histogram with a rank ≤ K predicate Spark
  * executes as WindowGroupLimit (top-K prune inside each partition
  * before the final single-partition sort sees anything).
  */
object Profile {

  /** Top-K heaviest keys of `keyCol`: (rank, key_val, cnt, share_ppm,
    * cum_ppm) — share and cumulative share of total rows in exact ppm.
    * Deterministic ties: (cnt desc, key asc). */
  def keySkew(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key_val"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    val w = Window.orderBy(col("cnt").desc, col("key_val"))
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum("cnt").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("rank") <= topK)
      .crossJoin(broadcast(total))
      .select(col("rank"), col("key_val"), col("cnt"),
        expr("cnt * 1000000 div total").as("share_ppm"),
        expr("cum * 1000000 div total").as("cum_ppm"))
  }
}
