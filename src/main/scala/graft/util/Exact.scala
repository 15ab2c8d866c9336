package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact numeric helpers.
  *
  * The correctness gate hash-compares our results against a DuckDB oracle.
  * Floating-point *sums* are not associative, and Spark (partial aggregation
  * over shuffled partitions) will not accumulate in the same order as DuckDB,
  * so `sum(double)` is not bit-reproducible across engines. The fix: do any
  * per-row floating arithmetic (which IS deterministic — IEEE 754 ops are
  * exactly rounded, identical in both engines), then snap to an integer grid
  * with `floor(x * scale + 0.5)` and sum *integers*, which is exact.
  */
object Exact {
  /** Money-style column → integer hundredths, safe to sum exactly. */
  def cents(c: Column): Column = floor(c * 100d + 0.5d).cast("long")

  /** Score-style column → integer millionths (6 decimal places). */
  def micros(c: Column): Column = floor(c * 1000000d + 0.5d).cast("long")

  /** DuckDB SQL equivalent of [[cents]]. */
  def centsSql(expr: String): String =
    s"CAST(floor(($expr) * 100 + 0.5) AS BIGINT)"

  /** DuckDB SQL equivalent of [[micros]]. */
  def microsSql(expr: String): String =
    s"CAST(floor(($expr) * 1000000 + 0.5) AS BIGINT)"
}
