package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Order-independent per-group content checksum — the replica-
    * reconciliation primitive: two sides each fingerprint their copy
    * with ONE aggregation pass and exchange |groups| rows instead of
    * data (drift shows as a (group) whose (n_rows, checksum) differ;
    * re-sync narrows to that group). Row hash = the first 60 bits of
    * md5 over a '|'-joined canonical rendering of the named columns
    * (md5 and integer-cast renderings agree across engines — the q49
    * discipline), XOR-folded per group: commutative, so partition
    * order, shuffle order and engine never matter, and a single
    * flipped row flips the checksum with probability 1 − 2⁻⁶⁰. A
    * second `checksum_modsum` component (modular sum of the hashes)
    * covers XOR's even-multiplicity blind spot.
    *
    * At 100 TB: map-side-combinable agg, output |groups| rows, zero
    * joins — the cheapest possible "are these two tables equal" probe.
    */
  def fingerprint(df: DataFrame, groupCols: Seq[String],
                  contentCols: Seq[Column]): DataFrame = {
    val canonical = concat_ws("|", contentCols: _*)
    val rowHash = conv(substring(md5(canonical), 1, 15), 16, 10)
      .cast("long")
    df.withColumn("__h", rowHash)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        // XOR, not sum: stays BIGINT at any row count (a decimal sum
        // becomes HUGEINT on DuckDB and round-trips differently), and
        // keeps the same commutativity + 1−2⁻⁶⁰ flip sensitivity.
        expr("bit_xor(__h)").as("checksum"),
        // Second, independent component: modular sum of the row hashes.
        // XOR alone is blind to even-multiplicity differences (a row
        // repeated an even number of times cancels itself, so e.g.
        // {A,A,B,B} and {C,C,D,D} xor-collide at equal n_rows); the sum
        // counts multiplicity, so together the pair detects both flip-
        // and duplication-style drift. Decimal(38) accumulator (never
        // overflows below ~10³⁸ rows), reduced mod a prime and cast so
        // the FINAL value is engine-portable BIGINT on both sides
        // regardless of each engine's intermediate sum type.
        (sum(col("__h").cast("decimal(38,0)")) % lit(1000000007L))
          .cast("long").as("checksum_modsum"))
  }
}
