package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) curve clustering —
  * the write-side optimization Delta/Iceberg expose as `ZORDER BY` /
  * `sort_order(zorder(...))`. Interleaving the bits of k sort keys puts
  * rows that are close in EVERY dimension close on the curve, so after
  * a z-sorted write each parquet row-group's min/max stats are tight in
  * all k dimensions at once and a range filter on ANY of them prunes —
  * a plain lexicographic sort gives that only for the leading column.
  *
  * At 100 TB this is the difference between scanning 1/1000th and
  * scanning everything for the non-leading dimension; the z-value is a
  * pure codegen'd integer expression (no UDF), so it rides the write
  * job's existing pass.
  */
object Layout {

  /** Morton/Z-value: interleave the low `bits` bits of each column
    * (non-negative integers; caller buckets/offsets beforehand).
    * Column i's bit b lands at output position `b * k + i` — dimension
    * 0 owns the least-significant lane. k * bits must fit a long
    * (≤ 63). Pure bit arithmetic: one expression, whole-stage codegen,
    * engine-portable (same shifts reproduce in any SQL dialect). */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "at least one dimension")
    require(dims.size * bits <= 63, "z-value must fit in a signed long")
    val k = dims.size
    val terms = for {
      (c, i) <- dims.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * k + i)
    terms.reduce(_ + _)
  }

  /** Cluster `df` for writing: range-partition then sort within
    * partitions by the z-value of `dims` — the standard "optimize
    * layout" pass. The z column is dropped after sorting; the effect
    * lives in the row order the writer sees. */
  def zOrderBy(df: DataFrame, dims: Seq[Column], bits: Int = 16,
               numPartitions: Option[Int] = None): DataFrame = {
    val z = zValue(dims, bits)
    val parted = numPartitions
      .map(n => df.repartitionByRange(n, z))
      .getOrElse(df.repartitionByRange(z))
    parted.sortWithinPartitions(z)
  }
}
