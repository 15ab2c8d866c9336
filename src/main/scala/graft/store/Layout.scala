package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data skipping.
  *
  * A single-column sort gives parquet min/max pruning on that column
  * only; sorting by the bit-interleaved Z-value of two dimensions makes
  * row groups contiguous in BOTH, so range predicates on EITHER
  * dimension skip most row groups (the Delta/Iceberg OPTIMIZE ZORDER
  * layout, from Morton 1966). At 100 TB this is the difference between
  * scanning a full fact table and reading a few percent of it for
  * point-in-range queries on a second dimension.
  *
  * [[zValue2]] is pure builtin composition (bitwiseAND/OR + shiftleft
  * fold — the classic mask-spread), so it stays inside whole-stage
  * codegen with no custom expression; the identical arithmetic is
  * SQL-expressible for the oracle (q194).
  */
object Layout {

  // bit-spread masks: x (31 bits) → even bit positions of a 62-bit word
  private val steps = Seq(
    16 -> 281470681808895L,    // 0x0000FFFF0000FFFF
    8 -> 71777214294589695L,   // 0x00FF00FF00FF00FF
    4 -> 1085102592571150095L, // 0x0F0F0F0F0F0F0F0F
    2 -> 3689348814741910323L, // 0x3333333333333333
    1 -> 6148914691236517205L) // 0x5555555555555555

  private def spread(c: Column): Column =
    steps.foldLeft(c.bitwiseAND(lit(2147483647L))) {
      case (acc, (sh, m)) =>
        acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(m))
    }

  /** Morton Z-value of two non-negative integral columns (low 31 bits
    * each): x on even bits, y on odd bits. Monotone per dimension when
    * the other is fixed — the property pruning relies on. */
  def zValue2(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Morton Z-value of k ≥ 2 non-negative integral columns: column j
    * contributes its low ⌊63/k⌋ bits to positions i·k + j. Values must
    * be pre-scaled into that bit budget (21 bits each for three
    * columns, 15 for four) — the same caveat as [[zValue2]]'s 31 bits,
    * just tighter; a reference-shaped `(src, dst, ts)` link table
    * z-ordered on all three gets file-level skipping on any of the
    * three predicates at once. Built from shift/and/or folds only —
    * ~63 codegen'd integer ops regardless of k, no custom expression,
    * SQL-expressible for oracles. */
  def zValueN(cols: Seq[Column]): Column = {
    val k = cols.size
    require(k >= 2, s"zValueN needs at least 2 columns, got $k")
    val bits = 63 / k
    cols.zipWithIndex.map { case (x, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)),
          i * k + j)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** k-dimensional [[zorder2]]: range-partition and sort by
    * [[zValueN]], helper dropped. */
  def zorderN(df: DataFrame, cols: Seq[Column], nFiles: Int)
      : DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    df.withColumn("__z", zValueN(cols))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** `df` z-clustered on two dimensions as a DataFrame: range-partition
    * and sort by the Z-value, helper column dropped. One output
    * partition = one file when committed through [[Versioned]], so a
    * stats-enabled commit (`Versioned.commitOverwrite(zorder2(df, x, y,
    * n), root, statsCols = Seq(...))`) gets per-FILE min/max intervals
    * that are tight in BOTH dimensions — file-level data skipping
    * ([[Versioned.prunedFiles]]) one layer above the row-group pruning
    * [[zorderWrite]] targets. */
  def zorder2(df: DataFrame, x: Column, y: Column,
              nFiles: Int): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    df.withColumn("__z", zValue2(x, y))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Rewrite `df` z-clustered on two dimensions: range-partition and
    * sort by the Z-value so row groups are tight in both dims, then
    * drop the helper column on write. */
  def zorderWrite(df: DataFrame, x: Column, y: Column, path: String,
                  partitions: Int = 8,
                  rowGroupBytes: Long = 1L << 20): Unit =
    df.withColumn("__z", zValue2(x, y))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
}
