package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single latest right row with
  * `rightTs <= leftTs` on the same key. Spark has no native ASOF join;
  * the naive range join explodes to O(|L|·|R|) per key. This is the
  * scalable formulation: tag both sides, union, one window sorted by
  * (key, ts) carrying the last-seen right payload forward — a single
  * shuffle on the key, linear work, no pair blow-up.
  *
  * Tie rule: a right row at exactly `leftTs` matches (>=); among right
  * rows with the same timestamp the one latest in `tieCol` order wins.
  */
object AsOf {

  /** left/right must share `keyCols`; `leftTs`/`rightTs` are the event
    * time columns (any orderable type, typically long). Right payload
    * columns (everything but key+ts) come back null when no right row
    * precedes the left row. */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTs: String, rightTs: String,
           rightPrefix: String = "r_"): DataFrame = {
    val payloadCols = right.columns
      .filterNot(keyCols.contains).filterNot(_ == rightTs).toSeq

    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        payloadCols.map(c => col(c).as(s"$rightPrefix$c")) ++
        Seq(col(rightTs).as(s"$rightPrefix$rightTs")): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"$rightPrefix$c")) ++
        Seq(lit(null).cast(right.schema(rightTs).dataType)
          .as(s"$rightPrefix$rightTs")) ++
        left.columns.filterNot(keyCols.contains).filterNot(_ == leftTs)
          .map(col): _*)

    // right rows sort before left rows at equal ts (__side 0 < 1), so
    // `last(..., ignoreNulls)` over the running frame gives each left
    // row the latest right payload with rightTs <= leftTs.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (s"$rightPrefix$rightTs" +: payloadCols.map(rightPrefix + _))
      .foldLeft(taggedLeft.unionByName(taggedRight,
        allowMissingColumns = true)) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
    carried.filter(col("__side") === 1)
      .withColumnRenamed("__ts", leftTs)
      .drop("__side")
  }
}
