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
  * The right payload travels as ONE struct through a single
  * `last(..., ignoreNulls)` — all returned right columns always come
  * from the SAME right row, even when some of its payload columns are
  * NULL (per-column carry would stitch fields from different rows).
  *
  * Tie rule: a right row at exactly `leftTs` matches (>=); among right
  * rows sharing (key, rightTs) the window orders by the payload struct
  * itself, so the winner is the one with the largest payload tuple —
  * arbitrary but deterministic (when a payload column is a
  * non-orderable type such as map, the tie falls back to
  * partition-order nondeterminism rather than failing the join).
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

    // The whole right row rides in one struct: ts first (it is non-null
    // on right rows, so last(ignoreNulls) keys on row presence, not on
    // individual payload nullability), then the payload columns.
    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
          struct(col(rightTs).as("__rts") +: payloadCols.map(col): _*)
            .as("__rp")): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        left.columns.filterNot(keyCols.contains).filterNot(_ == leftTs)
          .map(col): _*)

    // right rows sort before left rows at equal ts (__side 0 < 1); the
    // struct as the final sort key makes equal-(key, ts) right rows
    // deterministic — but only orderable payload types can join the
    // ordering (a map-typed payload would make the window throw, and
    // such rows were never orderable to begin with).
    // unionByName fills __rp with NULL on left rows.
    val payloadOrderable = (rightTs +: payloadCols).forall { c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(c).dataType)
    }
    val ordering = Seq(col("__ts"), col("__side")) ++
      (if (payloadOrderable) Seq(col("__rp")) else Nil)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft
      .unionByName(taggedRight, allowMissingColumns = true)
      .withColumn("__rp", last(col("__rp"), ignoreNulls = true).over(w))

    carried.filter(col("__side") === 1)
      .withColumn(s"$rightPrefix$rightTs", col("__rp.__rts"))
      .withColumns(payloadCols.map(c =>
        s"$rightPrefix$c" -> col(s"__rp.$c")).toMap)
      .withColumnRenamed("__ts", leftTs)
      .drop("__side", "__rp")
  }
}
