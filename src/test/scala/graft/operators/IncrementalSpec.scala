package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = spark.range(10000).select(
    (col("id") % 7).cast("string").as("k"),
    ((col("id") * 37) % 1000 - 200).as("cents"))

  private def state(df: DataFrame) =
    Incremental.aggState(df, Seq("k"), col("cents"))

  private def collectState(df: DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("state(base) merge state(delta) == state(whole)") {
    val whole = collectState(state(rows))
    val merged = collectState(Incremental.mergeState(
      state(rows.filter(col("id") % 3 === 0)),
      state(rows.filter(col("id") % 3 =!= 0)), Seq("k")))
    assert(merged === whole)
  }

  test("merge is associative and order-independent") {
    val parts = Seq(0, 1, 2).map(i => state(rows.filter(col("id") % 3 === i)))
    val leftFold = collectState(parts.reduceLeft(
      Incremental.mergeState(_, _, Seq("k"))))
    val rightFold = collectState(parts.reverse.reduceLeft(
      Incremental.mergeState(_, _, Seq("k"))))
    assert(leftFold === rightFold)
    assert(leftFold === collectState(state(rows)))
  }

  test("keys present only in the delta appear after the merge") {
    val base = state(rows.filter(col("k") =!= "5"))
    val delta = state(rows.filter(col("k") === "5"))
    val merged = collectState(Incremental.mergeState(base, delta, Seq("k")))
    assert(merged.contains("5"))
    assert(merged === collectState(state(rows)))
  }

  test("readout derives the exact average from (n, sum)") {
    val out = Incremental.readout(state(Seq(("a", 100L), ("a", 101L))
        .toDF("k", "cents")))
      .collect().head
    assert(out.getAs[Long]("n") == 2L)
    assert(out.getAs[Long]("sum_cents") == 201L)
    // (201 / 100) / 2 = 1.005 -> 1005000 micros
    assert(out.getAs[Long]("avg_micros") == 1005000L)
  }
}
