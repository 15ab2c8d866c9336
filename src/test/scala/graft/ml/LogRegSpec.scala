package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LogRegSpec extends SparkSpec {
  import spark.implicits._

  // Linearly separable in x1 (micros): positives high, negatives low.
  private lazy val toy = Seq(
    (1L, 1L, 900000L), (2L, 1L, 800000L), (3L, 1L, 700000L),
    (4L, 0L, 200000L), (5L, 0L, 100000L), (6L, 0L, 300000L)
  ).toDF("id", "y", "x1")

  test("descent separates a separable toy set") {
    val w = LogReg.fit(toy, Seq("x1"), "y", iters = 10, lr = 2.0)
    val p = toy.select(col("id"),
        LogReg.probMicros(w, Seq("x1")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).map(p).min > Seq(4L, 5L, 6L).map(p).max)
    assert(p(1L) > 500000L && p(5L) < 500000L)
  }

  test("w=0 probability is exactly 500000 micros") {
    val p = toy.select(LogReg.probMicros(Array(0L, 0L), Seq("x1")).as("p"))
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(p === Seq(500000L))
  }

  test("first iteration matches the hand-computed integer gradient") {
    // At w=0: r = 500000 - y*1e6. G_1 = sum(r * x1).
    val rows = Seq((1L, 900000L), (1L, 800000L), (1L, 700000L),
      (0L, 200000L), (0L, 100000L), (0L, 300000L))
    val g1 = rows.map { case (y, x) => (500000L - y * 1000000L) * x }.sum
    val g0 = rows.map { case (y, _) => (500000L - y * 1000000L) * 1000000L }
      .sum
    val n = rows.size
    val expW = Array(
      0L - math.floor(1.0 * g0.toDouble / (n * 1.0e6) + 0.5).toLong,
      0L - math.floor(1.0 * g1.toDouble / (n * 1.0e6) + 0.5).toLong)
    val w = LogReg.fit(toy, Seq("x1"), "y", iters = 1, lr = 1.0)
    assert(w.toSeq === expW.toSeq)
  }

  test("fit is deterministic across runs and partitionings") {
    val a = LogReg.fit(toy, Seq("x1"), "y", iters = 5, lr = 1.0)
    val b = LogReg.fit(toy.repartition(7), Seq("x1"), "y",
      iters = 5, lr = 1.0)
    assert(a.toSeq === b.toSeq)
  }
}
