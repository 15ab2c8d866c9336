package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("matches brute-force order statistics on a known distribution") {
    // 1..1000 shuffled deterministically across partitions
    val df = spark.range(1, 1001).select(
      ((col("id") * 389L) % 1000L + 1L).as("v")).repartition(7)
    val got = Quantiles.exact(df, col("v"),
        Seq("p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99, "max" -> 1.0),
        buckets = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // values are a permutation of 1..1000, so rank k holds value k
    assert(got("p25") === (250L, 250L))
    assert(got("p50") === (500L, 500L))
    assert(got("p99") === (990L, 990L))
    assert(got("max") === (1000L, 1000L))
  }

  test("exact under heavy ties and a single hot bucket") {
    val df = Seq.fill(500)(7L).++(Seq.fill(300)(9L)).++(Seq.fill(200)(11L))
      .toDF("v").repartition(5)
    val got = Quantiles.exact(df, col("v"),
        Seq("p50" -> 0.5, "p60" -> 0.6, "p90" -> 0.9), buckets = 4)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("p50") === 7L)  // rank 500 of [7×500, 9×300, 11×200]
    assert(got("p60") === 9L)  // rank 600
    assert(got("p90") === 11L) // rank 900
  }

  test("grouped variant matches per-group brute-force order statistics") {
    // gcd(7,300)=1, so each group holds a full permutation of 1..300
    val df = (for (g <- 0 until 3; i <- 1 to 300)
        yield (s"g$g", ((i * 7) % 300 + 1).toLong))
      .toDF("grp", "v").repartition(6)
    val got = Quantiles.exactByGroup(df, "grp", col("v"),
        Seq("p10" -> 0.1, "p50" -> 0.5, "max" -> 1.0), buckets = 8)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      assert(got((g, "p10")) === 30L)
      assert(got((g, "p50")) === 150L)
      assert(got((g, "max")) === 300L)
    }
  }

  test("histogram pass aggregates before collect; final take is bounded") {
    // The plan for pass 2 must be a hash aggregate over ≤buckets rows,
    // not a sort; the pass-3 fragment must plan a limit (TakeOrdered).
    val df = spark.range(0, 10000).select(col("id").as("v"))
    val out = Quantiles.exact(df, col("v"), Seq("p50" -> 0.5), buckets = 64)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") || plan.contains("Limit"),
      s"expected a bounded take in:\n$plan")
    assert(out.collect().head.getLong(2) === 4999L) // rank 5000 of 0..9999
  }
}
