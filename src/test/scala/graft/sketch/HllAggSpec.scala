package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HllAggSpec extends SparkSpec {
  import spark.implicits._

  test("native HLL aggregate is bit-identical to the DataFrame twin") {
    val docs = (1 to 5000).map(i => s"user_${i % 1234}").toDF("u")
    val native = docs
      .agg(graft.functions.SketchFunctions.hllDistinct(col("u")).as("h"))
      .select("h.*").collect().head
    val df = Sketches.hllDistinct(docs, col("u"), p = 10).collect().head
    assert(native.toSeq === df.toSeq)
  }

  test("grouped native HLL merges partial register buffers correctly") {
    // 32 partitions force real partial-aggregation merges
    val rows = (1 to 20000).map(i => (s"g${i % 3}", s"v${i % (500 + i % 3)}"))
    val docs = rows.toDF("g", "v").repartition(32)
    val native = docs.groupBy("g")
      .agg(graft.functions.SketchFunctions.hllDistinct(col("v")).as("h"))
      .select(col("g"), col("h.est_micros")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val twin = Sketches.hllDistinctGrouped(docs, Seq("g"), col("v"), p = 10)
      .select(col("g"), col("est_micros")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(native === twin)
  }

  test("SQL surface: graft_hll_distinct plans the native aggregate") {
    graft.functions.Registry.register(spark)
    Seq("a", "b", "a", "c").toDF("x").createOrReplaceTempView("hll_in")
    val viaSql = spark.sql(
      "SELECT graft_hll_distinct(x).est_micros AS e FROM hll_in")
    assert(viaSql.queryExecution.executedPlan.toString
      .contains("graft_hll_distinct"))
    // 3 distinct values → linear-counting regime, estimate ≈ exact
    val est = viaSql.collect().head.getLong(0)
    assert(math.abs(est - 3000000L) < 10000L, s"est_micros = $est")
  }

  test("native KMV matches the DataFrame twin across forced merges") {
    val rows = (1 to 30000).map(i => s"item_${i % 7321}")
    val docs = rows.toDF("v").repartition(32)
    val native = docs
      .agg(graft.functions.SketchFunctions.kmvDistinct(col("v")).as("h"))
      .select("h.*").collect().head
    val twin = Sketches.kmvDistinct(docs, col("v"), k = 1024)
      .collect().head
    assert(native.toSeq === twin.toSeq)
    // sub-k regime is exact
    val small = (1 to 100).map(i => s"x$i").toDF("v")
    val exact = small.agg(graft.functions.SketchFunctions
        .kmvDistinct(col("v")).as("h"))
      .select("h.k_used", "h.est_distinct").collect().head
    assert(exact.getLong(0) === 100L && exact.getLong(1) === 100L)
  }

  test("native DDSketch matches the DataFrame twin, grouped and merged") {
    val rows = (1 to 20000).map(i =>
      (s"g${i % 3}", (i % 997).toDouble + 0.5))
    val docs = rows.toDF("g", "v").repartition(32)
    val native = docs.groupBy("g")
      .agg(graft.functions.SketchFunctions.ddQuantiles(
        col("v"), alpha = 0.01, pcts = Seq(50, 90, 99)).as("qs"))
      .select(col("g"), explode(col("qs")).as("q"))
      .select(col("g"), col("q.q_pct"), col("q.bucket"),
        col("q.est_micros"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val twin = Sketches.ddQuantilesGrouped(docs, Seq("g"), col("v"),
        alpha = 0.01, pcts = Seq(50, 90, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(native === twin)
  }

  test("native DDSketch estimate is within alpha of the exact quantile") {
    val vals = (1 to 10000).map(_.toDouble)
    val est = vals.toDF("v")
      .agg(graft.functions.SketchFunctions.ddQuantiles(
        col("v"), alpha = 0.01, pcts = Seq(50)).as("qs"))
      .select(explode(col("qs")).as("q")).select("q.est_micros")
      .collect().head.getLong(0) / 1e6
    assert(math.abs(est - 5000.0) / 5000.0 <= 0.01, s"p50 est = $est")
  }

  test("aggregation runs object-hash, not sort-based") {
    val p = Seq(("a", "x")).toDF("g", "v").groupBy("g")
      .agg(graft.functions.SketchFunctions.hllDistinct(col("v")).as("h"))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
  }
}
