package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // Skewed fact: key 999 carries ~10% of all rows.
  private lazy val fact = (1 to 5000).map(i =>
      (if (i % 10 == 0) 999L else i.toLong % 50, i.toLong))
    .toDF("k", "v")
  private lazy val dim = (0L to 999L).map(k => (k, s"d$k")).toDF("k", "name")

  test("salted join returns exactly the plain join result") {
    val plain = fact.join(dim, Seq("k"))
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(salted === plain)
  }

  test("salted join actually spreads the hot key across salts") {
    val spread = fact.filter(col("k") === 999L)
    val salts = Skew.saltedJoin(spread, dim, Seq("k"), 8)
      .select(pmod(xxhash64(struct(col("k"), col("v"))), lit(8L)))
      .distinct().count()
    assert(salts > 1, "hot-key rows must land in more than one salt bucket")
  }

  test("two-stage aggregation equals the single-stage aggregate") {
    val plain = fact.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"), max("v").as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val staged = Skew.twoStageAgg(fact, Seq("k"), 8,
        partial = Seq(count(lit(1)).as("pn"), sum("v").as("ps"),
          max("v").as("pm")),
        merge = Seq(sum("pn").as("n"), sum("ps").as("sv"),
          max("pm").as("mx")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(staged === plain)
  }

  test("salting is deterministic across repartitioning") {
    val a = Skew.saltedJoin(fact.repartition(3), dim, Seq("k"), 8)
      .agg(sum("v")).first().getLong(0)
    val b = Skew.saltedJoin(fact.repartition(13), dim, Seq("k"), 8)
      .agg(sum("v")).first().getLong(0)
    assert(a === b)
  }

  test("AQE splits the skewed partition at runtime (skew=true in the " +
    "final plan) — the no-code-change alternative to salting") {
    // one key owns half the fact side; thresholds lowered so the tiny
    // test relation still crosses AQE's skew bar
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val bigFact = spark.range(400000L).select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val bigDim = spark.range(5000L).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val joined = bigFact.join(bigDim, "k")
      // collect THIS DataFrame so its own QueryExecution reaches the
      // final adaptive plan (a .count() would plan separately)
      val n = joined.collect().length.toLong
      assert(n === 200001L + 2499L) // 200k hits on key 0 + odd ids < 5000
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${p.take(3000)}")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
