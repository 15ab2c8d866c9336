package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = spark.range(20000)
    .select(col("id").cast("string").as("k"),
      (col("id") % 4).cast("string").as("stratum"))

  test("hash sample hits the target rate and is partitioning-stable") {
    val n = Sampling.hashSample(rows.repartition(3), col("k"), 25).count()
    val m = Sampling.hashSample(rows.repartition(17), col("k"), 25).count()
    assert(n === m, "sample must not depend on partitioning")
    assert(math.abs(n - 5000L) < 300, s"25% of 20k expected, got $n")
  }

  test("stratified rates apply per stratum") {
    val sampled = Sampling.stratifiedHashSample(rows, col("k"),
      col("stratum"), rates = Map("0" -> 60), defaultNum = 10)
    val byStratum = sampled.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byStratum("0") - 3000L) < 300, byStratum.toString)
    Seq("1", "2", "3").foreach { st =>
      assert(math.abs(byStratum(st) - 500L) < 150, byStratum.toString)
    }
  }

  test("mixture sample reweights toward the target recipe") {
    // strata sizes: 0 -> 5000, 1..3 -> 5000 each; target 50% stratum 0,
    // 12.5% for 1 and 2, 0 implicit for 3 (dropped) out of budget 4000:
    // expected keeps ~2000 / ~500 / ~500 / 0.
    val mixed = Sampling.mixtureSample(rows, col("k"), col("stratum"),
      targetWeights = Map("0" -> 0.5, "1" -> 0.125, "2" -> 0.125),
      budget = 4000L)
    val by = mixed.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!by.contains("3"), "unweighted stratum must be dropped")
    assert(math.abs(by("0") - 2000L) < 200, by.toString)
    assert(math.abs(by("1") - 500L) < 120, by.toString)
    assert(math.abs(by("2") - 500L) < 120, by.toString)
    // cap at availability: a stratum whose target exceeds its size
    // keeps every row
    val capped = Sampling.mixtureSample(rows, col("k"), col("stratum"),
      targetWeights = Map("0" -> 1.0), budget = 40000L)
    assert(capped.count() === 5000L)
    // partitioning-stable (pure function of the key)
    assert(mixed.count() ===
      Sampling.mixtureSample(rows.repartition(17), col("k"),
        col("stratum"),
        targetWeights = Map("0" -> 0.5, "1" -> 0.125, "2" -> 0.125),
        budget = 4000L).count())
  }

  test("split is group-stable and proportioned 80/10/10") {
    val labeled = rows.withColumn("split",
      Sampling.splitLabel(col("k"), 80, 10))
    val counts = labeled.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 16000L) < 500, counts.toString)
    assert(math.abs(counts("val") - 2000L) < 300, counts.toString)
    assert(math.abs(counts("test") - 2000L) < 300, counts.toString)
    // Same key → same label, even from a differently-built frame.
    val again = spark.range(20000)
      .select(col("id").cast("string").as("k"))
      .repartition(7)
      .withColumn("split2", Sampling.splitLabel(col("k"), 80, 10))
    val joined = labeled.join(again, "k")
      .filter(col("split") =!= col("split2")).count()
    assert(joined === 0L)
  }

  test("sampling does not bias the split (disjoint hash domains)") {
    val sampled = Sampling.hashSample(rows, col("k"), 50)
      .withColumn("split", Sampling.splitLabel(col("k"), 80, 10))
    val counts = sampled.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~10k sampled rows must still split ~80/10/10 — if sample and
    // split shared a hash coordinate, val/test would be empty.
    assert(counts.getOrElse("val", 0L) > 500L, counts.toString)
    assert(counts.getOrElse("test", 0L) > 500L, counts.toString)
  }

  test("weighted sample favors heavy rows and is partitioning-stable") {
    // 5000 rows with weight 1 and 500 with weight 100: at k=300 the
    // heavy minority (50% of total mass from 9% of rows) must dominate.
    val df = spark.range(5500)
      .select(col("id").cast("string").as("k"),
        when(col("id") < 500, lit(100L)).otherwise(lit(1L)).as("w"))
    val picked = Sampling.weightedSample(df, col("k"), col("w"), 300)
    val heavy = picked.filter(col("w") === 100L).count()
    assert(heavy > 150L, s"heavy=$heavy of 300")
    // determinism under repartitioning: identical selection + scores
    val a = picked.select("k", "ws_score_micros")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Sampling.weightedSample(df.repartition(13), col("k"),
        col("w"), 300)
      .select("k", "ws_score_micros")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("weighted sample excludes non-positive weights, is exact under k") {
    val df = Seq(("a", 3L), ("b", 0L), ("c", -1L), ("d", 5L))
      .toDF("k", "w")
    val got = Sampling.weightedSample(df, col("k"), col("w"), 10)
      .select("k").as[String].collect().toSet
    assert(got == Set("a", "d"))
  }

  test("balanced sample takes exactly min(k, n) per group, stably") {
    val df = spark.range(300).select(col("id"),
      when(col("id") % 3 === 0, "big")       // 100 rows
        .when(col("id") % 3 === 1, "mid")    // 100 rows
        .otherwise(lit("tiny")).as("g"))
      .filter(col("g") =!= "tiny" || col("id") < 30) // tiny: 10 rows
    val got = Sampling.balancedSample(df, Seq("g"),
        col("id").cast("string"), k = 40)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("big" -> 40L, "mid" -> 40L, "tiny" -> 10L))
    // partitioning invariance: same rows, same ranks
    val a = Sampling.balancedSample(df, Seq("g"),
        col("id").cast("string"), 40)
      .select("id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sampling.balancedSample(df.repartition(17), Seq("g"),
        col("id").cast("string"), 40)
      .select("id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("shuffle shards: every row exactly once, positions contiguous " +
      "per shard, permutation invariant under repartitioning") {
    val df = spark.range(500).select(col("id"))
    def shuffled(d: org.apache.spark.sql.DataFrame) =
      Sampling.shuffleShards(d, col("id").cast("string"), 8)
        .select("id", "shard", "pos").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    val a = shuffled(df).toMap
    assert(a.size == 500) // every row placed exactly once
    // positions are 1..n within each shard, no gaps or dups
    a.values.groupBy(_._1).foreach { case (_, ps) =>
      val seq = ps.map(_._2).toSeq.sorted
      assert(seq == (1L to seq.size))
    }
    // the permutation is a pure function of the keys
    assert(shuffled(df.repartition(13)).toMap == a)
  }

  test("temperature allocation: exact Hamilton apportionment, budget " +
    "conserved") {
    import spark.implicits._
    // counts a:1, b:4 — quotas at tau=1 are 1.8 / 7.2 → Hamilton 2 / 7
    val df = (Seq.fill(1)("a") ++ Seq.fill(4)("b")).toDF("s")
    def alloc(tau: Double, b: Long) =
      Sampling.temperatureAllocation(df, col("s"), b, tau)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(alloc(1.0, 9L) === Map("a" -> 2L, "b" -> 7L))
    // tau=0.5: x = (1e6, 2e6) → exact thirds, no remainder
    assert(alloc(0.5, 9L) === Map("a" -> 3L, "b" -> 6L))
    // tau=0: uniform flattening (x equal) — 9 = 5 + 4, extra to 'a'
    assert(alloc(0.0, 9L) === Map("a" -> 5L, "b" -> 4L))
  }

  test("temperature allocation: sums to budget and flattens " +
    "monotonically in tau") {
    import spark.implicits._
    val df = (Seq.fill(80)("big") ++ Seq.fill(15)("mid") ++
      Seq.fill(5)("tiny")).toDF("s")
    def alloc(tau: Double) =
      Sampling.temperatureAllocation(df, col("s"), 1000L, tau)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    Seq(0.0, 0.3, 0.5, 0.7, 1.0).foreach { t =>
      assert(alloc(t).values.sum === 1000L, s"tau=$t budget conservation")
    }
    // lower temperature gives the tiny stratum a larger share
    assert(alloc(0.3)("tiny") > alloc(0.7)("tiny"))
    assert(alloc(0.7)("tiny") > alloc(1.0)("tiny"))
    // and the big stratum a smaller one
    assert(alloc(0.3)("big") < alloc(1.0)("big"))
    // partitioning invariance
    val a = Sampling.temperatureAllocation(df.repartition(7), col("s"),
      1000L, 0.5).collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(a === alloc(0.5))
  }
}
