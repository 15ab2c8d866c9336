package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmv estimate lands within 10% of the true distinct count") {
    // 50k distinct keys, each appearing 1-3 times (duplicates must not
    // bias the estimate — KMV dedups by construction).
    val n = 50000
    val df = spark.range(n).select(concat(lit("key-"), col("id")).as("v"))
      .union(spark.range(0, n, 2)
        .select(concat(lit("key-"), col("id")).as("v")))
      .union(spark.range(0, n, 3)
        .select(concat(lit("key-"), col("id")).as("v")))
      .repartition(8)
    val row = Sketches.kmvDistinct(df, col("v"), 1024).collect().head
    assert(row.getAs[Long]("k_used") === 1024L)
    val est = row.getAs[Long]("est_distinct")
    assert(math.abs(est - n).toDouble / n < 0.10,
      s"est=$est true=$n err=${math.abs(est - n).toDouble / n}")
  }

  test("kmv is exact below k distinct values") {
    val df = (1 to 300).map(i => s"v${i % 40}").toDF("v")
    val row = Sketches.kmvDistinct(df, col("v"), 1024).collect().head
    assert(row.getAs[Long]("k_used") === 40L)
    assert(row.getAs[Long]("est_distinct") === 40L)
  }

  test("in-partition duplicates never evict a true top-k member") {
    // one partition, k=4: values [1,2,3,4] then a duplicate of 1 — the
    // old eviction bug would drop 4 on the duplicate's arrival
    val df = Seq("a", "b", "c", "d", "a").toDF("v").coalesce(1)
    val withDups = Sketches.kSmallestHashes(df, col("v"), 4)
      .as[Long].collect().toSet
    val distinctOnly = Sketches.kSmallestHashes(
        Seq("a", "b", "c", "d").toDF("v").coalesce(1), col("v"), 4)
      .as[Long].collect().toSet
    assert(withDups === distinctOnly)
    assert(withDups.size === 4)
  }

  test("kmv is partitioning-invariant (same k smallest hashes)") {
    val base = spark.range(20000).select(col("id").cast("string").as("v"))
    val a = Sketches.kSmallestHashes(base.repartition(2), col("v"), 256)
      .as[Long].collect().toSeq
    val b = Sketches.kSmallestHashes(base.repartition(16), col("v"), 256)
      .as[Long].collect().toSeq
    assert(a === b)
  }

  test("count-min never underestimates and is exact on a sparse corpus") {
    val words = Seq.fill(700)("alpha") ++ Seq.fill(250)("beta") ++
      Seq.fill(50)("gamma") ++ (1 to 500).map(i => s"noise$i")
    val df = scala.util.Random.shuffle(words).toDF("term").repartition(6)
    val est = Sketches.countMinEstimate(df, col("term"),
        Seq("alpha", "beta", "gamma", "absent"), d = 4, w = 2048)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est_cnt")).toMap
    assert(est("alpha") >= 700L && est("alpha") <= 700L + 20L)
    assert(est("beta") >= 250L && est("beta") <= 250L + 20L)
    assert(est("gamma") >= 50L && est("gamma") <= 50L + 20L)
    assert(est("absent") <= 20L) // collisions only
  }

  test("count-min table is bounded at d*w cells and merge-independent") {
    val df = (1 to 5000).map(i => s"t${i % 97}").toDF("term")
    val d = 4; val w = 64
    val t1 = Sketches.countMinTable(df.repartition(3), col("term"), d, w)
    val t2 = Sketches.countMinTable(df.repartition(11), col("term"), d, w)
    assert(t1.count() <= (d * w).toLong)
    val m1 = t1.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val m2 = t2.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m1 === m2)
  }

  test("hll estimate lands within 10% of the true distinct count") {
    // 100k distinct over m=1024 registers: std err ~ 1.04/sqrt(1024) =
    // 3.25%; 10% is a 3-sigma bar. Duplicates must not move a register
    // max.
    val n = 100000
    val df = spark.range(n).select(concat(lit("k-"), col("id")).as("v"))
      .union(spark.range(0, n, 2).select(concat(lit("k-"), col("id")).as("v")))
      .repartition(8)
    val row = Sketches.hllDistinct(df, col("v"), p = 10).collect().head
    val est = row.getAs[Long]("est_micros").toDouble / 1e6
    assert(math.abs(est - n) / n < 0.10, s"est=$est true=$n")
    assert(row.getAs[Long]("nonzero_regs") === 1024L) // saturated
  }

  test("hll small-range path: linear counting on a sparse register set") {
    // 150 distinct << 2.5m with empty registers -> m*ln(m/zeros), which
    // is near-exact at this occupancy.
    val df = (1 to 450).map(i => s"v${i % 150}").toDF("v")
    val row = Sketches.hllDistinct(df, col("v"), p = 10).collect().head
    assert(row.getAs[Long]("zero_regs") > 0L)
    val est = row.getAs[Long]("est_micros").toDouble / 1e6
    assert(math.abs(est - 150) / 150.0 < 0.05, s"est=$est true=150")
  }

  test("hll registers are partitioning-invariant and merge by max") {
    val base = spark.range(30000).select(col("id").cast("string").as("v"))
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, col("v"), p = 8)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = regs(base.repartition(2))
    val b = regs(base.repartition(13))
    assert(a === b)
    assert(a.size === 256) // every register id present
    // Split-merge equals whole: register-wise max of the two halves.
    val left = regs(base.filter(col("id") < 15000))
    val right = regs(base.filter(col("id") >= 15000))
    val merged = a.keys.map(k => k -> math.max(left(k), right(k))).toMap
    assert(merged === a)
  }

  test("kmv jaccard estimates set resemblance from sketches alone") {
    // |A| = |B| = 20000, |A ∩ B| = 10000 -> J = 10000/30000 = 1/3.
    val a = spark.range(0, 20000).select(concat(lit("v"), col("id")).as("v"))
    val b = spark.range(10000, 30000)
      .select(concat(lit("v"), col("id")).as("v"))
    val row = Sketches.kmvJaccard(a, b, col("v"), k = 1024).collect().head
    assert(row.getAs[Long]("k_used") === 1024L)
    val j = row.getAs[Long]("jaccard_micros").toDouble / 1e6
    assert(math.abs(j - 1.0 / 3) < 0.05, s"j=$j") // ~3 sigma at k=1024
    // identical sets -> exactly 1; disjoint sets -> exactly 0
    val same = Sketches.kmvJaccard(a, a, col("v"), 256).collect().head
    assert(same.getAs[Long]("jaccard_micros") === 1000000L)
    val disj = Sketches.kmvJaccard(a,
      spark.range(50000, 70000).select(concat(lit("v"), col("id")).as("v")),
      col("v"), 256).collect().head
    assert(disj.getAs[Long]("jaccard_micros") === 0L)
  }

  test("grouped ddsketch hits the per-group alpha bound independently") {
    // Two groups with disjoint scales: a (1..1000), b (100k..200k).
    val df = spark.range(1, 1001)
      .select(lit("a").as("g"), col("id").cast("double").as("x"))
      .union(spark.range(1, 1001).select(lit("b").as("g"),
        (col("id") * 100 + 100000).cast("double").as("x")))
    val got = Sketches.ddQuantilesGrouped(df, Seq("g"), col("x"),
        alpha = 0.01, pcts = Seq(50, 90))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        r.getLong(3).toDouble / 1e6).toMap
    val truth = Map(("a", 50) -> 500.0, ("a", 90) -> 900.0,
      ("b", 50) -> 150000.0, ("b", 90) -> 190000.0)
    for ((k, want) <- truth)
      assert(math.abs(got(k) - want) / want <= 0.011, s"$k: ${got(k)}")
  }

  test("heavy hitters are exact: no false negatives, no false positives") {
    // Zipf-ish: term t_k appears 2000/k times for k=1..40 — heavy tail
    // plus 5000 singleton terms to give the prune something to drop.
    val heavyRows = (1 to 40).flatMap(k => Seq.fill(2000 / k)(s"t_$k"))
    val df = (heavyRows ++ (1 to 5000).map(i => s"rare_$i")).toDF("v")
      .repartition(7)
    val got = Sketches.heavyHitters(df, col("v"), minCount = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = (1 to 40).filter(k => 2000 / k >= 100)
      .map(k => s"t_$k" -> (2000 / k).toLong).toMap
    assert(got === want) // exact counts, exact membership
  }

  test("heavy hitters with a tiny sketch still lose nothing") {
    // w=16 cells force heavy collisions: false positives explode but
    // the verify pass must still return the exact answer.
    val df = ((1 to 300).map(_ => "hot") ++ (1 to 400).map(i => s"cold_$i"))
      .toDF("v")
    val got = Sketches.heavyHitters(df, col("v"), minCount = 200,
        d = 2, w = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("hot" -> 300L))
  }

  test("ddsketch quantiles honor the alpha relative-error guarantee") {
    // Uniform 1..100000: true p-quantile ~ p * 1000. alpha = 0.01.
    val df = spark.range(1, 100001).select(col("id").cast("double").as("x"))
    val rows = Sketches.ddQuantiles(df, col("x"), 0.01, Seq(10, 50, 90, 99))
      .collect().map(r => r.getInt(0) -> r.getLong(2).toDouble / 1e6).toMap
    for ((p, est) <- rows) {
      val truth = p / 100.0 * 100000.0
      assert(math.abs(est - truth) / truth <= 0.011,
        s"p$p est=$est truth=$truth")
    }
  }

  test("ddsketch table is bounded, mergeable, partition-invariant") {
    val df = spark.range(1, 50001).select((col("id") % 997 + 1)
      .cast("double").as("x"))
    def tbl(d: org.apache.spark.sql.DataFrame) =
      Sketches.ddSketchTable(d, col("x"), 0.01)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = tbl(df)
    assert(whole.size < 800) // log_gamma(997) buckets, not data-scale
    assert(tbl(df.repartition(9)) === whole)
    // additive merge: disjoint halves sum bucket-wise to the whole
    val lo = tbl(df.filter(col("id") <= 25000))
    val hi = tbl(df.filter(col("id") > 25000))
    val merged = (lo.keySet ++ hi.keySet).map(k =>
      k -> (lo.getOrElse(k, 0L) + hi.getOrElse(k, 0L))).toMap
    assert(merged === whole)
    // non-positive values are excluded by the positive-domain contract
    val withJunk = df.union(Seq(-5.0, 0.0).toDF("x"))
    assert(tbl(withJunk) === whole)
  }

  test("grouped hll equals one independent sketch per group") {
    // Three groups with very different cardinalities (100 / 40 / 1:
    // group a's ids are multiples of 3, so id % 300 hits only the 100
    // multiples of 3; the small groups exercise linear counting).
    val df = spark.range(0, 4000).select(
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b")
        .otherwise("c").as("g"),
      when(col("id") % 3 === 0, col("id") % 300)
        .when(col("id") % 3 === 1, col("id") % 40)
        .otherwise(col("id") % 3).cast("string").as("v"))
    val grouped = Sketches.hllDistinctGrouped(df, Seq("g"), col("v"), p = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for (g <- Seq("a", "b", "c")) {
      val solo = Sketches.hllDistinct(
        df.filter(col("g") === g), col("v"), p = 8)
        .collect().head
      assert(grouped(g) == ((solo.getLong(0), solo.getLong(1),
        solo.getLong(2))), s"group $g diverges from its solo sketch")
    }
    // and the estimates are in range of the true cardinalities
    for ((g, truth) <- Seq("a" -> 100.0, "b" -> 40.0, "c" -> 1.0)) {
      val est = grouped(g)._3.toDouble / 1e6
      assert(math.abs(est - truth) / truth < 0.25, s"$g est=$est")
    }
  }

  test("kmv set ops estimate union and intersection from sketches") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    // A = {0..5999}, B = {4000..9999}: union 10000, intersection 2000
    val a = spark.range(0, 6000).select(
      concat(lit("v"), col("id")).as("v"))
    val b = spark.range(4000, 10000).select(
      concat(lit("v"), col("id")).as("v"))
    val r = Sketches.kmvSetOps(a, b, col("v"), k = 1024).collect().head
    val (kUsed, union, inter) =
      (r.getLong(0), r.getLong(2), r.getLong(3).toDouble / 1e6)
    assert(kUsed == 1024L)
    assert(math.abs(union - 10000.0) / 10000.0 < 0.15, s"union=$union")
    assert(math.abs(inter - 2000.0) / 2000.0 < 0.30, s"inter=$inter")
    // exact-below-k path: tiny disjoint sets → exact union, zero inter
    val ta = spark.range(0, 50).select(concat(lit("x"), col("id")).as("v"))
    val tb = spark.range(50, 80).select(concat(lit("x"), col("id")).as("v"))
    val t = Sketches.kmvSetOps(ta, tb, col("v"), k = 1024).collect().head
    assert(t.getLong(2) == 80L && t.getLong(3) == 0L && t.getLong(1) == 0L)
  }
}
