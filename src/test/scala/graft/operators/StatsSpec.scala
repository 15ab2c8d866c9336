package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def corrs(df: org.apache.spark.sql.DataFrame,
                    ms: Seq[(String, org.apache.spark.sql.Column)]) =
    Stats.corrMatrix(df, ms).collect()
      .map(r => r.getString(0) -> r.getLong(2).toDouble / 1e6).toMap

  test("perfect linear relation gives r = +1 / -1 exactly") {
    val df = spark.range(1, 1001).select(col("id").as("x"),
      (col("id") * 3 + 7).as("y"), (lit(5000) - col("id") * 2).as("z"))
    val m = corrs(df, Seq("x" -> col("x"), "y" -> col("y"),
      "z" -> col("z")))
    assert(m("x~y") == 1.0)
    assert(m("x~z") == -1.0)
    assert(m("y~z") == -1.0)
  }

  test("independent alternation decorrelates") {
    // y cycles 0..9 with period 10, x ascends: corr ~ 0 over full cycles
    val df = spark.range(10000).select(col("id").as("x"),
      (col("id") % 10).as("y"))
    val m = corrs(df, Seq("x" -> col("x"), "y" -> col("y")))
    assert(math.abs(m("x~y")) < 0.001, m.toString)
  }

  test("matches the textbook formula on a small hand case") {
    // x = 1,2,3,4; y = 2,4,5,9: Σxy = 61, so r = (4*61 - 10*20) /
    //   (sqrt(4*30-100) * sqrt(4*126-400)) = 44/sqrt(20*104)
    val df = Seq((1L, 2L), (2L, 4L), (3L, 5L), (4L, 9L)).toDF("x", "y")
    val m = corrs(df, Seq("x" -> col("x"), "y" -> col("y")))
    val want = 44.0 / math.sqrt(20.0 * 104.0)
    assert(math.abs(m("x~y") - want) < 1e-6)
  }

  test("one-pass result is partitioning-invariant (exact sums)") {
    val df = spark.range(5000).select(col("id").as("x"),
      ((col("id") * 7919) % 1000).as("y"))
    val ms = Seq("x" -> col("x"), "y" -> col("y"))
    val a = corrs(df.repartition(17), ms)
    val b = corrs(df.coalesce(1), ms)
    assert(a === b)
  }

  private def decayed(df: org.apache.spark.sql.DataFrame, maxAge: Int) =
    Stats.decayedSum(df, Seq("k"), col("v"), col("age"), maxAge)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("decayed sum halves per age unit, exactly") {
    // maxAge 2: weights 4, 2, 1 for ages 0, 1, 2
    val df = Seq(("a", 10L, 0L), ("a", 10L, 1L), ("a", 10L, 2L),
      ("b", 7L, 0L)).toDF("k", "v", "age")
    val m = decayed(df, maxAge = 2)
    assert(m("a") == ((3L, 10L * 4 + 10L * 2 + 10L * 1)))
    assert(m("b") == ((1L, 28L)))
  }

  test("ages clamp into [0, maxAge]: old rows keep weight 1, future rows cap") {
    val df = Seq(("a", 5L, 99L), ("a", 5L, -3L)).toDF("k", "v", "age")
    val m = decayed(df, maxAge = 3)
    assert(m("a") == ((2L, 5L * 1 + 5L * 8)))
  }

  test("decayed sum is partitioning-invariant (integer weights)") {
    val df = spark.range(4000).select(lit("g").as("k"),
      (col("id") % 97 + 1).as("v"), (col("id") % 45).as("age"))
    assert(decayed(df.repartition(13), 30) == decayed(df.coalesce(1), 30))
  }

  private def zmap(df: org.apache.spark.sql.DataFrame) =
    Stats.zscore(df, Seq("g"), col("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        r.getLong(2)).toMap

  test("z-score matches the integer-moment formula per group") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L), ("b", 30L))
      .toDF("g", "x")
    val m = zmap(df)
    def z(n: Long, sx: Long, sxx: Long, x: Long) =
      math.floor((n * x - sx).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble) * 1e6 + 0.5).toLong
    assert(m(("a", 1L)) == z(3, 6, 14, 1))
    assert(m(("a", 2L)) == 0L)
    assert(m(("a", 3L)) == z(3, 6, 14, 3))
    assert(m(("b", 10L)) == -1000000L) // two points: z = ±1 exactly
    assert(m(("b", 30L)) == 1000000L)
  }

  test("degenerate groups (constant or singleton) standardize to 0") {
    val df = Seq(("c", 5L), ("c", 5L), ("s", 42L)).toDF("g", "x")
    val m = zmap(df)
    assert(m(("c", 5L)) == 0L && m(("s", 42L)) == 0L)
  }

  test("quantile buckets split 1..100 into even quartiles, boundary low") {
    val df = spark.range(1, 101).select(col("id").as("v"))
    val got = Stats.quantileBuckets(df, "v", Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cutoffs: 25.75, 50.5, 75.25 → 25/25/25/25 split
    assert(got.values.groupBy(identity).view.mapValues(_.size).toMap ==
      Map(0L -> 25, 1L -> 25, 2L -> 25, 3L -> 25))
    assert(got(25L) == 0L && got(26L) == 1L) // 25 < 25.75 stays low
    assert(got(100L) == 3L && got(1L) == 0L)
  }

  test("mad outliers flag via modified z-score, degenerate mad flags none") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 5L),
      ("a", 100L),
      // group b: MAD = 0 (constant majority) — nothing may flag, not
      // even the wild 1000
      ("b", 10L), ("b", 10L), ("b", 10L), ("b", 1000L))
      .toDF("g", "x")
    val got = Stats.madOutliers(df, Seq("g"), "x")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        r.getBoolean(4)).toMap
    assert(got(("a", 100L)))
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(v => !got(("a", v))))
    assert(!got(("b", 1000L)) && !got(("b", 10L)))
  }

  test("linear fit recovers an exact line with R²=1") {
    // y = 3x + 7 exactly → slope 3, intercept 7, R² = 1
    val df = spark.range(1, 101).select(lit("g").as("g"),
      col("id").as("x"), (col("id") * 3 + 7).as("y"))
    val r = Stats.linearFit(df, Seq("g"), col("x"), col("y"))
      .collect().head
    assert(r.getLong(1) == 100L)
    assert(r.getLong(2) == 3000000L, "slope")
    assert(r.getLong(3) == 7000000L, "intercept")
    assert(r.getLong(4) == 1000000L, "r2")
  }

  test("linear fit matches the textbook formula on a hand case") {
    // x = 1..4, y = 2,4,5,9: slope = (4·61 − 10·20)/(4·30 − 100) = 2.2,
    // intercept = (20 − 2.2·10)/4 = −0.5, R² = 44²/(20·104) = 0.930769…
    val df = Seq((1L, 2L), (2L, 4L), (3L, 5L), (4L, 9L)).toDF("x", "y")
      .withColumn("g", lit("g"))
    val r = Stats.linearFit(df, Seq("g"), col("x"), col("y"))
      .collect().head
    assert(r.getLong(2) == 2200000L)
    assert(r.getLong(3) == -500000L)
    assert(r.getLong(4) == math.floor(44.0 * 44.0 / (20.0 * 104.0) * 1e6 + 0.5).toLong)
  }

  test("linear fit returns NULLs for zero x-variance groups") {
    val df = Seq(("c", 5L, 1L), ("c", 5L, 2L), ("ok", 1L, 1L),
      ("ok", 2L, 3L)).toDF("g", "x", "y")
    val rows = Stats.linearFit(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("c").isNullAt(2) && rows("c").isNullAt(3) &&
      rows("c").isNullAt(4))
    assert(!rows("ok").isNullAt(2))
  }

  test("entropy: uniform two-way split is ln 2, constant column is 0") {
    val df = Seq(("u", "a"), ("u", "b"), ("u", "a"), ("u", "b"),
      ("k", "x"), ("k", "x"), ("k", "x")).toDF("g", "cat")
    val got = Stats.entropy(df, Seq("g"), col("cat"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // H = −2·micros(0.5·ln 0.5) exactly (per-term snap then sum)
    val half = math.floor(0.5 * math.log(0.5) * 1e6 + 0.5).toLong
    assert(got("u") == (2L, -2L * half))
    assert(got("k") == (1L, 0L))
  }

  test("entropy of a skewed split matches the hand formula") {
    // p = 3/4, 1/4: H = −(0.75 ln 0.75 + 0.25 ln 0.25)
    val df = Seq.fill(3)("a").map(("g", _)) :+ (("g", "b"))
    val got = Stats.entropy(df.toDF("g", "cat"), Seq("g"), col("cat"))
      .collect().head
    val want = -(math.floor(0.75 * math.log(0.75) * 1e6 + 0.5) +
      math.floor(0.25 * math.log(0.25) * 1e6 + 0.5)).toLong
    assert(got.getLong(2) == want)
  }
}
