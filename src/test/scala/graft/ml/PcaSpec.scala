package graft.ml

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("gram matrix matches brute-force snapped outer-product sums") {
    val vecs = Seq(
      Seq(1.0f, 0.5f, -0.25f),
      Seq(0.0f, 2.0f, 1.0f),
      Seq(-1.0f, 0.0f, 0.5f))
    val df = vecs.toDF("embedding").repartition(2)
    val got = Pca.gram(df, "embedding", 1000000L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (i <- 0 until 3; j <- 0 until 3) {
      val want = vecs.map(v =>
        math.floor(v(i).toDouble * v(j).toDouble * 1e6 + 0.5).toLong).sum
      assert(got((i.toLong, j.toLong)) === want, s"cell ($i,$j)")
    }
  }

  test("power iteration recovers a dominant planted direction") {
    // Corpus concentrated along e1 with small noise along e2: the
    // leading direction must weight component 0 far above component 1.
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map { _ =>
      val a = 1.0 + rnd.nextDouble()          // strong e1 component
      val b = 0.05 * (rnd.nextDouble() - 0.5) // weak e2 noise
      Seq(a.toFloat, b.toFloat, 0.0f, 0.0f)
    }
    val dir = Pca.leadingDirection(vecs.toDF("embedding"), iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(dir(0L)) === 1000L, s"dominant comp not at scale: $dir")
    assert(math.abs(dir(1L)) < 100L, s"noise comp too large: $dir")
    assert(dir(2L) === 0L && dir(3L) === 0L)
  }

  test("iteration is invariant to partitioning (exact integer sums)") {
    val vecs = (0 until 50).map(i =>
      Seq((i % 5).toFloat / 5f, ((i * 3) % 7).toFloat / 7f, 0.3f))
    val a = Pca.leadingDirection(vecs.toDF("embedding").repartition(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Pca.leadingDirection(vecs.toDF("embedding").repartition(13))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a === b)
  }
}
