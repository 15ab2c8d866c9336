package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Leading principal direction of an embedding corpus via Gram-matrix
  * power iteration — the classic "PCA at scale" decomposition split:
  *
  *  - the DATA-sized work is one `mapPartitions` pass accumulating the
  *    d×d Gram matrix per partition (d² longs in a flat array — BLAS-style
  *    outer-product accumulation, the map-side combine that makes the
  *    shuffle d²-sized instead of n·d²-sized), reduced by an explode+sum;
  *  - the MODEL-sized work (the d×d eigen-iteration) happens on the
  *    collected Gram — d² values, bounded by the schema, never by the
  *    data — exactly where driver-side math belongs.
  *
  * Cross-engine exactness: each per-row product x_i·x_j is IEEE-exact and
  * snapped to an integer grid BEFORE accumulation, so Gram entries are
  * exact integer sums; the iteration rescales by max-|component| using
  * integer division (truncation toward zero — DuckDB `//` matches JVM
  * long division), so every iterate is integer-exact in both engines.
  * Max-norm rescaling preserves the eigen-direction (power iteration is
  * scale-invariant); the eigenvalue can be recovered as a Rayleigh
  * quotient if needed.
  *
  * Uncentered (the leading right singular direction of X, not of X−μ):
  * centering would subtract a float mean per coordinate and break the
  * per-row snap; for near-zero-centered embedding corpora the two
  * directions coincide in practice.
  *
  * Overflow budget (documented, not checked per row): |gram| ≤ n·10⁶ for
  * unit-bounded coordinates; |w| ≤ d·|gram|·scale; `w·scale` must fit a
  * long — holds to n ≈ 10⁹ rows at d=64, scale=1000; beyond that, shrink
  * `prodScale`.
  */
object Pca {

  /** Exact-integer Gram matrix: (i, j, g) with
    * g = Σ_rows floor(x_i·x_j·prodScale + 0.5). d² rows. */
  def gram(emb: DataFrame, vecCol: String, prodScale: Long): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val perPart = emb.select(col(vecCol))
      .as[Seq[Float]]
      .mapPartitions { rows =>
        var acc: Array[Long] = null
        var d = 0
        rows.foreach { v =>
          if (acc == null) { d = v.length; acc = new Array[Long](d * d) }
          val x = v.toArray
          var i = 0
          while (i < d) {
            val xi = x(i).toDouble
            var j = 0
            while (j < d) {
              acc(i * d + j) +=
                math.floor(xi * x(j).toDouble * prodScale + 0.5d).toLong
              j += 1
            }
            i += 1
          }
        }
        if (acc == null) Iterator.empty else Iterator((d, acc.toSeq))
      }
    perPart.toDF("d", "cells")
      .select(col("d"), posexplode(col("cells")).as(Seq("k", "p")))
      .select(expr("CAST(k div d AS BIGINT)").as("i"),
        expr("CAST(k % d AS BIGINT)").as("j"), col("p"))
      .groupBy("i", "j")
      .agg(sum(col("p")).as("g"))
  }

  /** `iters` power-iteration steps from the all-ones vector, max-norm
    * rescaled to ±`scale` each step. Returns (i, comp) — the leading
    * direction's components on the integer grid. */
  def leadingDirection(emb: DataFrame, vecCol: String = "embedding",
                       iters: Int = 4, prodScale: Long = 1000000L,
                       scale: Long = 1000L): DataFrame = {
    val spark = emb.sparkSession
    val cells = gram(emb, vecCol, prodScale).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val d = (cells.map(_._1).max + 1).toInt
    val g = Array.ofDim[Long](d, d)
    cells.foreach { case (i, j, v) => g(i.toInt)(j.toInt) = v }

    var v = Array.fill(d)(scale)
    for (_ <- 0 until iters) {
      val w = Array.tabulate(d) { i =>
        var s = 0L; var j = 0
        while (j < d) { s += g(i)(j) * v(j); j += 1 }
        s
      }
      val m = w.map(math.abs).max
      require(m > 0, "power iteration collapsed to the zero vector")
      v = w.map(x => x * scale / m) // truncating integer division
    }
    import spark.implicits._
    v.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toSeq.toDF("i", "comp")
  }
}
