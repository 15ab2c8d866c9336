package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Exact

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // Query axis = (1,0,0). Candidates: 1 and 2 are near-clones close to
  // the query; 3 is slightly less relevant but orthogonal to them.
  private lazy val cands = Seq(
    (1L, Seq(1.0f, 0.0f, 0.01f)),
    (2L, Seq(1.0f, 0.0f, 0.02f)),
    (3L, Seq(0.9f, 0.4f, 0.0f))
  ).toDF("vec_id", "embedding")

  private def page(k: Int, lam: Long) = {
    val q = array(lit(1.0f), lit(0.0f), lit(0.0f))
    val withRel = cands.select(col("vec_id"),
      Exact.micros(Similarity.cosine(col("embedding"), q)).as("rel_micros"),
      col("embedding"))
    Mmr.select(spark, withRel, k, lam)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("first pick is pure max-relevance; second pick trades off") {
    val sel = page(k = 2, lam = 500000L)
    assert(sel(0)._2 === 1L) // highest cos to query (ties -> min id)
    // relevance alone would pick 2 next (near-clone); MMR picks 3
    assert(sel(1)._2 === 3L)
  }

  test("lambda = 1 degenerates to plain relevance order") {
    val sel = page(k = 3, lam = 1000000L)
    assert(sel.map(_._2).toSeq === Seq(1L, 2L, 3L))
  }

  test("scores are exact integer micro arithmetic") {
    val q = array(lit(1.0f), lit(0.0f), lit(0.0f))
    val rel = cands.select(col("vec_id"),
        Exact.micros(Similarity.cosine(col("embedding"), q)).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sim13 = cands.as("a").join(cands.as("b"),
        col("a.vec_id") === 3L && col("b.vec_id") === 1L)
      .select(Exact.micros(Similarity.cosine(
        col("a.embedding"), col("b.embedding"))))
      .head().getLong(0)
    val sel = page(k = 2, lam = 500000L)
    assert(sel(0)._3 === 500000L * rel(1L))
    assert(sel(1)._3 === 500000L * rel(3L) - 500000L * sim13)
  }

  test("k larger than the page returns the whole page once") {
    val sel = page(k = 10, lam = 700000L)
    assert(sel.map(_._2).sorted === Seq(1L, 2L, 3L))
    assert(sel.map(_._1).toSeq === Seq(1L, 2L, 3L))
  }
}
