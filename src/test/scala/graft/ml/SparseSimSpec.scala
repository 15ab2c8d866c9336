package graft.ml

import graft.SparkSpec

class SparseSimSpec extends SparkSpec {
  import spark.implicits._

  // 6 docs; "the" appears in all (hub term when maxDf < 6).
  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "the quick brown fox"),      // identical to 1
    (3L, "the lazy dog sleeps"),
    (4L, "the lazy dog runs"),        // shares lazy+dog with 3
    (5L, "the solitary unicorn"),     // shares ONLY the hub term
    (6L, "the quick dog")             // bridges both clusters
  ).toDF("doc_id", "text")

  private def pairs(maxDf: Long, minCosMicros: Long = 0L) =
    SparseSim.tfidfCosinePairs(docs, maxDf, minCosMicros)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap

  test("identical documents score cosine ~ 1") {
    val m = pairs(maxDf = 5)
    val (shared, cos) = m((1L, 2L))
    assert(shared == 3) // quick, brown, fox — hub 'the' excluded
    assert(math.abs(cos - 1.0) < 1e-5, s"cos=$cos")
  }

  test("hub terms never generate candidate pairs") {
    val m = pairs(maxDf = 5) // 'the' has df=6 > 5
    assert(!m.keySet.exists { case (a, b) => a == 5L || b == 5L },
      "doc 5 shares only the hub term — must appear in no pair")
  }

  test("scores match a brute-force computation of the same contract") {
    val maxDf = 5L
    val tok = Map(
      1L -> Seq("the", "quick", "brown", "fox"),
      2L -> Seq("the", "quick", "brown", "fox"),
      3L -> Seq("the", "lazy", "dog", "sleeps"),
      4L -> Seq("the", "lazy", "dog", "runs"),
      5L -> Seq("the", "solitary", "unicorn"),
      6L -> Seq("the", "quick", "dog"))
    val n = tok.size.toDouble
    val dfm = tok.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    def micros(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    def w(id: Long) = tok(id).groupBy(identity).map { case (t, xs) =>
      t -> xs.size * math.log(n / dfm(t)) }
    def norm(id: Long) = math.sqrt(
      w(id).values.map(x => micros(x * x)).sum.toDouble / 1e6)
    def cos(a: Long, b: Long): Double = {
      val (wa, wb) = (w(a), w(b))
      // .toSeq: mapping over the Set would DEDUPLICATE equal products
      val dot = wa.keySet.intersect(wb.keySet).toSeq
        .filter(t => dfm(t) <= maxDf)
        .map(t => micros(wa(t) * wb(t))).sum
      (dot.toDouble / 1e6) / (norm(a) * norm(b))
    }
    val m = pairs(maxDf)
    for (((a, b), (_, got)) <- m)
      assert(micros(got) == micros(cos(a, b)), s"pair ($a,$b)")
    // and the candidate set is exactly the pairs sharing a non-hub term
    val expected = (for {
      a <- tok.keys; b <- tok.keys if a < b
      if tok(a).toSet.intersect(tok(b).toSet)
        .exists(t => dfm(t) <= maxDf && dfm(t) >= 2)
    } yield (a, b)).toSet
    assert(m.keySet == expected)
  }

  test("threshold keeps only pairs at or above minCosMicros") {
    val all = pairs(maxDf = 5)
    val thr = 500000L
    val kept = pairs(maxDf = 5, minCosMicros = thr)
    assert(kept.keySet ==
      all.filter { case (_, (_, c)) =>
        math.floor(c * 1e6 + 0.5).toLong >= thr }.keySet)
  }
}
