package graft.dedup

import graft.SparkSpec

/** Randomized cross-check of the MinHash/LSH near-dup pipeline against
  * driver-side exact set arithmetic. Verbatim clones (Jaccard 1.0)
  * share every minhash, hence every band signature — recovering them is
  * deterministic, not probabilistic, so the assertion cannot flake. */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  test("reported jaccard equals exact shingle-set jaccard; clones always found") {
    for (seed <- Seq(2, 13)) {
      val rnd = new scala.util.Random(seed)
      val base = (0 until 30).map { i =>
        val n = 8 + rnd.nextInt(7)
        (i.toLong, (1 to n).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val clones = base.take(5).map { case (i, t) => (i + 1000L, t) }
      val docs = (base ++ clones).toDF("doc_id", "text")

      def shingleSet(t: String): Set[String] =
        t.split("\\s+").toSeq.sliding(2).map(_.mkString(" ")).toSet

      val byId = (base ++ clones).toMap
      val got = Dedup.minHashNearDups(docs, shingleN = 2, numHashes = 12,
          rowsPerBand = 3, threshold = 0.3)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

      // every reported pair's jaccard is the exact set jaccard
      got.foreach { case ((a, b), j) =>
        val (sa, sb) = (shingleSet(byId(a)), shingleSet(byId(b)))
        val exact = (sa & sb).size.toDouble / (sa | sb).size.toDouble
        assert(math.abs(j - exact) < 1e-12, s"seed=$seed pair=($a,$b)")
        assert(j >= 0.3)
      }
      // every verbatim clone pair is present with jaccard 1.0
      (0 until 5).foreach { i =>
        val key = (i.toLong, i + 1000L)
        assert(got.get(key).exists(_ == 1.0),
          s"seed=$seed clone pair $key missing or != 1.0 (got ${got.get(key)})")
      }
    }
  }
}
