package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextStats.scrubPii(col("t")))
      .as[String].head()

  test("scrubPii redacts emails and long digit runs, leaves short ones") {
    assert(scrub("mail me at jo.doe+x@sub.example.org today") ===
      "mail me at <email> today")
    assert(scrub("acct 123456789012 and pin 1234") ===
      "acct <num> and pin 1234")
    assert(scrub("two a@b.io b@c.de hits") === "two <email> <email> hits")
  }

  test("scrubPii applies the email rule before the number rule") {
    // the digits inside the address must not survive as a partial match
    assert(scrub("x 123456789work@example.com y") === "x <email> y")
  }

  test("scrubPii is a no-op on clean text") {
    val clean = "just ordinary words and 42 numbers"
    assert(scrub(clean) === clean)
  }

  private def repetition(texts: (Int, String)*):
      Map[Int, (Double, Double, Double)] =
    TextStats.repetitionSignals(
        texts.toSeq.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap

  test("repetitionSignals: hand-computed n-gram fractions") {
    val m = repetition(
      1 -> "a b a b a b",  // 2g: ab,ba,ab,ba,ab  3g: aba,bab,aba,bab
      2 -> "x y z",        // 2g: xy,yz           3g: xyz
      3 -> "w")            // no grams at all
    assert(m(1) === ((3d / 5, 2d / 4, 0d))) // two distinct 5-grams, no dup
    assert(m(2) === ((1d / 2, 1d, 0d)))
    assert(m(3) === ((0d, 0d, 0d))) // short doc reports zeros, not nulls
  }

  test("unigramNll: corpus-frequency model, hand-computed scores") {
    // corpus: a a a b  → p(a)=3/4, p(b)=1/4
    val docs = Seq((1, "a a a"), (2, "b")).toDF("doc_id", "text")
    val out = TextStats.unigramNll(docs)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1) - (-math.log(0.75))) < 1e-12)
    assert(math.abs(out(2) - (-math.log(0.25))) < 1e-12)
    // rarer-token doc scores strictly higher (less in-distribution)
    assert(out(2) > out(1))
  }

  test("unigramNll: empty docs drop; averaging is per-occurrence") {
    val docs = Seq((1, "x y"), (2, "")).toDF("doc_id", "text")
    val scored = TextStats.unigramNll(docs).collect()
    assert(scored.map(_.getInt(0)).toSet === Set(1))
    // both tokens have p=1/2 → nll = ln 2 regardless of mix
    assert(math.abs(scored.head.getDouble(1) - math.log(2)) < 1e-12)
  }

  test("repetitionSignals: duplicate 5-grams in a cyclic doc") {
    // tokens cycle with period 5 → 11 5-grams over 5 distinct values
    val m = repetition(1 -> "p q r s t p q r s t p q r s t")
    val (top2, _, dup5) = m(1)
    assert(dup5 === 6d / 11)
    assert(top2 === 3d / 14) // pq,qr,rs,st appear 3x over 14 bigrams
  }
}
