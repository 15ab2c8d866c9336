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

  test("bigramTokenNll: interpolated probabilities, hand-computed") {
    // corpus "a b a" + "a b": N=5, cu(a)=3, cu(b)=2;
    // bigrams: (a,b)x2, (b,a)x1 → cp(a)=2, cp(b)=1
    val docs = Seq((1, "a b a"), (2, "a b")).toDF("doc_id", "text")
    val got = TextStats.bigramTokenNll(docs)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(4))
      .toMap
    def nll(p: Double) = -math.log(p)
    val pFirstA = 3.0 / 5                         // doc-initial backoff
    val pBgivenA = 0.75 * (2.0 / 2) + 0.25 * (2.0 / 5)
    val pAgivenB = 0.75 * (1.0 / 1) + 0.25 * (3.0 / 5)
    assert(math.abs(got((1, 0)) - nll(pFirstA)) < 1e-12)
    assert(math.abs(got((1, 1)) - nll(pBgivenA)) < 1e-12)
    assert(math.abs(got((1, 2)) - nll(pAgivenB)) < 1e-12)
    assert(math.abs(got((2, 0)) - nll(pFirstA)) < 1e-12)
    assert(math.abs(got((2, 1)) - nll(pBgivenA)) < 1e-12)
    // the in-distribution bigram scores lower NLL than its unigram term
    assert(got((1, 1)) < nll(2.0 / 5))
  }

  test("keyTerms surfaces group-exclusive vocabulary first") {
    val docs = Seq(
      ("en", "shared shared hello hello hello world"),
      ("de", "shared shared hallo hallo hallo welt")).toDF("lang", "text")
    val got = TextStats.keyTerms(docs, "lang", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2))
      .toMap
    // exclusive high-count terms outrank exclusive low-count and shared
    assert(got(("en", 1L)) == "hello" && got(("en", 2L)) == "world")
    assert(got(("de", 1L)) == "hallo" && got(("de", 2L)) == "welt")
  }

  test("repetitionSignals: duplicate 5-grams in a cyclic doc") {
    // tokens cycle with period 5 → 11 5-grams over 5 distinct values
    val m = repetition(1 -> "p q r s t p q r s t p q r s t")
    val (top2, _, dup5) = m(1)
    assert(dup5 === 6d / 11)
    assert(top2 === 3d / 14) // pq,qr,rs,st appear 3x over 14 bigrams
  }

  test("vocabulary: document-frequency floor counts docs, not occurrences") {
    // 'a' in 3 docs, 'b' in 2 (one doc has it twice — still df 2),
    // 'c' in 1.
    val docs = Seq((1, "a b"), (2, "a b b"), (3, "a c"))
      .toDF("doc_id", "text")
    val v = TextStats.vocabulary(docs, minDf = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v === Map("a" -> 3L, "b" -> 2L))
  }

  test("oovStats: multiplicity counting and broadcast probe") {
    val docs = Seq((1, "a a zz"), (2, "a b")).toDF("doc_id", "text")
    val vocab = Seq("a", "b").toDF("term")
    val out = TextStats.oovStats(docs, vocab)
    val m = out.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(1) == ((3L, 1L))) // 'zz' OOV once, 'a' counts twice
    assert(m(2) == ((2L, 0L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("vocabCoverage: exact integer cumsums, ties to smaller term") {
    // counts: b=3, a=2, c=1; total 6.
    val docs = Seq((1, "b a b"), (2, "b a c")).toDF("doc_id", "text")
    val rows = TextStats.vocabCoverage(docs, topK = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(3)))
    assert(rows.toSeq == Seq((1, "b", 3L), (2, "a", 5L)))
    val plan = TextStats.vocabCoverage(docs, topK = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("collocations: hand-computed PMI, floor filter applied") {
    // unigrams: a=3 b=3 c=1 (N=7); bigrams: (a,b)=3 (b,a)=1 (b,c)=1
    // (M=5) → only (a,b) clears minCount=2:
    // pmi = ln((3·7·7)/(5·3·3)) = ln(147/45)
    val docs = Seq((1, "a b a b c"), (2, "a b")).toDF("doc_id", "text")
    val rows = TextStats.collocations(docs, minCount = 2).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("a", "b", 3L)))
    assert(math.abs(r.getDouble(3) - math.log(147.0 / 45.0)) < 1e-12)
  }

  test("continuationTable: argmax next token with deterministic ties") {
    // contexts: "a b" → c (2x), d (1x); "b c" → a (1x) ties with e (1x)
    // → lexicographically smaller 'a' wins.
    val docs = Seq(
      (1, "a b c a b c"), // "a b"→c twice (pos 0,3), "b c"→a once
      (2, "a b d"),
      (3, "b c e")).toDF("doc_id", "text")
    val m = TextStats.continuationTable(docs, n = 3)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    assert(m("a b") == ((3L, "c", 2L)))
    assert(m("b c") == ((2L, "a", 1L)))
  }

  test("knBigramTokenNll: hand-computed Kneser-Ney on a tiny corpus") {
    // corpus: "a b a b" + "c b" → bigrams: a→b (2), b→a (1), c→b (1)
    // V = 3, D (bigram types) = 3; N1+(·b)=2 (after a, after c),
    // N1+(·a)=1, N1+(·c)=0; pc(b)=(2+1)/6, pc(a)=(1+1)/6, pc(c)=1/6.
    // ctx a: cp=2, n1p=1; ctx b: cp=1, n1p=1; ctx c: cp=1, n1p=1.
    // p(b|a) = (2-.75)/2 + .75*1/2 * 3/6 = 0.625 + 0.1875 = 0.8125
    // p(a|b) = (1-.75)/1 + .75*1/1 * 2/6 = 0.25 + 0.25 = 0.5
    // p(b|c) = (1-.75)/1 + .75*1/1 * 3/6 = 0.25 + 0.375 = 0.625
    // initials: p(a) = pc(a) = 1/3, p(c) = pc(c) = 1/6.
    val docs = Seq((1L, "a b a b"), (2L, "c b")).toDF("doc_id", "text")
    val m = TextStats.knBigramTokenNll(docs)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(4)).toMap
    def nll(p: Double) = -math.log(p)
    assert(math.abs(m((1L, 0)) - nll(1.0 / 3)) < 1e-12)   // initial a
    assert(math.abs(m((1L, 1)) - nll(0.8125)) < 1e-12)    // b | a
    assert(math.abs(m((1L, 2)) - nll(0.5)) < 1e-12)       // a | b
    assert(math.abs(m((1L, 3)) - nll(0.8125)) < 1e-12)    // b | a
    assert(math.abs(m((2L, 0)) - nll(1.0 / 6)) < 1e-12)   // initial c
    assert(math.abs(m((2L, 1)) - nll(0.625)) < 1e-12)     // b | c
  }
}
