package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** The canonical Sennrich et al. corpus, as weighted repetitions. */
  private def canonical = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    Seq(words.mkString(" ")).toDF("text")
  }

  test("reproduces the canonical merge sequence (es, est, est</w>)") {
    val merges = Bpe.learnMerges(canonical, "text", numMerges = 3)
    assert(merges.map(m => (m._2, m._3)) ==
      Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
    assert(merges.map(_._4) == Seq(9L, 9L, 9L)) // newest(6) + widest(3)
  }

  test("merge application is leftmost-first and non-overlapping") {
    val df = Seq("aaa aaaa").toDF("text")
    // merge (a, a): "aaa</w>" -> [aa, a, </w>]; "aaaa</w>" -> [aa, aa, </w>]
    val enc = Bpe.encode(df, "text", Seq(("a", "a")))
      .as[(String, Seq[String])].collect().toMap
    assert(enc("aaa") == Seq("aa", "a", "</w>"))
    assert(enc("aaaa") == Seq("aa", "aa", "</w>"))
  }

  test("a freshly-minted token does not back-merge in the same round") {
    // merge (b, a) on "aba": [a, b, a, </w>] -> [a, ba, </w>] — the new
    // 'ba' must not consume the preceding 'a' (that would need a
    // second-round (a, ba) merge).
    val enc = Bpe.encode(Seq("aba").toDF("text"), "text", Seq(("b", "a")))
      .as[(String, Seq[String])].collect().toMap
    assert(enc("aba") == Seq("a", "ba", "</w>"))
  }

  test("encode applies merges in rank order") {
    val enc = Bpe.encode(Seq("lowest").toDF("text"), "text",
        Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")))
      .as[(String, Seq[String])].collect().toMap
    assert(enc("lowest") == Seq("lo", "w", "est</w>"))
  }

  test("ties break to the lexicographically smallest pair") {
    // "xy" x3 and "ab" x3: pairs (x,y)=3, (a,b)=3 (+ </w> pairs at 3):
    // (a,b) < (b,</w>) < (x,y) < (y,</w>) — the winner must be (a, b).
    val m = Bpe.learnMerges(Seq("xy ab xy ab xy ab").toDF("text"),
      "text", numMerges = 1)
    assert((m.head._2, m.head._3) == ("a", "b"))
  }

  test("batched learning matches classic when every top pair chains") {
    // es → est → est</w> all share tokens, so each round's disjoint
    // prefix collapses to one merge — batch=4 must equal classic.
    assert(Bpe.learnMerges(canonical, "text", numMerges = 3, batch = 4) ==
      Bpe.learnMerges(canonical, "text", numMerges = 3))
  }

  test("batched learning takes a disjoint prefix in one round") {
    // (a,b)=6 and (c,d)=4 are token-disjoint and outrank everything, so
    // batch=2 merges both in round 1; the chained tail (abab) still
    // re-ranks with fresh counts — result identical to classic.
    val corpus = Seq((Seq.fill(3)("abab") ++ Seq.fill(2)("cdcd"))
      .mkString(" ")).toDF("text")
    val classic = Bpe.learnMerges(corpus, "text", numMerges = 4)
    // round 3 ties (ab,ab)=3 with (ab,</w>)=3 and '<' sorts below 'a',
    // so the word-final pair wins
    assert(classic.map(m => (m._2, m._3)) ==
      Seq(("a", "b"), ("c", "d"), ("ab", "</w>"), ("ab", "ab</w>")))
    assert(Bpe.learnMerges(corpus, "text", numMerges = 4, batch = 2)
      == classic)
  }

  test("stops early when no pairs remain") {
    // single-char words: after the (x, </w>) merges nothing is left
    val m = Bpe.learnMerges(Seq("a b a").toDF("text"), "text",
      numMerges = 10)
    assert(m.size <= 4)
    assert(m.map(x => (x._2, x._3)).contains(("a", "</w>")))
  }
}
