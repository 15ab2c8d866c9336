package graft.text

import org.apache.spark.sql.Row

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def rules(texts: (Long, String)*) =
    Quality.gopherRules(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("clean doc passes every rule") {
    val m = rules((1L,
      "the quick brown fox jumps over a lazy dog with plenty of words " +
        "to spare in this sentence"))
    val r = m(1L)
    Seq("r_count", "r_meanlen", "r_alpha", "r_symbol", "r_stop")
      .foreach(c => assert(r.getAs[Int](c) === 1, c))
    assert(r.getAs[Int]("keep") === 1)
  }

  test("short doc fails word count only where expected") {
    val m = rules((1L, "the a to in of and is with"))
    assert(m(1L).getAs[Int]("r_count") === 0) // 8 < 10 tokens
    assert(m(1L).getAs[Int]("r_stop") === 1)
    assert(m(1L).getAs[Int]("keep") === 0)
  }

  test("stopword-free doc fails the stop rule") {
    val m = rules((1L,
      "lorem ipsum dolor sit amet consectetur adipiscing elit sed do " +
        "eiusmod tempor incididunt"))
    assert(m(1L).getAs[Int]("r_stop") === 0)
    assert(m(1L).getAs[Int]("r_alpha") === 1)
    assert(m(1L).getAs[Int]("keep") === 0)
  }

  test("symbol-heavy and numeric docs fail their rules") {
    // 12 tokens, 2 symbol words (> 10%)
    val sym = rules((1L,
      "the a of one two three four five six seven ## ##"))(1L)
    assert(sym.getAs[Int]("r_symbol") === 0)
    // >20% pure-number words fail the alpha rule
    val num = rules((2L,
      "the a of 1 2 3 4 5 6 7 8 9"))(2L)
    assert(num.getAs[Int]("r_alpha") === 0)
  }

  test("mean word length bounds are integer-exact at the boundary") {
    // 10 tokens of length exactly 3 -> sum_len = 30 = 3*n passes (>=)
    val ok = rules((1L, Seq.fill(10)("the").mkString(" ")))(1L)
    assert(ok.getAs[Int]("r_meanlen") === 1)
    // 10 tokens of length 2 -> 20 < 30 fails
    val lo = rules((2L, Seq.fill(10)("ab").mkString(" ")))(2L)
    assert(lo.getAs[Int]("r_meanlen") === 0)
    // one 101-char token in 10 -> mean > 10 fails
    val hi = rules((3L,
      (Seq.fill(9)("abc") :+ ("x" * 101)).mkString(" ")))(3L)
    assert(hi.getAs[Int]("r_meanlen") === 0)
  }

  test("verdicts are pure integer arithmetic (no FP columns)") {
    val df = Quality.gopherRules(Seq((1L, "the a")).toDF("doc_id", "text"))
    df.schema.fields.foreach(f =>
      assert(!f.dataType.typeName.contains("double"), f.name))
  }

  private def rep(texts: (Long, String)*) =
    Quality.repetitionRules(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("repetition rules: duplicated lines trip the line rules, " +
      "varied lines pass") {
    val m = rep(
      (1L, "the same boilerplate line\n" * 5 +
        "one actual content line here"),
      (2L, "first unique line of text\nsecond unique line of text\n" +
        "third unique line entirely"))
    assert(m(1L).getAs[Int]("r_dupline") === 0)
    assert(m(1L).getAs[Int]("r_duplinechar") === 0)
    assert(m(1L).getAs[Int]("keep") === 0)
    assert(m(2L).getAs[Int]("r_dupline") === 1)
    assert(m(2L).getAs[Int]("r_duplinechar") === 1)
  }

  test("repetition rules: a degenerate token loop trips the top-ngram " +
      "rules; varied text passes all") {
    val loop = (1L, ("buy now click here " * 12).trim)
    // long enough that a single n-gram occurrence is a small char
    // fraction (the published rules target page-sized documents)
    val clean = (2L, "a reasonably varied sentence mentions many " +
      "different interesting things and never repeats any phrase " +
      "pattern at all during its span because each clause introduces " +
      "fresh vocabulary while older words return only in new " +
      "combinations keeping every bigram trigram and quadgram unique " +
      "across the whole passage until the closing remark lands")
    val m = rep(loop, clean)
    Seq("r_top2", "r_top3", "r_top4", "r_dupgram").foreach { c =>
      assert(m(1L).getAs[Int](c) === 0, s"loop should fail $c")
      assert(m(2L).getAs[Int](c) === 1, s"clean should pass $c")
    }
    assert(m(1L).getAs[Int]("keep") === 0)
    assert(m(2L).getAs[Int]("keep") === 1)
  }

  test("repetition rules: empty and single-token docs pass vacuously " +
      "(0 <= 0), no nulls leak") {
    val m = rep((1L, ""), (2L, "word"))
    Seq(1L, 2L).foreach { id =>
      Seq("r_dupline", "r_duplinechar", "r_top2", "r_top3", "r_top4",
        "r_dupgram").foreach(c => assert(m(id).getAs[Int](c) === 1,
        s"doc $id rule $c"))
      assert(m(id).getAs[Int]("keep") === 1)
    }
  }
}
