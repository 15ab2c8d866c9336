package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyzerSpec extends SparkSpec {
  import spark.implicits._

  private def tokensOf(s: String): Seq[String] =
    Seq(s).toDF("t").select(Analyzer.tokenize(col("t")))
      .as[Seq[String]].head()

  test("tokenize lowercases and drops empties") {
    assert(tokensOf("  Hello   WORLD  ") === Seq("hello", "world"))
    assert(tokensOf("") === Seq.empty)
    assert(tokensOf("   ") === Seq.empty)
    assert(tokensOf("a\tb\nc") === Seq("a", "b", "c"))
  }

  test("tokenizeStrict splits on non-alphanumerics") {
    val out = Seq("Hello, World! x_1").toDF("t")
      .select(Analyzer.tokenizeStrict(col("t"))).as[Seq[String]].head()
    assert(out === Seq("hello", "world", "x", "1"))
  }

  test("shingles: n-grams in order; short docs yield empty") {
    def sh(s: String, n: Int) = Seq(s).toDF("t")
      .select(Analyzer.shingles(col("t"), n)).as[Seq[String]].head()
    assert(sh("a b c d", 2) === Seq("a b", "b c", "c d"))
    assert(sh("a b c d", 3) === Seq("a b c", "b c d"))
    assert(sh("a b c", 3) === Seq("a b c"))
    assert(sh("a b", 3) === Seq.empty)
    assert(sh("", 2) === Seq.empty)
  }

  test("property: shingle count = max(0, tokens - n + 1) (seeded corpus)") {
    val rnd = new scala.util.Random(42)
    val cases = (0 until 40).map { _ =>
      (0 until rnd.nextInt(8)).map(_ => s"w${rnd.nextInt(5)}")
        .mkString(" ")
    }
    val df = cases.toDF("t")
      .select(size(Analyzer.tokenize(col("t"))).as("n"),
        size(Analyzer.shingles(col("t"), 3)).as("s"))
    df.collect().foreach { r =>
      assert(r.getInt(1) == math.max(0, r.getInt(0) - 2))
    }
  }

  test("tokenCount consistent with tokenize on mixed whitespace") {
    val cases = Seq("", " ", "one", "one two", " padded  out ", "a  b\t c\nd")
    cases.foreach { s =>
      val n = Seq(s).toDF("t")
        .select(Analyzer.tokenCount(col("t"))).as[Int].head()
      assert(n == tokensOf(s).length, s"case '$s'")
    }
  }

}
