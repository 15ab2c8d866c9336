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
}
