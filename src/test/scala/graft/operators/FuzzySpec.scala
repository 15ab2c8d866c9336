package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def pairs(ss: Seq[String]): Set[(String, String)] =
    Fuzzy.editDistance1Pairs(
        ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s"),
        "id", "s")
      .select("name_a", "name_b").as[(String, String)].collect().toSet

  private def brute(ss: Seq[String]): Set[(String, String)] = {
    val xs = ss.zipWithIndex
    (for {
      (a, i) <- xs; (b, j) <- xs if i < j
      if lev(a, b) <= 1
    } yield (a, b)).toSet
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletion neighborhood of 'abc' is {abc, bc, ac, ab}") {
    val ks = spark.sql("SELECT 'abc' AS s")
      .select(Fuzzy.deletionKeys(col("s")).as("k"))
      .as[Seq[String]].collect().head.toSet
    assert(ks == Set("abc", "bc", "ac", "ab"))
  }

  test("matches brute force across substitute/insert/delete/equal/far") {
    val ss = Seq(
      "kitten", "sitten", // substitution
      "kitte", "kittens", // delete / insert vs kitten
      "kitten", // exact duplicate of entry 0
      "sittin", // distance 2 from kitten: must NOT pair with it
      "act", "cat", // transposition = distance 2, must NOT pair
      "", "a", "b", // short strings: "" pairs with both singles
      "xyz") // isolated
    val got = pairs(ss)
    val want = brute(ss)
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    assert(want.contains(("kitten", "sitten")))
    assert(want.contains(("", "a")))
    assert(!want.contains(("act", "cat")))
  }

  test("repeated characters don't duplicate pairs") {
    val df = Seq((1L, "aaa"), (2L, "aa")).toDF("id", "s")
    val rows = Fuzzy.editDistance1Pairs(df, "id", "s").collect()
    assert(rows.length == 1) // one pair, despite 3 shared deletion keys
  }
}
