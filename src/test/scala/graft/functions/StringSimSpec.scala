package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StringSimSpec extends SparkSpec {
  import spark.implicits._

  // Values pinned against DuckDB jaro_winkler_similarity /
  // jaro_similarity (the correctness oracle), probed 2026-08-14.
  private val pinnedJw = Seq(
    ("", "", 0.0),
    ("a", "", 0.0),
    ("abc", "abc", 1.0),
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("abcdef", "fedcba", 0.38888888888888884),
    ("ab", "ba", 0.0),
    ("aaapppp", "ap", 0.7857142857142857),
    ("cd", "abcd", 0.0),
    ("prefix", "prefixxxxlong", 0.8923076923076924),
    ("xxmartha", "xxmarhta", 0.975),
    // boost gated at jaro > 0.7: shared prefix but low jaro stays raw
    ("ax", "abcdefgh", 0.5416666666666666),
    ("abq", "azzzzzzzzz", 0.4777777777777778))

  private val pinnedJaro = Seq(
    ("martha", "marhta", 0.9444444444444445),
    ("dixon", "dicksonx", 0.7666666666666666),
    // odd raw transposition counts floor-divide (t = mismatches / 2)
    ("abcdef", "bcadef", 0.9444444444444445),
    ("abcd", "bcda", 0.8333333333333334),
    ("abcdefgh", "badcfehg", 0.8333333333333334))

  test("JaroWinklerImpl matches DuckDB bit-for-bit on pinned cases") {
    for ((a, b, want) <- pinnedJw) {
      assert(JaroWinklerImpl.jaroWinkler(a, b) == want, s"jw($a, $b)")
      assert(JaroWinklerImpl.jaroWinkler(b, a) == want, s"jw($b, $a)")
    }
    for ((a, b, want) <- pinnedJaro) {
      assert(JaroWinklerImpl.jaro(a, b) == want, s"jaro($a, $b)")
    }
  }

  test("native expression equals the JVM impl row-for-row (codegen path)") {
    val df = pinnedJw.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val rows = df.select(col("a"), col("b"),
        StringFunctions.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect()
    for (r <- rows) {
      val want = JaroWinklerImpl.jaroWinkler(r.getString(0), r.getString(1))
      assert(r.getDouble(2) == want, s"${r.getString(0)}/${r.getString(1)}")
    }
  }

  test("null propagates; expression survives wholestage codegen plan") {
    val df = Seq((Option("abc"), Option.empty[String]),
      (Option.empty[String], Option("x")),
      (Option("ab"), Option("ab"))).toDF("a", "b")
    val out = df.select(
      StringFunctions.jaroWinkler(col("a"), col("b")).as("jw")).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 1.0)
    // Constant inputs fold at optimize time (LocalTableScan above), so
    // assert codegen survival on a parquet-backed plan instead.
    val part = graft.Tables.part(spark, "/root/testdata/sf0.001")
    val q = part.select(StringFunctions
      .jaroWinkler(col("p_name"), lit("red widget")).as("jw"))
    // "*(1) Project [jaro_winkler(...)]" — the star marks the project
    // fused inside a whole-stage-codegen stage.
    assert(q.queryExecution.executedPlan.toString
      .contains("*(1) Project [jaro_winkler"))
    assert(q.filter(col("jw") === 1.0).count() > 0)
  }
}
