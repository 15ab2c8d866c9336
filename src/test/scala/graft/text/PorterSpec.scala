package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Canonical examples from Porter's 1980 paper. */
class PorterSpec extends SparkSpec {
  import spark.implicits._

  test("paper examples stem correctly") {
    val expected = Map(
      "caresses" -> "caress", "ponies" -> "poni", "caress" -> "caress",
      "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre",
      "plastered" -> "plaster", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "falling" -> "fall", "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit",
      "vietnamization" -> "vietnam", "predication" -> "predic",
      "operator" -> "oper", "callousness" -> "callous",
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electrical" -> "electr",
      "hopefulness" -> "hope",
      "revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin",
      "adjustment" -> "adjust", "replacement" -> "replac",
      "adoption" -> "adopt", "probate" -> "probat",
      "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    expected.foreach { case (in, want) =>
      assert(Porter.stem(in) == want, s"stem($in)")
    }
  }

  test("stemAll maps a token column") {
    val out = Seq(Seq("running", "jumps", "easily")).toDF("toks")
      .select(Porter.stemAll(col("toks"))).as[Seq[String]].head()
    assert(out == Seq("run", "jump", "easili"))
  }
}
