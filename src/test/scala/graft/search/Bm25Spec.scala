package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("bm25 equals the hand-computed formula on a tiny corpus") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),     // dl=4, tf(apple)=2
      (2L, "apple"),                          // dl=1, tf(apple)=1
      (3L, "banana cherry date elderberry fig grape")) // dl=6, no apple
      .toDF("doc_id", "text")
    val got = Search.bm25Scores(docs, Seq("apple"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val n = 3.0; val df = 2.0; val avgdl = (4 + 1 + 6) / 3.0
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def w(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
    assert(math.abs(got(1L) - w(2, 4)) < 1e-12)
    assert(math.abs(got(2L) - w(1, 1)) < 1e-12)
    assert(!got.contains(3L))
  }

  test("bm25 length normalization: short doc beats long doc at equal tf") {
    val docs = Seq(
      (1L, "term alpha"),
      (2L, "term " + (1 to 50).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Search.bm25Scores(docs, Seq("term"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L))
  }
}
