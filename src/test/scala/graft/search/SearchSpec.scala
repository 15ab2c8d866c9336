package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Search conformance in the spirit of `indextest/suite.go:166-311`:
  * a corpus where every 5th doc carries distinctive content; keyword
  * and phrase retrieval return exactly those docs; blended ordering is
  * prior-dominant; offset pagination (incl. offset > total → empty). */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = (0 until 50).map { i =>
    val distinct = if (i % 5 == 0) " unique search keyword here" else ""
    (i.toLong, s"filler words number $i$distinct")
  }.toDF("doc_id", "text")

  test("match search returns exactly the docs containing the terms") {
    val hits = Search.matchScores(corpus, Seq("unique", "keyword"))
      .select("doc_id").as[Long].collect().toSet
    assert(hits === (0 until 50 by 5).map(_.toLong).toSet)
  }

  test("tf-idf scores equal hand-computed values") {
    val tiny = Seq((1L, "apple banana apple"), (2L, "banana"),
      (3L, "cherry")).toDF("doc_id", "text")
    val s = Search.matchScores(tiny, Seq("apple"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // idf = ln(3/1); doc1 tf=2
    assert(math.abs(s(1L) - 2 * math.log(3.0)) < 1e-12)
    assert(!s.contains(2L))
  }

  test("phrase match requires adjacency") {
    val docs = Seq((1L, "big data engine"), (2L, "big fast data"),
      (3L, "the big data")).toDF("doc_id", "text")
    val hits = Search.phraseMatch(docs, "big data")
      .select("doc_id").as[Long].collect().toSet
    assert(hits === Set(1L, 3L))
  }

  test("blend is additive and prior-dominant when scores tie") {
    val scored = Seq((1L, 1.0), (2L, 1.0)).toDF("doc_id", "score")
    val prior = Seq((1L, 0.1), (2L, 0.9)).toDF("doc_id", "pr")
    val top = Search.blend(scored, prior, "doc_id", "pr")
      .orderBy(desc("blended")).select("doc_id").as[Long].head()
    assert(top == 2L)
  }

  test("pagination: window slice and offset beyond total") {
    val df = (1 to 25).map(i => (i.toLong, 100.0 - i))
      .toDF("doc_id", "score")
    val page2 = Search.paginate(df, Seq(col("score").desc), 10, 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(page2 === (11L to 20L))
    val beyond = Search.paginate(df, Seq(col("score").desc), 30, 10)
    assert(beyond.count() == 0L)
  }
}
