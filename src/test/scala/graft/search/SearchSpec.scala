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

  test("positional phrase matches where contains() cannot (punctuation)") {
    // "join, batch" — the strict analyzer sees tokens [join, batch]
    // adjacent; the padded-contains fast path sees "join," ≠ "join".
    val docs = Seq((1L, "run the join, batch it later"),
      (2L, "join the batch"), (3L, "batch join now"),
      (4L, "join batch")).toDF("doc_id", "text")
    val fast = Search.phraseMatch(docs, "join batch")
      .select("doc_id").as[Long].collect().toSet
    val positional = Search.phraseMatchPositional(docs, "join batch",
        analyzer = graft.text.Analyzer.tokenizeStrict)
      .select("doc_id").as[Long].collect().toSet
    assert(fast === Set(4L)) // misses doc 1: punctuation breaks substring
    assert(positional === Set(1L, 4L)) // the analyzer's view — correct
  }

  test("positional phrase agrees with contains() on a clean corpus") {
    val docs = Seq((1L, "big data engine"), (2L, "big fast data"),
      (3L, "the big data"), (4L, "data big data big data")).toDF("doc_id", "text")
    val fast = Search.phraseMatch(docs, "big data")
      .select("doc_id").as[Long].collect().toSet
    val positional = Search.phraseMatchPositional(docs, "big data")
      .select("doc_id").as[Long].collect().toSet
    assert(positional === fast)
    assert(positional === Set(1L, 3L, 4L))
  }

  test("multi-field search boosts title matches over content matches") {
    // doc 1 has the term in its (short) title, doc 2 only in content;
    // with title weight 2x doc 1 must outrank doc 2.
    val docs = Seq(
      (1L, "quantum leap", "filler body entirely unrelated words"),
      (2L, "plain heading", "quantum appears within the content body"),
      (3L, "no match here", "nothing relevant at all in this one"))
      .toDF("doc_id", "title", "content")
    val ranked = Search.matchScoresFields(docs, Seq("quantum"),
        Seq("title" -> 2.0, "content" -> 1.0))
      .orderBy(desc("score"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    assert(ranked === Seq(1L, 2L))
  }

  test("multi-field bm25 boosts title matches and stays finite") {
    val docs = Seq(
      (1L, "quantum leap", "filler body entirely unrelated words"),
      (2L, "plain heading", "quantum appears within the content body"),
      (3L, "no match here", "nothing relevant at all in this one"))
      .toDF("doc_id", "title", "content")
    val ranked = Search.bm25ScoresFields(docs, Seq("quantum"),
        Seq("title" -> 2.0, "content" -> 1.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranked.keySet === Set(1L, 2L))
    assert(ranked.values.forall(v => v > 0 && !v.isNaN && !v.isInfinite))
    assert(ranked(1L) > ranked(2L)) // 2x title weight dominates
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

  test("rankedTopN: 1-based ranks over (score desc, id), top-k plan") {
    val df = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L))
      .toDF("doc_id", "m")
    val top = Search.rankedTopN(df, "m", 3)
    val ranks = top.select("doc_id", "rank").as[(Long, Int)]
      .collect().toMap
    assert(ranks === Map(2L -> 1, 3L -> 2, 1L -> 3)) // tie 9 → smaller id
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("invertedIndex: df counts docs once, gaps reconstruct sorted ids") {
    val docs = Seq(
      (5L, "alpha beta alpha"), // repeated term counts once for df
      (2L, "alpha"), (9L, "alpha gamma")).toDF("doc_id", "text")
    val idx = Search.invertedIndex(docs)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2))))
      .toMap
    assert(idx("alpha") == ((3L, Seq(2L, 3L, 4L)))) // ids 2,5,9 → gaps
    assert(idx("beta") == ((1L, Seq(5L))))
    assert(idx("gamma") == ((1L, Seq(9L))))
    // gaps prefix-sum back to the sorted posting list
    assert(idx("alpha")._2.scanLeft(0L)(_ + _).tail == Seq(2L, 5L, 9L))
  }

  test("mergeIndexSegments equals a from-scratch index of the union") {
    val old = Seq((2L, "alpha beta"), (5L, "alpha"), (9L, "gamma"))
      .toDF("doc_id", "text")
    val delta = Seq((12L, "alpha delta"), (15L, "delta"))
      .toDF("doc_id", "text") // all ids > old max — the append contract
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2))))
      .toMap
    val merged = m(Search.mergeIndexSegments(
      Search.invertedIndex(old), Search.invertedIndex(delta)))
    val scratch = m(Search.invertedIndex(old.unionByName(delta)))
    assert(merged === scratch)
    // exercises: both-sides term (alpha: junction re-base + tail),
    // old-only (beta, gamma), delta-only (delta: pass-through)
    assert(merged("alpha") == ((3L, Seq(2L, 3L, 7L))))
    assert(merged("delta") == ((2L, Seq(12L, 3L))))
  }

  test("mergeIndexSegments fails loudly when the append contract is violated") {
    // Delta ids BELOW the old segment's ids: the junction gap would go
    // non-positive and silently corrupt the merged posting list, so the
    // merge must raise instead.
    val old = Seq((10L, "alpha"), (20L, "alpha")).toDF("doc_id", "text")
    val delta = Seq((5L, "alpha")).toDF("doc_id", "text")
    val merged = Search.mergeIndexSegments(
      Search.invertedIndex(old), Search.invertedIndex(delta))
    val e = intercept[Exception](merged.collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("mergeIndexSegments")), e.toString)
  }

  test("rrfFuse: reciprocal-rank sum with full-outer id coverage") {
    val a = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val out = Search.rrfFuse(Seq(a, b), k = 60)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 1.0 / 61) < 1e-12)
    assert(math.abs(out(2L) - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(math.abs(out(3L) - 1.0 / 62) < 1e-12)
    // doc in both lists outranks single-list docs at the same ranks
    assert(out(2L) > out(1L) && out(1L) > out(3L))
  }
}
