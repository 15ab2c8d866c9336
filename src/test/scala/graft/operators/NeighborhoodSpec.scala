package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking: global rank correctness under
  * repartitioning, exact window pair semantics, and the O(n·w)
  * candidate-volume contract. */
class NeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "banana split"),
    (2L, "apple pie"),
    (3L, "banana split x"),   // near-dup of 1, same prefix
    (4L, "cherry tart"),
    (5L, "apple pie deluxe"), // near-dup of 2, same prefix
    (6L, "zebra stew")
  ).toDF("doc_id", "text")

  test("globalRank is the dense 1..n rank under (key, id), any input partitioning") {
    for (parts <- Seq(1, 3, 7)) {
      val ranked = Neighborhood
        .globalRank(corpus.repartition(parts), substring(col("text"), 1, 5), "doc_id")
        .select("doc_id", "rn").as[(Long, Long)].collect().toMap
      // order: apple(2) < apple(5) < banan(1) < banan(3) < cherr(4) < zebra(6)
      assert(ranked === Map(2L -> 1L, 5L -> 2L, 1L -> 3L, 3L -> 4L, 4L -> 5L, 6L -> 6L))
      spark.catalog.clearCache()
    }
  }

  test("sortedNeighborhoodPairs emits exactly the rank-window pairs, once each") {
    val pairs = Neighborhood
      .sortedNeighborhoodPairs(corpus, substring(col("text"), 1, 5), "doc_id",
        w = 2, payload = Seq("text"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // w=2: only rank-adjacent pairs, labelled in rank order
    assert(pairs === Set((2L, 5L), (5L, 1L), (1L, 3L), (3L, 4L), (4L, 6L)))
    spark.catalog.clearCache()
  }

  test("candidate volume is n*(w-1) minus the tail truncation, never n^2") {
    val n = 200
    val docs = (1 to n).map(i => (i.toLong, f"doc $i%04d body")).toDF("doc_id", "text")
    val w = 5
    val cnt = Neighborhood
      .sortedNeighborhoodPairs(docs, col("text"), "doc_id", w, payload = Nil)
      .count()
    // exact: sum over ranks r of min(w-1, n-r)
    val expected = (1 to n).map(r => math.min(w - 1, n - r)).sum
    assert(cnt === expected)
    assert(cnt < n.toLong * n / 4, "must be far below quadratic")
    spark.catalog.clearCache()
  }

  test("payload columns travel with both sides") {
    val row = Neighborhood
      .sortedNeighborhoodPairs(corpus, substring(col("text"), 1, 5), "doc_id",
        w = 2, payload = Seq("text"))
      .filter(col("id_a") === 1L && col("id_b") === 3L)
      .select("text_a", "text_b").as[(String, String)].collect()
    assert(row.toSeq === Seq(("banana split", "banana split x")))
    spark.catalog.clearCache()
  }
}
