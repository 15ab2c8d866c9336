package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Conformance semantics transcribed from the reference's shared store
  * suites (`linkgraph/graph/graphtest/link.go`, `edge.go`;
  * `textindexer/index/indextest/suite.go`): upsert keeps the newest
  * timestamp, edges need both endpoints, GC only removes matching stale
  * rows, score updates preserve docs / create placeholders. */
class StoreOpsSpec extends SparkSpec {
  import spark.implicits._

  test("latestByKey keeps max timestamp per key (upsert-GREATEST)") {
    val df = Seq(("u1", 10L, "first"), ("u1", 30L, "newest"),
      ("u1", 20L, "mid"), ("u2", 5L, "only"))
      .toDF("url", "retrieved_at", "tag")
    val out = StoreOps.latestByKey(df, Seq("url"), "retrieved_at")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out === Map("u1" -> "newest", "u2" -> "only"))
  }

  test("latestByKey breaks timestamp ties deterministically") {
    val df = Seq(("u1", 10L, 1L), ("u1", 10L, 2L))
      .toDF("url", "ts", "seq")
    val out = StoreOps.latestByKey(df, Seq("url"), "ts", Seq("seq"))
    assert(out.select("seq").as[Long].collect().toSeq === Seq(2L))
  }

  test("mergeEdges rejects edges with missing endpoints (FK)") {
    val verts = Seq("a", "b").toDF("vid")
    val edges = Seq(("a", "b", 1L), ("a", "ghost", 2L),
      ("ghost", "b", 3L)).toDF("src", "dst", "ts")
    val out = StoreOps.mergeEdges(edges, verts, "vid", verts, "vid",
      "src", "dst", "ts")
    assert(out.select("src", "dst").as[(String, String)].collect()
      .toSeq === Seq(("a", "b")))
  }

  test("mergeEdges dedups (src,dst) keeping newest") {
    val verts = Seq("a", "b").toDF("vid")
    val edges = Seq(("a", "b", 1L), ("a", "b", 9L), ("b", "a", 2L))
      .toDF("src", "dst", "ts")
    val out = StoreOps.mergeEdges(edges, verts, "vid", verts, "vid",
        "src", "dst", "ts")
      .collect().map(r => (r.getString(1), r.getString(0)) -> r.getLong(2))
      .toMap // columns reordered by join: dst, src, ts
    assert(out.size == 2)
  }

  test("gcStale removes only (pred AND old) rows") {
    val df = Seq(("e1", "error", 5L), ("e2", "error", 50L),
      ("e3", "click", 5L)).toDF("id", "typ", "ts")
    val kept = StoreOps.gcStale(df, col("typ") === "error", "ts", lit(10L))
      .select("id").as[String].collect().toSet
    assert(kept === Set("e2", "e3"))
  }

  test("writeScores: placeholder for score-only, default for doc-only") {
    val docs = Seq((1L, "doc one"), (2L, "doc two")).toDF("id", "body")
    val scores = Seq((2L, 0.5), (3L, 0.9)).toDF("id", "score")
    val out = StoreOps.writeScores(docs, scores, "id", "score")
      .select("id", "final_score").as[(Long, Double)].collect().toMap
    assert(out === Map(1L -> 0.0, 2L -> 0.5, 3L -> 0.9))
  }

  test("scd2: chained validity intervals, one current version per key") {
    val changes = Seq(
      (1L, 100L, "a"), (1L, 300L, "b"), (1L, 200L, "c"),
      (2L, 50L, "x")).toDF("key", "ts", "v")
    val rows = StoreOps.scd2(changes, Seq("key"), "ts")
      .select("key", "v", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3)), r.getBoolean(4)))).toMap
    assert(rows((1L, "a")) == ((100L, Some(200L), false)))
    assert(rows((1L, "c")) == ((200L, Some(300L), false)))
    assert(rows((1L, "b")) == ((300L, None, true)))
    assert(rows((2L, "x")) == ((50L, None, true)))
  }

  test("scd2: same-timestamp changes order by the tie-break column") {
    val changes = Seq((1L, 100L, 7L, "first"), (1L, 100L, 9L, "second"))
      .toDF("key", "ts", "seq", "v")
    val rows = StoreOps.scd2(changes, Seq("key"), "ts", Seq("seq"))
      .select("v", "is_current").as[(String, Boolean)].collect().toMap
    assert(rows === Map("first" -> false, "second" -> true))
  }

  test("changePoints keeps first row + attribute changes, NULL-safely") {
    val stream = Seq(
      (1L, 10L, Some("a")), (1L, 20L, Some("a")), (1L, 30L, Some("b")),
      (1L, 40L, None), (1L, 50L, None), (1L, 60L, Some("b")),
      (2L, 10L, Some("z"))).toDF("key", "ts", "v")
    val kept = StoreOps.changePoints(stream, Seq("key"), "ts", "v")
      .select("key", "ts").as[(Long, Long)].collect().toSet
    // repeats (20) and the second NULL (50) compress away; the
    // NULL->b flip (60) and the non-NULL->NULL flip (40) are changes
    assert(kept == Set((1L, 10L), (1L, 30L), (1L, 40L), (1L, 60L),
      (2L, 10L)))
  }

  test("changePoints |> scd2 builds the compressed history") {
    val stream = Seq(
      (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "b"))
      .toDF("key", "ts", "v")
    val hist = StoreOps.scd2(
        StoreOps.changePoints(stream, Seq("key"), "ts", "v"),
        Seq("key"), "ts")
      .select("v", "valid_from", "valid_to")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(2)))))
      .toMap
    assert(hist("a") == ((10L, Some(30L))))
    assert(hist("b") == ((30L, None)))
  }
}
