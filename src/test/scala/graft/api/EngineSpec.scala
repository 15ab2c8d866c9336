package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Smoke test for the SURVEY §7 facade: the full reference service loop
  * (crawl → rank → write-back → search) through Engine alone. */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("crawl → pageRank → writeScores → search through the facade") {
    val site = Map(
      "http://a.com/" -> ("<html><head><title>A</title></head><body>" +
        "<a href=\"http://b.com/\">b</a> alpha common</body></html>"),
      "http://b.com/" -> ("<html><head><title>B</title></head><body>" +
        "beta common</body></html>"))
    val seeds = Seq(("http://a.com/", 0L), ("http://b.com/", 0L))
      .toDF("url", "retrieved_at")

    val crawl = Engine.crawlPass(seeds,
      graft.crawl.Crawl.TableUrlGetter(site), staleBefore = 1L, now = 9L)
    assert(crawl.documents.count() == 2)
    assert(crawl.edges.count() == 1) // a → b

    val pr = Engine.pageRankPass(crawl.links.select(col("id")),
      crawl.edges)
    val scores = pr.scores.as[(String, Double)].collect().toMap
    assert(math.abs(scores.values.sum - 1.0) < 1e-9) // mass conserved
    // b has an inbound link, a does not → b outranks a
    val idOf = crawl.links.select("url", "id").as[(String, String)]
      .collect().toMap
    assert(scores(idOf("http://b.com/")) > scores(idOf("http://a.com/")))

    val docs = crawl.documents
      .select(md5(col("url")).as("doc_id"), col("content").as("text"))
    val written = Engine.writeScores(docs,
      pr.scores.select(col("id").as("doc_id"), col("score")))
    assert(written.filter(col("final_score") > 0).count() == 2)

    val priors = written.select(col("doc_id"),
      col("final_score").as("prior"))
    val page = Engine.search(docs, priors, "common", size = 10)
    assert(page.total == 2) // both docs match; prior breaks the tie
    val top = page.rows.select("doc_id").as[String].collect()
    assert(top.head == idOf("http://b.com/"))
  }

  test("registerTables exposes the normalized relations to raw SQL") {
    Engine.registerTables(spark, "/root/testdata/sf0.001")
    // events.ts must arrive ns-normalized in SQL-land too
    val tsType = spark.sql("SELECT ts FROM events").schema("ts").dataType
    assert(tsType === org.apache.spark.sql.types.LongType)
    // a raw SQL rollup equals the DataFrame q01 result
    val sql = spark.sql("""
      SELECT l_returnflag, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY 1 ORDER BY 1""").collect()
    val df = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").cast("long").as("sum_qty"))
      .orderBy("l_returnflag").collect()
    assert(sql.map(_.toSeq) === df.map(_.toSeq))
    // native SQL functions ride along with the tables
    val est = spark.sql(
      "SELECT graft_hll_distinct(l_orderkey).nonzero_regs FROM lineitem")
      .collect().head.getLong(0)
    assert(est > 0L)
  }
}
