package graft.crawl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end crawl pass against a deterministic fetch stub — the
  * integration shape of `crawler/crawler_integration_test.go`, minus
  * live HTTP. */
class CrawlSpec extends SparkSpec {
  import spark.implicits._

  private val site = Map(
    "http://a.com/" ->
      """<html><head><title>A</title></head><body>
         <a href="/one.html">one</a>
         <a href="http://b.com/">b</a>
         <a href="/skip.png">img</a>
         <a href="/nf.html" rel="nofollow">nf</a>
         alpha text</body></html>""",
    "http://b.com/" ->
      """<html><head><title>B</title></head><body>
         <a href="http://a.com/">back</a> beta text</body></html>""")

  private val seeds = Seq(
    ("http://a.com/", 0L),
    ("http://b.com/", 0L),
    ("http://127.0.0.1/secret", 0L), // privnet — never fetched
    ("http://dead.com/", 0L))        // 404s
    .toDF("url", "retrieved_at")

  test("crawl pass: fetch, extract, merge links/edges/documents") {
    val r = Crawl.pass(seeds, Crawl.TableUrlGetter(site),
      staleBefore = 1L, now = 100L)

    val links = r.links.collect()
      .map(x => x.getAs[String]("url") -> x.getAs[Long]("retrieved_at"))
      .toMap
    // fetched pages stamped now; discovered links present at ts 0
    assert(links("http://a.com/") == 100L)
    assert(links("http://b.com/") == 100L)
    assert(links("http://a.com/one.html") == 0L)
    assert(links("http://a.com/nf.html") == 0L)
    assert(links.contains("http://127.0.0.1/secret")) // kept, not crawled
    // .png filtered at extraction
    assert(!links.contains("http://a.com/skip.png"))

    val docs = r.documents.collect()
      .map(x => x.getAs[String]("url") -> x.getAs[String]("title")).toMap
    assert(docs === Map("http://a.com/" -> "A", "http://b.com/" -> "B"))

    // nofollow link appears in links but NOT as an edge
    val edgeDsts = r.edges.select("dst").as[String].collect().toSet
    val nfId = r.links.filter(col("url") === "http://a.com/nf.html")
      .select("id").as[String].head()
    assert(!edgeDsts.contains(nfId))
    // a->b and b->a edges exist
    assert(r.edges.count() == 3) // a->one, a->b, b->a
  }

  test("fresh links are not re-fetched (incremental predicate)") {
    val freshSeeds = Seq(("http://a.com/", 99L)).toDF("url", "retrieved_at")
    val r = Crawl.pass(freshSeeds, Crawl.TableUrlGetter(site),
      staleBefore = 50L, now = 100L)
    assert(r.documents.count() == 0)
    // untouched link keeps its timestamp
    assert(r.links.select("retrieved_at").as[Long].head() == 99L)
  }

  test("private-network filter blocks literal private IPs") {
    assert(Crawl.isPrivateIp("10.0.0.1"))
    assert(Crawl.isPrivateIp("172.16.9.9"))
    assert(Crawl.isPrivateIp("192.168.1.1"))
    assert(Crawl.isPrivateIp("127.0.0.1"))
    assert(Crawl.isPrivateIp("169.254.0.1"))
    assert(Crawl.isPrivateIp("100.64.0.1"))
    assert(!Crawl.isPrivateIp("8.8.8.8"))
    assert(!Crawl.isPrivateIp("172.32.0.1"))
    assert(!Crawl.isPrivateIp("not-an-ip"))
  }

  test("isPrivateIpCol agrees with the Scala classifier on every branch") {
    import spark.implicits._
    val hosts = Seq(
      "10.0.0.1", "10.255.255.255", "172.16.9.9", "172.31.0.1",
      "172.15.0.1", "172.32.0.1", "192.168.1.1", "192.167.1.1",
      "127.0.0.1", "169.254.0.1", "169.253.0.1", "100.64.0.1",
      "100.127.9.9", "100.128.0.1", "0.1.2.3", "8.8.8.8",
      "255.255.255.255", "256.1.1.1", "1.2.3.300", "1.2.3",
      "1.2.3.4.5", "not-an-ip", "intra.corp", "", "a.b.c.d",
      "01.02.03.04", "1.2.3.", ".1.2.3")
    val colVerdicts = hosts.toDF("host")
      .select(col("host"), Crawl.isPrivateIpCol(col("host")).as("p"))
      .as[(String, Boolean)].collect().toMap
    hosts.foreach { h =>
      assert(colVerdicts(h) == Crawl.isPrivateIp(h),
        s"column vs scala verdict mismatch for '$h'")
    }
  }

  test("politeness waves cap per-host concurrency, other hosts unaffected") {
    import spark.implicits._
    val links = (1 to 5).map(i => s"http://a.example/p$i")
      .appended("http://b.example/only")
      .toDF("url")
    val waves = Crawl.politenessWaves(links, perWave = 2)
      .select("url", "wave").as[(String, Int)].collect().toMap
    assert(waves("http://a.example/p1") == 0)
    assert(waves("http://a.example/p2") == 0)
    assert(waves("http://a.example/p3") == 1)
    assert(waves("http://a.example/p4") == 1)
    assert(waves("http://a.example/p5") == 2)
    assert(waves("http://b.example/only") == 0) // own host, own budget
  }
}
