package graft.crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.store.StoreOps
import graft.text.Html

/** The crawl pass as one declarative batch pipeline (reference P6,
  * `monolith/service/crawler/crawler.go:44-124`): select the stale
  * frontier, fetch, extract links/title/text, and fan the results out to
  * the graph and document stores. The reference's goroutine/channel
  * pipeline (`pipeline/pipeline.go:53-141`) maps to a single DataFrame
  * chain — whole-stage codegen pipelines the narrow stages, and the
  * broadcast stage (P5) becomes persist + two writes, eliminating the
  * doubled-count hack (`crawler/sink.go:23-27`).
  */
object Crawl {

  /** Effectful fetch boundary (reference S13 `crawler/link_fetcher.go:48-101`).
    * Implementations must be serializable: the fetch runs inside
    * `mapPartitions`, `maxInFlight` bounding per-task concurrency the way
    * the reference's DynamicWorkerPool bounds goroutines (P4). Live HTTP
    * is deliberately out of scope for the engine tests — the default
    * implementation is a deterministic stub, and at-least-once semantics
    * on task retry are documented rather than hidden. */
  trait UrlGetter extends Serializable {
    def get(url: String): FetchResult
  }

  final case class FetchResult(status: Int, contentType: String,
                               body: String)

  /** Deterministic stub: pages keyed by URL; unknown URLs 404. */
  final case class TableUrlGetter(pages: Map[String, String])
      extends UrlGetter {
    def get(url: String): FetchResult =
      pages.get(url)
        .map(FetchResult(200, "text/html; charset=utf-8", _))
        .getOrElse(FetchResult(404, "text/plain", ""))
  }

  /** Live HTTP implementation (reference S13, the real half of
    * `crawler/link_fetcher.go:48-101`): GET with connect/request
    * timeouts, NORMAL redirect follow, a private-network guard applied
    * BEFORE connecting (F2 — the reference consults its privnet detector
    * first, `crawler/crawler.go:60-67`; here the host is resolved and
    * every address checked, so `private.example` pointing at 10.0.0.1 is
    * caught, not just literal IPs), and a hard cap on the body bytes
    * kept. Network failures surface as status 0 rows — the F3
    * `fetchedOk` filter drops them downstream, matching the reference's
    * error-branch behavior (`link_fetcher.go:71-76`).
    *
    * The HttpClient is `@transient lazy` — built once per executor task
    * thread after deserialization; the case class itself carries only
    * plain config so it ships cleanly into `mapPartitions`.
    */
  final case class HttpUrlGetter(
      connectTimeoutMs: Int = 5000,
      requestTimeoutMs: Int = 15000,
      maxBodyBytes: Int = 2 * 1024 * 1024,
      userAgent: String = "graft-crawler/1.0",
      blockPrivateHosts: Boolean = true) extends UrlGetter {

    @transient private lazy val client: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs.toLong))
        .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
        .build()

    private def hostIsPrivate(host: String): Boolean =
      if (host.isEmpty) true
      else if (isPrivateIp(host)) true
      else
        try java.net.InetAddress.getAllByName(host).exists { a =>
          a.isLoopbackAddress || a.isSiteLocalAddress ||
          a.isLinkLocalAddress || a.isAnyLocalAddress ||
          isPrivateIp(a.getHostAddress)
        } catch { case _: java.net.UnknownHostException => true }

    private def charsetOf(contentType: String): java.nio.charset.Charset =
      try {
        val m = java.util.regex.Pattern.compile("(?i)charset=([\\w.:-]+)")
          .matcher(contentType)
        if (m.find()) java.nio.charset.Charset.forName(m.group(1))
        else java.nio.charset.StandardCharsets.UTF_8
      } catch {
        case _: Exception => java.nio.charset.StandardCharsets.UTF_8
      }

    def get(url: String): FetchResult = {
      if (url == null) return FetchResult(0, "", "")
      if (blockPrivateHosts && hostIsPrivate(hostOf(url)))
        return FetchResult(403, "", "")
      try {
        val req = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofMillis(requestTimeoutMs.toLong))
          .header("User-Agent", userAgent)
          .GET().build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        val ct = resp.headers().firstValue("Content-Type").orElse("")
        val raw = resp.body()
        val capped =
          if (raw.length > maxBodyBytes)
            java.util.Arrays.copyOf(raw, maxBodyBytes)
          else raw
        FetchResult(resp.statusCode(), ct, new String(capped, charsetOf(ct)))
      } catch {
        case _: Exception => FetchResult(0, "", "")
      }
    }
  }

  // ------------------------------------------------------------- filters

  /** F1: skip obviously-binary resource extensions (case-insensitive) —
    * `crawler/link_fetcher.go:19,57-63`. */
  def keepExtension(url: Column): Column =
    !url.rlike("(?i)\\.(jpg|jpeg|png|gif|ico|css|js)$")

  /** F2: private-network detection (`crawler/privnet/detector.go`):
    * RFC1918 / loopback / link-local / CGN literal-IP hosts. Pure CIDR
    * math — DNS resolution only belongs in live-crawl mode. */
  def isPrivateIp(ip: String): Boolean = {
    val parts = ip.split("\\.")
    if (parts.length != 4) return false
    try {
      val o = parts.map(_.toInt)
      if (o.exists(x => x < 0 || x > 255)) return false
      o(0) == 10 ||
      (o(0) == 172 && o(1) >= 16 && o(1) <= 31) ||
      (o(0) == 192 && o(1) == 168) ||
      o(0) == 127 ||
      (o(0) == 169 && o(1) == 254) ||
      (o(0) == 100 && o(1) >= 64 && o(1) <= 127) ||
      o(0) == 0
    } catch { case _: NumberFormatException => false }
  }

  /** F2 as a pure-builtin COLUMN expression — the same CIDR
    * classification as [[isPrivateIp]] for literal dotted-quad hosts,
    * kept inside whole-stage codegen: at frontier scale the private-net
    * filter runs per candidate URL and must not break the codegen span
    * for a UDF. The Scala UDF twin stays for live-crawl (DNS) mode;
    * CrawlSpec pins the two to identical verdicts, q209 pins this one
    * against the DuckDB oracle. Octets are regex-guarded before the
    * int cast (ANSI mode: a bare cast on "corp" would throw). */
  def isPrivateIpCol(ip: Column): Column = {
    val p = split(ip, "\\.")
    def oct(i: Int): Column = {
      // try_element_at: ANSI element_at throws on index > size
      val s = try_element_at(p, lit(i))
      when(s.rlike("^[0-9]{1,3}$"), s.cast("int")).otherwise(lit(-1))
    }
    val o1 = oct(1)
    val o2 = oct(2)
    val validQuad = size(p) === 4 &&
      (1 to 4).map(i => oct(i).between(0, 255)).reduce(_ && _)
    validQuad && (
      o1 === 10 ||
      (o1 === 172 && o2.between(16, 31)) ||
      (o1 === 192 && o2 === 168) ||
      o1 === 127 ||
      (o1 === 169 && o2 === 254) ||
      (o1 === 100 && o2.between(64, 127)) ||
      o1 === 0)
  }

  def hostOf(url: String): String =
    try {
      val h = new java.net.URI(url).getHost
      if (h == null) "" else h
    } catch { case _: Exception => "" }

  val isPrivateHostUdf = udf { (url: String) =>
    if (url == null) true else isPrivateIp(hostOf(url))
  }

  /** F3: HTTP success + HTML content type (`link_fetcher.go:84-92`). */
  def fetchedOk(status: Column, contentType: Column): Column =
    status.between(200, 299) && contentType.contains("html")

  /** F4: http(s) scheme retention (`link_extractor.go:120-144`). */
  def keepScheme(url: Column): Column = url.rlike("(?i)^https?://")

  /** Politeness scheduling: assign every frontier URL a fetch WAVE so
    * that at most `perWave` URLs of any one host run concurrently — the
    * per-host rate discipline a polite crawler owes origin servers (the
    * reference serializes per-host via its worker pool; batch-side this
    * becomes a deterministic wave plan the fetch loop iterates).
    * One shuffle keyed by host; rank ties break on the URL string, so
    * the plan is reproducible run to run. Host extraction is a plain
    * scheme-authority regex (RE2-safe — engine-portable). */
  def politenessWaves(links: DataFrame, perWave: Int,
                      urlCol: String = "url"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("host").orderBy(col(urlCol))
    links
      .withColumn("host",
        regexp_extract(col(urlCol), "^[a-z]+://([^/]+)", 1))
      .withColumn("wave",
        ((row_number().over(w) - 1) / perWave).cast("int"))
  }

  // -------------------------------------------------------------- fetch

  /** Fetch a frontier of (url) rows with bounded per-task concurrency.
    * Adds (status, content_type, body). */
  def fetch(frontier: DataFrame, getter: UrlGetter,
            urlCol: String = "url"): DataFrame = {
    val spark = frontier.sparkSession
    import spark.implicits._
    val idx = frontier.columns.indexOf(urlCol)
    val schema = org.apache.spark.sql.types.StructType(
      frontier.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("status",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("content_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("body",
          org.apache.spark.sql.types.StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    frontier.mapPartitions { rows =>
      rows.map { r =>
        val res = getter.get(r.getString(idx))
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq ++ Seq(res.status, res.contentType, res.body))
      }
    }(enc)
  }

  // ------------------------------------------------------------ the pass

  final case class CrawlResult(links: DataFrame, edges: DataFrame,
                               documents: DataFrame)

  /** One crawl pass over `links` (url, retrieved_at):
    * frontier = stale rows → filter F1/F2/F4 → fetch → filter F3 →
    * extract (T1/T2/T3) → (a) merged link/edge tables, (b) documents.
    * `now` stamps re-crawled rows. Deterministic IDs (`md5(url)`) keep
    * edge endpoints stable across passes (SURVEY §7). */
  def pass(links: DataFrame, getter: UrlGetter, staleBefore: Long,
           now: Long): CrawlResult = {
    val frontier = links
      .filter(col("retrieved_at") < staleBefore)
      .filter(keepExtension(col("url")) && keepScheme(col("url")) &&
        !isPrivateHostUdf(col("url")))

    val fetched = fetch(frontier, getter)
      .filter(fetchedOk(col("status"), col("content_type")))
      .withColumn("page_links",
        Html.extractLinksUdf(col("body"), col("url")))
      .withColumn("title", Html.titleOf(col("body")))
      .withColumn("content", Html.stripTags(col("body")))
      .persist()

    val newLinks = fetched
      .select(explode(col("page_links")).as("l"))
      .select(col("l.url").as("url"))
      .withColumn("retrieved_at", lit(0L))
    val mergedLinks = StoreOps.latestByKey(
      links.select("url", "retrieved_at")
        .unionByName(fetched.select(col("url"), lit(now).as("retrieved_at")))
        .unionByName(newLinks),
      Seq("url"), "retrieved_at")
      .withColumn("id", md5(col("url")))

    val edges = fetched
      .select(col("url").as("src_url"), explode(col("page_links")).as("l"))
      .filter(!col("l.nofollow"))
      .select(md5(col("src_url")).as("src"), md5(col("l.url")).as("dst"),
        lit(now).as("updated_at"))
      .dropDuplicates("src", "dst")

    val documents = fetched.select(md5(col("url")).as("link_id"),
      col("url"), col("title"), col("content"),
      lit(now).as("indexed_at"))

    CrawlResult(mergedLinks.select("id", "url", "retrieved_at"),
      edges, documents)
  }
}
