package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden link-extraction fixture in the spirit of the reference's
  * crawler integration test (`crawler/crawler_integration_test.go:25-42`):
  * base-href resolution, relative/absolute/scheme-relative links,
  * nofollow, fragment stripping, extension and scheme exclusion. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = """
    <html><head>
      <title> The &amp; Title  here </title>
      <base href="http://example.com/dir/">
    </head><body>
      <a href="rel.html">relative</a>
      <a href="/abs.html">absolute path</a>
      <a href="http://other.com/x">absolute</a>
      <a href="//cdn.com/lib.html">scheme relative</a>
      <a href="nofollow.html" rel="nofollow">nf</a>
      <a href="pic.PNG">image</a>
      <a href="style.css">css</a>
      <a href="ftp://files.com/a">ftp</a>
      <a href="rel.html#section">fragment dup</a>
      <a href="other.html#frag">fragment new</a>
    </body></html>"""

  test("extractLinks: resolution, dedup, nofollow, filters") {
    val links = Html.extractLinks(fixture, "http://example.com/page")
    val urls = links.map(l => l.url -> l.nofollow).toMap
    assert(urls === Map(
      "http://example.com/dir/rel.html" -> false,
      "http://example.com/abs.html" -> false,
      "http://other.com/x" -> false,
      "http://cdn.com/lib.html" -> false,
      "http://example.com/dir/nofollow.html" -> true,
      "http://example.com/dir/other.html" -> false))
    // first-occurrence wins for the fragment duplicate
    assert(!urls("http://example.com/dir/rel.html"))
  }

  test("no base href: resolve against the page url") {
    val html = """<a href="x.html">x</a>"""
    val links = Html.extractLinks(html, "http://site.org/a/b/page.html")
    assert(links.map(_.url) === Seq("http://site.org/a/b/x.html"))
  }

  test("titleOf collapses whitespace and decodes entities") {
    val out = Seq(fixture).toDF("html")
      .select(Html.titleOf(col("html"))).as[String].head()
    assert(out == "The & Title here")
  }

  test("stripTags drops script/style wholesale") {
    val html = "<p>keep</p><script>var x = 1;</script><style>a{}</style>end"
    val out = Seq(html).toDF("h")
      .select(Html.stripTags(col("h"))).as[String].head()
    assert(out == "keep end")
  }

  test("highlight wraps whole words only, case-insensitive, closed tags") {
    val out = Seq("Spark sparkle spark").toDF("t")
      .select(Html.highlight(col("t"), Seq("spark"))).as[String].head()
    assert(out == "<em>Spark</em> sparkle <em>spark</em>")
  }

  test("summarizer packs matching sentences in position order") {
    val content = "Nothing here. Spark is fast. Filler sentence. " +
      "Spark joins scale. Tail."
    val out = Html.summarize(content, Seq("spark"), 120)
    assert(out == "Spark is fast. ... Spark joins scale.")
  }

  test("summarizer falls back to leading text when nothing matches") {
    val out = Html.summarize("Only one sentence without terms.",
      Seq("absent"), 10)
    assert(out == "Only one s")
  }

  test("anchorTexts keeps every followable occurrence with cleaned text") {
    val html = "<html><body>" +
      "<a href=\"/a\"><b>Bold</b>  link</a>" +
      "<a href=\"/a\">again</a>" + // same target, second vote kept
      "<a href=\"/nf\" rel=\"nofollow\">sneaky</a>" +
      "<a href=\"mailto:x@y.z\">mail</a>" +
      "<a href=\"/empty\"><img/></a>" + // no visible text -> dropped
      "</body></html>"
    val got = Html.anchorTexts(html, "http://h.example/p")
    assert(got == Seq(
      Html.AnchorText("http://h.example/a", "Bold link"),
      Html.AnchorText("http://h.example/a", "again")))
  }

  test("anchorTexts resolves against base href like extractLinks") {
    val html = "<html><head><base href=\"http://b.example/sub/\"></head>" +
      "<body><a href=\"page2#frag\">deep page</a></body></html>"
    assert(Html.anchorTexts(html, "http://h.example/p") ==
      Seq(Html.AnchorText("http://b.example/sub/page2", "deep page")))
  }
}
