package graft.crawl

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Live-HTTP getter against a local JDK fixture server — the engine-side
  * equivalent of the reference's integration pattern
  * (`crawler/crawler_integration_test.go:25-46`: spin a local server,
  * crawl it, assert the stored graph). */
class HttpGetterSpec extends SparkSpec {

  private def withServer(test: (HttpServer, String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def page(path: String, status: Int, contentType: String,
             body: String): Unit =
      server.createContext(path, (x: HttpExchange) => {
        val b = body.getBytes(StandardCharsets.UTF_8)
        x.getResponseHeaders.set("Content-Type", contentType)
        x.sendResponseHeaders(status, b.length.toLong)
        x.getResponseBody.write(b)
        x.close()
      })
    val base = s"http://localhost:${server.getAddress.getPort}"
    page("/a", 200, "text/html; charset=utf-8",
      """<html><head><title>Page A</title></head>
        |<body>alpha corpus <a href="/b">to b</a></body></html>""".stripMargin)
    page("/b", 200, "text/html; charset=utf-8",
      "<html><head><title>Page B</title></head><body>beta</body></html>")
    page("/big", 200, "text/html", "x" * 100000)
    page("/plain", 200, "text/plain", "not html")
    server.createContext("/redir", (x: HttpExchange) => {
      x.getResponseHeaders.set("Location", s"$base/b")
      x.sendResponseHeaders(302, -1)
      x.close()
    })
    server.start()
    try test(server, base)
    finally server.stop(0)
  }

  test("default config refuses private/loopback hosts before connecting") {
    // No server needed: the guard must trip pre-connect.
    val g = Crawl.HttpUrlGetter()
    assert(g.get("http://127.0.0.1:1/x").status === 403)
    assert(g.get("http://10.0.0.1/x").status === 403)
    assert(g.get("http://localhost:1/x").status === 403) // resolves to loopback
    assert(g.get("http://no-such-host.invalid/x").status === 403)
  }

  test("fetches, follows redirects, caps body, reports errors as status 0") {
    withServer { (_, base) =>
      val g = Crawl.HttpUrlGetter(blockPrivateHosts = false,
        maxBodyBytes = 1000)
      val a = g.get(s"$base/a")
      assert(a.status === 200)
      assert(a.contentType.contains("html"))
      assert(a.body.contains("<title>Page A</title>"))
      assert(g.get(s"$base/redir").body.contains("Page B"), "redirect follow")
      assert(g.get(s"$base/big").body.length === 1000, "body cap")
      assert(g.get(s"$base/nope").status === 404)
      assert(g.get(s"$base/plain").contentType === "text/plain")
      // connection refused (nothing listens on the server's port + 1)
      val dead = base.reverse.dropWhile(_.isDigit).reverse +
        (base.reverse.takeWhile(_.isDigit).reverse.toInt + 1)
      assert(g.get(s"$dead/x").status === 0)
    }
  }

  test("crawl pass end-to-end over live HTTP: links, edges, documents") {
    withServer { (_, base) =>
      import spark.implicits._
      val links = Seq((s"$base/a", 0L), (s"$base/plain", 0L))
        .toDF("url", "retrieved_at")
      val r = Crawl.pass(links,
        Crawl.HttpUrlGetter(blockPrivateHosts = false),
        staleBefore = 10L, now = 42L)
      val docs = r.documents.select("url", "title").as[(String, String)]
        .collect().toMap
      // /plain fails F3 (non-HTML) → no document; /a indexed with title
      assert(docs === Map(s"$base/a" -> "Page A"))
      // /a's link to /b discovered → merged into the frontier at ts 0
      val merged = r.links.select("url", "retrieved_at").as[(String, Long)]
        .collect().toMap
      assert(merged(s"$base/a") === 42L)
      assert(merged(s"$base/b") === 0L)
      assert(r.edges.count() === 1L)
    }
  }
}
