package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Link extraction over archives ([[Warc.extractHtmlLinks]]), the
  * WAT `Links` list, and the host graph ([[CrawlGraph.hostEdges]]).
  */
class WarcLinksSpec extends SparkSpec {
  implicit private def s = spark
  import spark.implicits._

  private def page(uri: String, body: String): Array[Byte] =
    Warc.encodeSynthetic(Seq(
      (("response"), uri, "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/html; charset=utf-8")),
          s"<html><head></head><body>$body</body></html>"
            .getBytes("UTF-8")))))

  test("extractHtmlLinks: document order, base resolution, flagged assets") {
    val html = "<html><head><base href=\"http://base.example/app/\">" +
      "<link rel=\"stylesheet\" href=\"/css/site.css\"></head><body>" +
      "<a href=\"https://other.example/abs\">x</a>" +
      "<a href=\"../up?a=1&amp;b=2\">y</a>" +
      "<img src=\"img/logo.png\"></body></html>"
    val b = Warc.encodeSynthetic(Seq(
      ("response", "http://en.example/dir/page",
        "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/html")), html.getBytes("UTF-8")))))
    val rows = Warc.extractHtmlLinks(
      Seq((1L, b), (2L, Array[Byte](9, 9, 9))).toDF("id", "bytes"),
      "id", "bytes").collect().sortBy(r => (r.asset_id, r.link_idx))
    val good = rows.filter(_.extracted)
    assert(good.map(r => (r.link_idx, r.path, r.href, r.resolved))
      .toSeq === Seq(
      (0, "LINK@/href", "/css/site.css",
        "http://base.example/css/site.css"),
      (1, "A@/href", "https://other.example/abs",
        "https://other.example/abs"),
      (2, "A@/href", "../up?a=1&b=2",
        "http://base.example/up?a=1&b=2"),
      (3, "IMG@/src", "img/logo.png",
        "http://base.example/app/img/logo.png")))
    assert(good.forall(_.url === "http://en.example/dir/page"))
    assert(rows.exists(r => !r.extracted && r.asset_id == 2L))
  }

  test("WAT envelopes carry the Links list; link-free fixtures unchanged") {
    val b = page("http://en.example/page",
      "<a href=\"https://other.example/\">x</a><img src=\"/i.png\">")
    val wat = WarcSidecars.watRecords(b, "a.warc").get
    val all = wat.reduce(_ ++ _)
    val recs = Warc.recordIndex(all).get
    val body = new String(all, recs(1).contentStart.toInt,
      recs(1).contentLen.toInt, "UTF-8")
    // machine-parseable via Spark's reader, not our serializer
    val parsed = spark.read.json(Seq(body).toDS)
      .select(col("Envelope.Payload-Metadata.HTTP-Response-Metadata" +
        ".HTML-Metadata.Links"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(parsed.map(r => (r.getAs[String]("path"),
      r.getAs[String]("url"))) === Seq(
      ("A@/href", "https://other.example/"), ("IMG@/src", "/i.png")))
    // a page with no links omits the Links field entirely
    val none = WarcSidecars.watRecords(
      page("http://en.example/bare", "<p>text only</p>"), "b.warc").get
    val allN = none.reduce(_ ++ _)
    val recN = Warc.recordIndex(allN).get
    val bodyN = new String(allN, recN(1).contentStart.toInt,
      recN(1).contentLen.toInt, "UTF-8")
    assert(!bodyN.contains("\"Links\""))
  }

  test("byte and path twins emit identical link rows") {
    val html = "<html><body><a href=\"https://other.example/x\">1</a>" +
      "<a href=\"rel/y\">2</a></body></html>"
    val rec = Warc.encodeSynthetic(Seq(
      ("response", "http://en.example/dir/page",
        "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/html")), html.getBytes("UTF-8")))))
    val gz = Warc.gzipPerRecord(Seq(rec))
    val dir = java.nio.file.Files.createTempDirectory("links_parity")
    java.nio.file.Files.write(dir.resolve("a.warc.gz"), gz)
    java.nio.file.Files.write(dir.resolve("b.warc"), rec)
    val mem = Warc.extractHtmlLinks(
      Seq((1L, gz), (2L, rec)).toDF("id", "bytes"), "id", "bytes")
      .collect().map(l => (l.asset_id, l.record_idx, l.link_idx,
        l.path, l.href, l.resolved)).sortBy(x => (x._1, x._3)).toSeq
    val byPath = Warc.extractHtmlLinksByPath(
      Seq((1L, dir.resolve("a.warc.gz").toString),
        (2L, dir.resolve("b.warc").toString)).toDF("id", "path"),
      "id", "path")
      .collect().map(l => (l.asset_id, l.record_idx, l.link_idx,
        l.path, l.href, l.resolved)).sortBy(x => (x._1, x._3)).toSeq
    assert(mem === byPath && mem.length === 4)
    assert(mem.head._6 === "https://other.example/x")
    assert(mem(1)._6 === "http://en.example/dir/rel/y")
    // unreadable path: flagged, never a task kill
    val bad = Warc.extractHtmlLinksByPath(
      Seq((9L, dir.resolve("missing.warc.gz").toString))
        .toDF("id", "path"), "id", "path").collect().head
    assert(!bad.extracted)
  }

  test("extractRobots: root captures only, then the full retro-filter loop") {
    val robots = Warc.encodeSynthetic(Seq(
      ("response", "http://en.example/robots.txt",
        "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/plain")),
          "User-agent: *\nDisallow: /private/\nAllow: /\n"
            .getBytes("UTF-8")))))
    val decoy = Warc.encodeSynthetic(Seq(
      ("response", "http://en.example/foo/robots.txt",
        "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/plain")),
          "User-agent: *\nDisallow: /\n".getBytes("UTF-8")))))
    val p1 = page("http://en.example/private/doc", "<p>secret</p>")
    val p2 = page("http://en.example/pub", "<p>open</p>")
    val archive = robots ++ decoy ++ p1 ++ p2
    val caps = Warc.extractRobots(
      Seq((1L, archive)).toDF("id", "bytes"), "id", "bytes")
      .collect().filter(_.extracted)
    assert(caps.map(_.url).toSeq ===
      Seq("http://en.example/robots.txt")) // the decoy is just a file
    assert(caps.head.host === "en.example")
    assert(caps.head.txt.startsWith("User-agent: *"))
    // crawl -> policy -> retro-filter, engine end to end
    import graft.text.Robots
    val rules = Robots.parseRules(
      Seq((1L, archive)).toDF("id", "bytes")
        .transform(df => Warc.extractRobots(df, "id", "bytes").toDF)
        .filter(col("extracted")), "host", "txt")
    val verdicts = Robots.filterUrls(
      Warc.extractHtmlPages(Seq((1L, archive)).toDF("id", "bytes"),
        "id", "bytes").toDF.filter(col("extracted"))
        .select(col("target_uri").as("url")),
      "url", rules, "anybot")
      .select("url", "allowed").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).sortBy(_._1).toSeq
    assert(verdicts === Seq(
      ("http://en.example/private/doc", false),
      ("http://en.example/pub", true)))
  }

  test("hostEdges: canonical hosts, fetchable schemes, self-loops kept") {
    val links = Seq(
      (1L, "http://EN.example/a", "https://other.example/x"),
      (1L, "http://en.example:80/b", "https://other.example/y"),
      (1L, "http://en.example/c", "http://en.example/d"),
      (1L, "http://en.example/e", "mailto:a@b"), // dropped
      (1L, "http://en.example/f", ""), // unresolved: dropped
      (2L, "http://de.example/s", "https://other.example/z"))
      .toDF("id", "url", "resolved")
    val edges = CrawlGraph.hostEdges(links).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e._1, e._2)).toSeq
    assert(edges === Seq(
      ("de.example", "other.example", 1L),
      ("en.example", "en.example", 1L),
      ("en.example", "other.example", 2L)))
  }
}
