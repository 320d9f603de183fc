package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Sitemap parsing + coverage audit ([[Sitemaps]]): lexical parse
  * rules, gzip bodies, the SURT join key, and declared-vs-captured
  * over a real CDX walk.
  */
class SitemapsSpec extends SparkSpec {
  implicit private def s = spark
  import spark.implicits._

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url><loc> https://en.example/a </loc>
      |    <lastmod>2024-03-01</lastmod><changefreq>daily</changefreq>
      |    <priority>0.8</priority></url>
      |  <url><loc>https://en.example/p?b=2&amp;a=1</loc></url>
      |  <url><lastmod>2024-01-01</lastmod></url>
      |</urlset>""".stripMargin

  private val index =
    """<sm:sitemapindex xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <sm:sitemap><sm:loc>https://en.example/sitemap1.xml.gz</sm:loc>
      |    <sm:lastmod>2024-02-02</sm:lastmod></sm:sitemap>
      |</sm:sitemapindex>""".stripMargin

  test("parseSitemap: urlset, ns-prefixed index, entities, totality") {
    val (k1, e1) = Sitemaps.parseSitemap(urlset)
    assert(k1 === "urlset")
    assert(e1.map(_.loc) === Seq("https://en.example/a",
      "https://en.example/p?b=2&a=1")) // loc-less entry dropped
    assert(e1.head.lastmod === "2024-03-01")
    assert(e1.head.changefreq === "daily" && e1.head.priority === "0.8")
    assert(e1(1).lastmod === "")
    val (k2, e2) = Sitemaps.parseSitemap(index)
    assert(k2 === "sitemapindex")
    assert(e2.map(_.loc) === Seq("https://en.example/sitemap1.xml.gz"))
    assert(e2.head.lastmod === "2024-02-02")
    assert(Sitemaps.parseSitemap("<html>no</html>")._1 === "")
    assert(Sitemaps.parseSitemap(null)._1 === "")
  }

  test("entries: bytes or gz bodies, SURT urlkeys, flagged non-sitemaps") {
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(urlset.getBytes("UTF-8")); g.close()
      bos.toByteArray
    }
    val rows = Sitemaps.entries(Seq(
      (1L, urlset.getBytes("UTF-8")), (2L, gz),
      (3L, "plain garbage".getBytes("UTF-8")))
      .toDF("id", "xml"), "id", "xml")
      .collect().sortBy(r => (r.asset_id, r.entry_idx))
    val good = rows.filter(_.parsed)
    assert(good.length === 4) // 2 entries × (plain + gz)
    assert(good.head.urlkey === "example,en)/a")
    assert(good(1).urlkey === "example,en)/p?a=1&b=2") // sorted params
    assert(good.map(_.loc).distinct.length === 2) // gz ≡ plain
    assert(rows.exists(r => !r.parsed && r.asset_id == 3L))
    // a gz bomb past the inflate cap flags instead of OOMing
    val bomb = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      val chunk = new Array[Byte](1 << 20) // zeros: ~1000:1 ratio
      (1 to 8).foreach(_ => g.write(chunk))
      g.close(); bos.toByteArray
    }
    val bombRow = Sitemaps.entries(
      Seq((9L, bomb)).toDF("id", "xml"), "id", "xml",
      maxBytes = 1L << 20).collect().head
    assert(!bombRow.parsed)
  }

  test("coverageAudit: declared vs captured over a CDX walk") {
    def page(uri: String, date: String): Array[Byte] =
      Warc.encodeSyntheticHeaders(Seq((Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:uuid:$uri>",
        "WARC-Date" -> date,
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        Warc.httpResponse(200, "OK",
          Seq("Content-Type" -> "text/html"),
          "<html><body><p>x</p></body></html>".getBytes("UTF-8")))))
    val archive = Warc.gzipPerRecord(Seq(
      page("https://en.example/a", "2024-03-05T06:07:08Z"),
      page("https://en.example/a", "2024-03-12T06:07:08Z"), // later
      page("https://en.example/other", "2024-03-05T06:07:09Z")))
    val cdx = WarcCdx.extractCdx(
      Seq((1L, archive)).toDF("id", "bytes"), "id", "bytes").toDF
    val declared = Sitemaps.entries(
      Seq((1L, urlset.getBytes("UTF-8"))).toDF("id", "xml"),
      "id", "xml").toDF
    val audit = Sitemaps.coverageAudit(declared, cdx)
      .select("loc", "captured", "first_capture").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(audit === Seq(
      ("https://en.example/a", true, "20240305060708"), // EARLIEST
      ("https://en.example/p?b=2&a=1", false, "")))
  }
}
