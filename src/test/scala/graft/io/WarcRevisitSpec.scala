package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** WARC revisit dedup ([[WarcRevisit]]): plan ranking, archive
  * rewrite (header carriage, truncation, declared payload digest),
  * the revisit-aware CDX digest convention, and consumer-side
  * resolution to the original capture's span.
  */
class WarcRevisitSpec extends SparkSpec {
  implicit private def s = spark
  import spark.implicits._

  private def page(uri: String, date: String, title: String,
      body: String): Array[Byte] =
    Warc.encodeSyntheticHeaders(Seq((Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:uuid:$uri@$date>",
      "WARC-Date" -> date,
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=response"),
      Warc.httpResponse(200, "OK",
        Seq("Content-Type" -> "text/html; charset=utf-8"),
        (s"<html><head><title>$title</title></head><body><p>$body" +
          "</p></body></html>").getBytes("UTF-8")))))

  // crawl 1: Alpha + an unrelated page; crawl 2 re-captures Alpha
  // BYTE-IDENTICALLY (same payload digest, later date) + a new page.
  // Alpha's body is big and poorly compressible so truncation beats
  // the revisit headers' growth even through gzip.
  private val filler = (1 to 300)
    .map(i => ((i * 2654435761L) % 100000).toString).mkString(" ")
  private val a1 = Warc.gzipPerRecord(Seq(
    page("http://en.example/page", "2024-03-05T06:07:08Z", "Alpha",
      filler),
    page("http://en.example/other", "2024-03-05T06:07:09Z", "Other",
      "Unrelated.")))
  private val a2 = Warc.gzipPerRecord(Seq(
    page("http://en.example/page", "2024-03-12T06:07:08Z", "Alpha",
      filler),
    page("http://de.example/seite", "2024-03-12T06:07:09Z", "Beta",
      "Neue Seite.")))

  private def srcCdx = WarcCdx.extractCdx(
    Seq((1L, a1), (2L, a2)).toDF("id", "bytes"), "id", "bytes").toDF

  test("revisitPlan: earliest capture canonical, dups carry refers-to") {
    val plan = WarcRevisit.revisitPlan(srcCdx).collect()
      .map(r => ((r.getAs[Long]("asset_id"), r.getAs[Int]("record_idx")),
        r)).toMap
    assert(plan.size === 4)
    assert(plan((1L, 0)).getAs[Boolean]("canonical"))
    assert(plan((2L, 1)).getAs[Boolean]("canonical")) // new page
    val dup = plan((2L, 0)) // the re-capture
    assert(!dup.getAs[Boolean]("canonical"))
    assert(dup.getAs[Long]("refers_to_asset") === 1L)
    assert(dup.getAs[String]("refers_to_url") ===
      "http://en.example/page")
    assert(dup.getAs[String]("refers_to_date") ===
      "2024-03-05T06:07:08Z") // second-resolution reconstruction
    // digest-global mode: same rows here (no cross-url identical
    // bodies), but the key drops the urlkey
    assert(WarcRevisit.revisitPlan(srcCdx, perUrl = false)
      .filter(!col("canonical")).count() === 1)
  }

  test("rewriteRevisits: dup responses become revisit records") {
    val plan = WarcRevisit.revisitPlan(srcCdx)
    val out = WarcRevisit.rewriteRevisits(
      Seq((2L, a2, "b.warc.gz"), (9L, Array[Byte](1, 2, 3), "bad"))
        .toDF("id", "bytes", "filename"),
      "id", "bytes", "filename", plan)
      .collect().sortBy(_.asset_id)
    val good = out(0)
    assert(good.ok && good.n_revisits === 1)
    assert(!out(1).ok && out(1).bytes.isEmpty)
    // the rewritten archive walks like any other
    val u = Warc.gunzipAll(good.bytes).get
    val recs = Warc.recordIndex(u).get
    assert(recs.map(_.warcType) === Seq("revisit", "response"))
    val head = new String(u, recs(0).byteStart.toInt,
      (recs(0).contentStart - recs(0).byteStart).toInt, "ISO-8859-1")
    assert(head.contains("WARC-Profile: " +
      WarcRevisit.IdenticalPayloadProfile))
    assert(head.contains(
      "WARC-Refers-To-Target-URI: http://en.example/page"))
    assert(head.contains("WARC-Refers-To-Date: 2024-03-05T06:07:08Z"))
    assert(head.contains("WARC-Truncated: length"))
    assert(head.contains("WARC-Date: 2024-03-12T06:07:08Z")) // its own
    // content truncated to the HTTP head (ends at CRLFCRLF, no body)
    val content = new String(u, recs(0).contentStart.toInt,
      recs(0).contentLen.toInt, "ISO-8859-1")
    assert(content.startsWith("HTTP/1.1 200 OK"))
    assert(content.endsWith("\r\n\r\n") && !content.contains("<html>"))
    // the untouched record re-members byte-identically
    val origMembers = GzipMembers.memberIndex(a2).get
    val newMembers = GzipMembers.memberIndex(good.bytes).get
    assert(java.util.Arrays.equals(
      good.bytes.slice(newMembers(1).compStart.toInt,
        (newMembers(1).compStart + newMembers(1).compLen).toInt),
      a2.slice(origMembers(1).compStart.toInt,
        (origMembers(1).compStart + origMembers(1).compLen).toInt)))
  }

  test("CDX digest convention + resolution to the original span") {
    val plan = WarcRevisit.revisitPlan(srcCdx)
    val rewritten = WarcRevisit.rewriteRevisits(
      Seq((2L, a2, "b.warc.gz")).toDF("id", "bytes", "filename"),
      "id", "bytes", "filename", plan).toDF
    val walked = WarcCdx.extractCdx(
      rewritten.select(col("asset_id").as("id"), col("bytes")),
      "id", "bytes").toDF
    val rev = walked.filter(col("record_idx") === 0).collect()(0)
    val origRow = srcCdx.filter(col("asset_id") === 1 &&
      col("record_idx") === 0).collect()(0)
    // the revisit CDX row carries the DECLARED (original) payload
    // digest, not a recompute over the truncated block
    assert(rev.getAs[String]("warc_type") === "revisit")
    assert(rev.getAs[String]("payload_digest") ===
      origRow.getAs[String]("payload_digest"))
    assert(rev.getAs[Long]("length") < origRow.getAs[Long]("length"))
    // consumer-side resolution over crawl-1 + the deduped crawl-2
    val combined = srcCdx.filter(col("asset_id") === 1)
      .unionByName(walked)
    val res = WarcRevisit.resolveRevisits(combined).collect()
    assert(res.length === 1)
    val r = res(0)
    assert(r.getAs[Long]("asset_id") === 2L &&
      r.getAs[Int]("record_idx") === 0)
    assert(r.getAs[Boolean]("resolved"))
    assert(r.getAs[Long]("refers_to_asset") === 1L)
    assert(r.getAs[Long]("refers_to_offset") ===
      origRow.getAs[Long]("offset"))
    assert(r.getAs[Long]("refers_to_length") ===
      origRow.getAs[Long]("length"))
    // an orphan revisit (original not indexed) stays unresolved
    val orphan = WarcRevisit.resolveRevisits(walked).collect()(0)
    assert(!orphan.getAs[Boolean]("resolved"))
  }
}
