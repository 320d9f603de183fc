package graft.io

import graft.SparkSpec

/** WET/WAT sidecar generation ([[WarcSidecars]]): record forms,
  * content-addressed determinism, page-set parity with
  * [[Warc.extractHtmlPages]], WAT envelope facts against the source
  * CDX index (digests, container spans), round-trip walkability of
  * the emitted shards, and the flagged-asset posture.
  */
class WarcSidecarsSpec extends SparkSpec {
  implicit private def s = spark
  import spark.implicits._

  private def html(uri: String, date: String, title: String,
      body: String, status: Int = 200): Array[Byte] =
    Warc.encodeSyntheticHeaders(Seq((Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:uuid:$uri>",
      "WARC-Date" -> date,
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=response"),
      Warc.httpResponse(status, "OK",
        Seq("Content-Type" -> "text/html; charset=utf-8"),
        (s"<html><head><title>$title</title></head><body><p>$body" +
          "</p></body></html>").getBytes("UTF-8")))))

  private val gif = Warc.encodeSyntheticHeaders(Seq((Seq(
    "WARC-Type" -> "response",
    "WARC-Record-ID" -> "<urn:uuid:gif>",
    "WARC-Date" -> "2024-03-05T06:07:11Z",
    "WARC-Target-URI" -> "http://en.example/logo.gif",
    "Content-Type" -> "application/http; msgtype=response"),
    Warc.httpResponse(200, "OK", Seq("Content-Type" -> "image/gif"),
      Array[Byte]('G', 'I', 'F', '8', '9', 'a', 1, 0, 1, 0)))))

  private val request = Warc.encodeSyntheticHeaders(Seq((Seq(
    "WARC-Type" -> "request",
    "WARC-Record-ID" -> "<urn:uuid:req>",
    "WARC-Date" -> "2024-03-05T06:07:08Z",
    "WARC-Target-URI" -> "http://en.example/page",
    "Content-Type" -> "application/http; msgtype=request"),
    "GET /page HTTP/1.1\r\nHost: h\r\n\r\n".getBytes("ISO-8859-1"))))

  private def gz: Array[Byte] = Warc.gzipPerRecord(Seq(
    html("http://en.example/page", "2024-03-05T06:07:08Z", "Alpha",
      "The quick start."),
    request, gif,
    html("http://de.example/seite", "2024-03-05T06:07:12Z", "Beta",
      "Zweite Seite gut.")))

  test("WET: warcinfo + one conversion per extractHtmlPages page") {
    val wet = WarcSidecars.wetRecords(gz, "shard.warc.gz").get
    assert(wet.length === 3) // warcinfo + 2 html pages (gif/request skip)
    val all = wet.reduce(_ ++ _)
    val recs = Warc.recordIndex(all).get
    assert(recs.map(_.warcType) ===
      Seq("warcinfo", "conversion", "conversion"))
    // warcinfo: date defaults to the FIRST source record's; filename
    // follows the CC sidecar convention; body is warc-fields
    val infoHead = new String(all, 0, recs(0).contentStart.toInt,
      "ISO-8859-1")
    assert(infoHead.contains("WARC-Date: 2024-03-05T06:07:08Z"))
    assert(infoHead.contains("WARC-Filename: shard.warc.wet.gz"))
    val infoBody = new String(all, recs(0).contentStart.toInt,
      recs(0).contentLen.toInt, "ISO-8859-1")
    assert(infoBody.contains("software: graft.WarcSidecars"))
    assert(infoBody.contains("extractedFrom: shard.warc.gz"))
    // conversions: original URI/date, Refers-To the source id, body =
    // exactly the extracted text
    val c1 = recs(1)
    assert(c1.targetUri === "http://en.example/page")
    val c1head = new String(all, c1.byteStart.toInt,
      (c1.contentStart - c1.byteStart).toInt, "ISO-8859-1")
    assert(c1head.contains("WARC-Date: 2024-03-05T06:07:08Z"))
    assert(c1head.contains(
      "WARC-Refers-To: <urn:uuid:http://en.example/page>"))
    assert(c1head.contains("Content-Type: text/plain"))
    val text1 = new String(all, c1.contentStart.toInt,
      c1.contentLen.toInt, "UTF-8")
    assert(text1 === "The quick start.")
    // page-set parity with extractHtmlPages
    val pages = Warc.extractHtmlPages(
      Seq((1L, gz)).toDF("id", "bytes"), "id", "bytes")
      .collect().sortBy(_.record_idx)
    assert(pages.map(_.text).toSeq === Seq("The quick start.",
      "Zweite Seite gut."))
    // determinism: a second run emits identical bytes
    assert(java.util.Arrays.equals(
      WarcSidecars.wetGz(gz, "shard.warc.gz").get,
      WarcSidecars.wetGz(gz, "shard.warc.gz").get))
  }

  test("WET round-trip: the engine's own CDX walk indexes the shard") {
    val wetGz = WarcSidecars.wetGz(gz, "shard.warc.gz").get
    val idx = WarcCdx.cdxIndex(wetGz).get
    assert(idx.length === 3 && idx.forall(_.parsed))
    assert(idx(1).mime === "text/plain")
    assert(idx(1).urlkey === "example,en)/page")
    assert(idx(2).urlkey === "example,de)/seite")
    // conversion payload digest = digest of the text = the record's
    // own WARC-Block-Digest claim
    val t = "The quick start.".getBytes("UTF-8")
    assert(idx(1).payloadDigest === WarcCdx.sha1Base32(t, 0, t.length))
    // spans tile the shard exactly (ranged-fetch ready)
    assert(idx.last.offset + idx.last.length === wetGz.length.toLong)
  }

  test("WAT: one metadata record per source record; envelope facts match CDX") {
    val wat = WarcSidecars.watRecords(gz, "shard.warc.gz").get
    assert(wat.length === 5) // warcinfo + 4 source records
    val all = wat.reduce(_ ++ _)
    val recs = Warc.recordIndex(all).get
    assert(recs(0).warcType === "warcinfo")
    assert(recs.tail.forall(_.warcType === "metadata"))
    assert(recs.tail.forall(_.contentType === "application/json"))
    val srcCdx = WarcCdx.cdxIndex(gz).get
    val bodies = recs.tail.map(r => new String(all,
      r.contentStart.toInt, r.contentLen.toInt, "UTF-8"))
    // every envelope carries the source record's digests, container
    // span (the gzip MEMBER span — the ranged-fetch unit), and the
    // original header carriage
    bodies.zip(srcCdx).foreach { case (j, e) =>
      assert(j.contains(s""""Block-Digest":"sha1:${e.digest}""""))
      assert(j.contains(s""""Payload-Digest":"sha1:${e.payloadDigest}""""))
      assert(j.contains(s""""Offset":"${e.offset}""""))
      assert(j.contains(s""""Length":"${e.length}""""))
      assert(j.contains(""""Filename":"shard.warc.gz""""))
    }
    assert(bodies(0).contains(""""Status":"200""""))
    assert(bodies(0).contains(""""Title":"Alpha""""))
    assert(bodies(0).contains(""""Content-Type":"text/html""""))
    assert(bodies(0).contains(
      """"WARC-Type":"response""""))
    // the request record has no HTTP-Response-Metadata, the gif no
    // HTML-Metadata
    assert(!bodies(1).contains("HTTP-Response-Metadata"))
    assert(bodies(2).contains(""""Content-Type":"image/gif""""))
    assert(!bodies(2).contains("HTML-Metadata"))
    // metadata records refer to their source records
    val m1head = new String(all, recs(1).byteStart.toInt,
      (recs(1).contentStart - recs(1).byteStart).toInt, "ISO-8859-1")
    assert(m1head.contains(
      "WARC-Refers-To: <urn:uuid:http://en.example/page>"))
    // determinism
    assert(java.util.Arrays.equals(
      WarcSidecars.watGz(gz, "shard.warc.gz").get,
      WarcSidecars.watGz(gz, "shard.warc.gz").get))
  }

  test("WAT JSON is machine-parseable and plain archives span raw records") {
    val plain = Seq(
      html("http://en.example/page", "2024-03-05T06:07:08Z", "Alpha",
        "The quick start."), request).reduce(_ ++ _)
    val wat = WarcSidecars.watRecords(plain, "shard.warc").get
    val all = wat.reduce(_ ++ _)
    val recs = Warc.recordIndex(all).get
    val body = new String(all, recs(1).contentStart.toInt,
      recs(1).contentLen.toInt, "UTF-8")
    // parse with Spark's JSON reader — not our own serializer
    val parsed = spark.read.json(Seq(body).toDS)
    val row = parsed.select(
      org.apache.spark.sql.functions.col(
        "Envelope.Payload-Metadata.HTTP-Response-Metadata." +
          "Response-Message.Status"),
      org.apache.spark.sql.functions.col(
        "Envelope.Payload-Metadata.HTTP-Response-Metadata." +
          "HTML-Metadata.Head.Title"),
      org.apache.spark.sql.functions.col("Container.Offset"),
      org.apache.spark.sql.functions.col("Container.Length"))
      .collect()(0)
    assert(row.getString(0) === "200")
    assert(row.getString(1) === "Alpha")
    // plain source: container span = the raw record span
    val spans = Warc.recordIndex(plain).get
    assert(row.getString(2) === spans(0).byteStart.toString)
    assert(row.getString(3) === spans(0).byteLen.toString)
  }

  test("extractSidecars: shard bytes per asset, corrupt assets flagged") {
    val rows = WarcSidecars.extractSidecars(
      Seq((1L, gz, "a.warc.gz"), (2L, Array[Byte](9, 9, 9), "bad.bin"))
        .toDF("id", "bytes", "filename"), "id", "bytes", "filename")
      .collect().sortBy(_.asset_id)
    assert(rows.length === 2)
    val good = rows(0)
    assert(good.ok && good.wet_records === 3 && good.wat_records === 5)
    // the emitted shards are per-record-gzipped and CDX-walkable
    assert(WarcCdx.cdxIndex(good.wet).get.length === 3)
    assert(WarcCdx.cdxIndex(good.wat).get.length === 5)
    val bad = rows(1)
    assert(!bad.ok && bad.wet.isEmpty && bad.wat.isEmpty)
  }

  test("byte and path twins emit byte-identical shards") {
    val dir = java.nio.file.Files.createTempDirectory("sidecar_parity")
    val gzF = dir.resolve("a.warc.gz")
    java.nio.file.Files.write(gzF, gz)
    val plain = Seq(
      html("http://en.example/page", "2024-03-05T06:07:08Z", "Alpha",
        "The quick start."), request).reduce(_ ++ _)
    val plF = dir.resolve("b.warc")
    java.nio.file.Files.write(plF, plain)
    val mem = WarcSidecars.extractSidecars(
      Seq((1L, gz, "a.warc.gz"), (2L, plain, "b.warc"))
        .toDF("id", "bytes", "filename"), "id", "bytes", "filename")
      .collect().sortBy(_.asset_id)
    val byPath = WarcSidecars.extractSidecarsByPath(
      Seq((1L, gzF.toString), (2L, "file://" + plF.toString))
        .toDF("id", "path"), "id", "path")
      .collect().sortBy(_.asset_id)
    mem.zip(byPath).foreach { case (m, p) =>
      assert(m.ok && p.ok)
      assert(m.wet_records === p.wet_records)
      assert(m.wat_records === p.wat_records)
      assert(java.util.Arrays.equals(m.wet, p.wet))
      assert(java.util.Arrays.equals(m.wat, p.wat))
    }
    // a member holding TWO records: both twins fall back to the same
    // raw (uncompressed-global) container spans
    val multi = Warc.gzipPerRecord(Seq(
      html("http://en.example/page", "2024-03-05T06:07:08Z", "Alpha",
        "The quick start.") ++ request, gif))
    val mF = dir.resolve("m.warc.gz")
    java.nio.file.Files.write(mF, multi)
    val mMem = WarcSidecars.extractSidecars(
      Seq((1L, multi, "m.warc.gz")).toDF("id", "bytes", "filename"),
      "id", "bytes", "filename").collect().head
    val mPath = WarcSidecars.extractSidecarsByPath(
      Seq((1L, mF.toString)).toDF("id", "path"), "id", "path")
      .collect().head
    assert(mMem.ok && mPath.ok && mMem.wat_records === 4)
    assert(java.util.Arrays.equals(mMem.wet, mPath.wet))
    assert(java.util.Arrays.equals(mMem.wat, mPath.wat))
    // oversize records skip identically under the same cap
    val cap = gif.length.toLong // the html records are bigger
    val pure = Warc.gzipPerRecord(
      WarcSidecars.watRecords(gz, "a.warc.gz",
        date = "2024-03-05T06:07:08Z", maxRecordBytes = cap).get)
    val capped = WarcSidecars.extractSidecarsByPath(
      Seq((1L, gzF.toString)).toDF("id", "path"), "id", "path",
      date = "2024-03-05T06:07:08Z", maxRecordBytes = cap)
      .collect().head
    val pureCount = Warc.recordIndex(Warc.gunzipAll(pure).get).get.length
    assert(capped.ok && pureCount < 5) // the cap really skipped some
    assert(capped.wat_records === pureCount)
    assert(java.util.Arrays.equals(pure, capped.wat))
    // unreadable path: flagged, never a task kill
    val badRow = WarcSidecars.extractSidecarsByPath(
      Seq((9L, dir.resolve("missing.warc.gz").toString))
        .toDF("id", "path"), "id", "path").collect().head
    assert(!badRow.ok && badRow.wet.isEmpty)
  }

  test("a record crossing a gzip member boundary keeps its raw span") {
    val one = html("http://en.example/page", "2024-03-05T06:07:08Z",
      "Alpha", "The quick start.")
    val all = one ++ request
    val k = one.length / 2 // split mid-record: record 1 crosses members
    val crossing = Warc.gzipPerRecord(Seq(
      java.util.Arrays.copyOfRange(all, 0, k),
      java.util.Arrays.copyOfRange(all, k, all.length)))
    val wat = WarcSidecars.watRecords(crossing, "x.warc.gz").get
    assert(wat.length === 3)
    val allW = wat.reduce(_ ++ _)
    val recs = Warc.recordIndex(allW).get
    val bodies = recs.tail.map(r => new String(allW,
      r.contentStart.toInt, r.contentLen.toInt, "UTF-8"))
    // record 1 crosses members; record 2 starts mid-member — BOTH
    // keep raw (uncompressed-global) spans; a member span on record 1
    // would truncate it, one on record 2 would not be the CC
    // member-is-the-record fetch-unit shape
    assert(bodies(0).contains(""""Offset":"0""""))
    assert(bodies(0).contains(s""""Length":"${one.length}""""))
    assert(bodies(1).contains(s""""Offset":"${one.length}""""))
    assert(bodies(1).contains(s""""Length":"${request.length}""""))
    // the path twin flags this shape (documented corner: the forward
    // walk sees one member at a time)
    val dir = java.nio.file.Files.createTempDirectory("sidecar_cross")
    val f = dir.resolve("x.warc.gz")
    java.nio.file.Files.write(f, crossing)
    val row = WarcSidecars.extractSidecarsByPath(
      Seq((1L, f.toString)).toDF("id", "path"), "id", "path")
      .collect().head
    assert(!row.ok)
  }

  test("WAT: oversize responses keep their envelope, minus the HTML walk") {
    val wat = WarcSidecars.watRecords(gz, "shard.warc.gz",
      maxContentBytes = 10).get
    assert(wat.length === 5) // every source record still enveloped
    val all = wat.reduce(_ ++ _)
    val recs = Warc.recordIndex(all).get
    val bodies = recs.tail.map(r => new String(all,
      r.contentStart.toInt, r.contentLen.toInt, "UTF-8"))
    // HTTP facts and digests survive; only the title walk is skipped
    assert(bodies(0).contains(""""Status":"200""""))
    assert(bodies(0).contains("Block-Digest"))
    assert(!bodies.exists(_.contains("HTML-Metadata")))
    // the path twin applies the same cap (byte-identical shards)
    val dir = java.nio.file.Files.createTempDirectory("sidecar_cap")
    val f = dir.resolve("shard.warc.gz")
    java.nio.file.Files.write(f, gz)
    val row = WarcSidecars.extractSidecarsByPath(
      Seq((1L, f.toString)).toDF("id", "path"), "id", "path",
      maxContentBytes = 10).collect().head
    assert(row.ok && row.wet_records === 1) // conversions capped away
    assert(java.util.Arrays.equals(row.wat, Warc.gzipPerRecord(wat)))
  }

  test("sidecarName follows the CC convention") {
    assert(WarcSidecars.sidecarName("a.warc.gz", "wet") === "a.warc.wet.gz")
    assert(WarcSidecars.sidecarName("a.warc", "wat") === "a.warc.wat.gz")
    assert(WarcSidecars.sidecarName("dump.bin", "wet") === "dump.bin.wet.gz")
    intercept[IllegalArgumentException] {
      WarcSidecars.sidecarName("a.warc.gz", "wot")
    }
  }
}
