package graft.io

import graft.SparkSpec

/** The Spark seams over [[Warc]]: row extraction, the composed
  * HTML-page path, and by-path routing (plain → seekable, gzip →
  * streaming) with flagged fallbacks.
  */
class WarcSparkSpec extends SparkSpec {
  implicit private def s = spark
  import spark.implicits._

  private def sample: Array[Byte] = Warc.encodeSynthetic(Seq(
    ("warcinfo", "", "application/warc-fields",
      "software: graft\r\n".getBytes("ISO-8859-1")),
    ("response", "http://a.example/", "application/http; msgtype=response",
      Warc.httpResponse(200, "OK", Seq(("Content-Type", "text/html")),
        "<html><body><p>Hi there</p></body></html>".getBytes("UTF-8")))))

  test("extractRecords and extractHtmlPages over byte columns") {
    val df = Seq((1L, sample), (2L, Array[Byte](9, 9, 9)))
      .toDF("id", "bytes")
    val rows = Warc.extractRecords(df, "id", "bytes").collect()
      .sortBy(r => (r.asset_id, r.record_idx))
    assert(rows.count(_.indexed) === 2)
    assert(rows.count(r => !r.indexed && r.asset_id == 2L) === 1)
    val pages = Warc.extractHtmlPages(df, "id", "bytes").collect()
      .sortBy(p => (p.asset_id, p.record_idx))
    assert(pages.length === 2)
    assert(pages.head.text === "Hi there" && pages.head.extracted)
    assert(!pages(1).extracted)
  }

  test("declared charsets decode: ISO-8859-1 via HTTP header, meta tag in body") {
    val latin = "<html><body><p>café prêt</p></body></html>"
      .getBytes("ISO-8859-1")
    val metaCp = ("<html><head><meta charset=windows-1252></head>" +
      "<body><p>déjà</p></body></html>")
      .getBytes("windows-1252")
    val b = Warc.encodeSynthetic(Seq(
      ("response", "http://l.example/", "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/html; charset=ISO-8859-1")), latin)),
      ("response", "http://m.example/", "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/html")), metaCp))))
    val pages = Warc.extractHtmlPages(
      Seq((1L, b)).toDF("id", "bytes"), "id", "bytes")
      .collect().sortBy(_.record_idx)
    assert(pages(0).text === "café prêt")
    assert(pages(1).text === "déjà")
    // charset= in an UNRELATED header or URL must not hijack the
    // decode; a QUOTED Content-Type charset must still parse
    val tricky = Warc.encodeSynthetic(Seq(
      ("response", "http://t.example/", "application/http; msgtype=response",
        Warc.httpResponse(200, "OK", Seq(
          ("Link", "</alt?charset=gbk>; rel=alternate"),
          ("Content-Type", "text/html; charset=\"iso-8859-1\"")),
          "<html><body><p>naïve</p></body></html>"
            .getBytes("ISO-8859-1")))))
    val tp = Warc.extractHtmlPages(
      Seq((1L, tricky)).toDF("id", "bytes"), "id", "bytes").collect()
    assert(tp.head.text === "naïve")
  }

  test("zip HTML members extract to text; non-HTML and junk are skipped/flagged") {
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    def put(name: String, body: String): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      z.putNextEntry(e); z.write(body.getBytes("UTF-8")); z.closeEntry()
    }
    put("a/one.html",
      "<html><head><title>T1</title></head><body><p>Alpha beta.</p></body></html>")
    put("notes.txt", "not html")
    put("two.XHTML", "<html><body><div>Gamma</div></body></html>")
    z.close()
    val zipBytes = out.toByteArray
    val rows = ZipIndex.extractHtmlMembers(
      Seq((1L, zipBytes), (2L, Array[Byte](9, 9))).toDF("id", "bytes"),
      "id", "bytes").collect().sortBy(r => (r.asset_id, r.entry_idx))
    val good = rows.filter(_.asset_id == 1L)
    assert(good.map(_.name).toSeq === Seq("a/one.html", "two.XHTML"))
    assert(good.map(_.text).toSeq === Seq("Alpha beta.", "Gamma"))
    assert(good.map(_.title).toSeq === Seq("T1", ""))
    assert(rows.count(r => r.asset_id == 2L && !r.extracted) === 1)
  }

  test("zip members honor their declared charset (meta tag / XML prolog)") {
    // a legacy-encoded EPUB chapter decoded as UTF-8 unconditionally
    // turns every non-ASCII character into U+FFFD — honor the same
    // declarations the WARC path does: <meta charset=…>, plus the
    // XML prolog encoding= (the usual EPUB XHTML shape)
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    def put(name: String, body: Array[Byte]): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body); z.closeEntry()
    }
    put("meta.html",
      ("<html><head><meta charset=windows-1251></head>" +
        "<body><p>привет</p></body></html>")
        .getBytes("windows-1251"))
    put("prolog.xhtml",
      ("<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?>" +
        "<html><body><p>café</p></body></html>")
        .getBytes("ISO-8859-1"))
    put("plain.html",
      "<html><body><p>déjà</p></body></html>".getBytes("UTF-8"))
    z.close()
    val rows = ZipIndex.extractHtmlMembers(
      Seq((1L, out.toByteArray)).toDF("id", "bytes"), "id", "bytes")
      .collect().sortBy(_.entry_idx)
    assert(rows.map(_.text).toSeq ===
      Seq("привет", "café",
        "déjà"))
  }

  test("extractHtmlPagesByPath matches the in-memory page walk on both routes") {
    val plain = sample
    val wantPages = Warc.extractHtmlPages(
      Seq((0L, plain)).toDF("id", "bytes"), "id", "bytes")
      .collect().map(p => (p.record_idx, p.target_uri, p.title, p.text))
      .toSeq.sorted
    val mem = Warc.recordIndex(plain).get
    val members = mem.map(r => java.util.Arrays.copyOfRange(plain,
      r.byteStart.toInt, (r.byteStart + r.byteLen).toInt))
    val fp = java.io.File.createTempFile("graft-pages", ".warc")
    val fg = java.io.File.createTempFile("graft-pages", ".warc.gz")
    try {
      java.nio.file.Files.write(fp.toPath, plain)
      java.nio.file.Files.write(fg.toPath, Warc.gzipPerRecord(members))
      val df = Seq((1L, fp.getPath), (2L, "file:" + fg.getPath),
        (3L, "/nonexistent/x.warc")).toDF("id", "path")
      val rows = Warc.extractHtmlPagesByPath(df, "id", "path").collect()
      for (id <- Seq(1L, 2L)) {
        val got = rows.filter(_.asset_id == id)
          .map(p => (p.record_idx, p.target_uri, p.title, p.text))
          .toSeq.sorted
        assert(got === wantPages, s"asset $id")
      }
      assert(rows.count(r => r.asset_id == 3L && !r.extracted) === 1)
      // the content cap SKIPS oversize responses instead of truncating
      val capped = Warc.extractHtmlPagesByPath(
        Seq((1L, fp.getPath)).toDF("id", "path"), "id", "path",
        maxContentBytes = 10L).collect()
      assert(capped.count(_.extracted) === 0)
      // a >2 GiB caller cap is clamped, never wrapped through toInt
      val bigCap = Warc.extractHtmlPagesByPath(
        Seq((1L, fp.getPath)).toDF("id", "path"), "id", "path",
        maxContentBytes = 3L << 30).collect()
      assert(bigCap.count(_.extracted) === wantPages.length)
    } finally { fp.delete(); fg.delete() }
  }

  test("extractRecordsByPath routes plain files seekable and .gz streaming") {
    val plain = sample
    val mem = Warc.recordIndex(plain).get
    val members = mem.map(r => java.util.Arrays.copyOfRange(plain,
      r.byteStart.toInt, (r.byteStart + r.byteLen).toInt))
    val fp = java.io.File.createTempFile("graft-warc", ".warc")
    val fg = java.io.File.createTempFile("graft-warc", ".warc.gz")
    try {
      java.nio.file.Files.write(fp.toPath, plain)
      java.nio.file.Files.write(fg.toPath, Warc.gzipPerRecord(members))
      val df = Seq((1L, fp.getPath), (2L, fg.getPath),
        (3L, "/nonexistent/x.warc")).toDF("id", "path")
      val rows = Warc.extractRecordsByPath(df, "id", "path").collect()
        .sortBy(r => (r.asset_id, r.record_idx))
      for (id <- Seq(1L, 2L)) {
        val rs = rows.filter(_.asset_id == id)
        assert(rs.map(r => (r.record_idx, r.byte_start, r.warc_type)).toSeq
          === mem.map(r => (r.recordIdx, r.byteStart, r.warcType)),
          s"asset $id")
      }
      assert(rows.count(r => r.asset_id == 3L && !r.indexed) === 1)
    } finally { fp.delete(); fg.delete() }
  }
}
