package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** [[Warc]]: records must tile exactly with correct content/body
  * spans across plain and member-per-record-gzip streams, and the
  * strict walk must refuse malformed bytes.
  */
class WarcSpec extends AnyFunSuite {

  private def html(body: String): Array[Byte] =
    Warc.httpResponse(200, "OK",
      Seq(("Content-Type", "text/html; charset=utf-8")),
      body.getBytes("UTF-8"))

  private def sample: Array[Byte] = Warc.encodeSynthetic(Seq(
    ("warcinfo", "", "application/warc-fields",
      "software: graft\r\n".getBytes("ISO-8859-1")),
    ("request", "http://a.example/", "application/http; msgtype=request",
      "GET / HTTP/1.1\r\nHost: a.example\r\n\r\n".getBytes("ISO-8859-1")),
    ("response", "http://a.example/", "application/http; msgtype=response",
      html("<html><body><p>Hello</p></body></html>"))))

  test("records tile exactly; response records carry status + body spans") {
    val b = sample
    val rs = Warc.recordIndex(b).get
    assert(rs.length === 3)
    assert(rs.map(_.warcType) === Seq("warcinfo", "request", "response"))
    rs.sliding(2).foreach { case Seq(x, y) =>
      assert(x.byteStart + x.byteLen === y.byteStart)
    }
    assert(rs.last.byteStart + rs.last.byteLen === b.length)
    val resp = rs(2)
    assert(resp.httpStatus === 200)
    assert(resp.targetUri === "http://a.example/")
    val body = new String(b, resp.bodyStart.toInt, resp.bodyLen.toInt,
      "UTF-8")
    assert(body === "<html><body><p>Hello</p></body></html>")
    // request records parse HTTP too but carry no status (msgtype
    // request has no status line) — status -1
    assert(rs(1).httpStatus === -1)
    // the warcinfo record has no HTTP content at all
    assert(rs(0).httpStatus === -1 && rs(0).bodyStart === -1L)
  }

  test("member-per-record gzip (the Common Crawl shape) inflates and indexes") {
    val plain = sample
    val rs0 = Warc.recordIndex(plain).get
    // re-encode as one gzip member per record
    val members = rs0.map(r =>
      java.util.Arrays.copyOfRange(plain, r.byteStart.toInt,
        (r.byteStart + r.byteLen).toInt))
    val gz = Warc.gzipPerRecord(members)
    assert((gz(0) & 0xff) === 0x1f)
    val rs = Warc.recordIndexAuto(gz).get
    assert(rs.map(r => (r.warcType, r.byteStart, r.byteLen)) ===
      rs0.map(r => (r.warcType, r.byteStart, r.byteLen)))
    // plain bytes route straight through recordIndexAuto too
    assert(Warc.recordIndexAuto(plain).get.length === 3)
  }

  test("seekable and streaming walks agree with the in-memory walk exactly") {
    val plain = sample
    val mem = Warc.recordIndex(plain).get
    def key(r: Warc.WarcRecord) = (r.byteStart, r.byteLen, r.warcType,
      r.targetUri, r.contentStart, r.contentLen, r.httpStatus,
      r.bodyStart, r.bodyLen)
    // seekable over a temp file
    val f = java.io.File.createTempFile("graft-warc", ".warc")
    try {
      java.nio.file.Files.write(f.toPath, plain)
      val r = new graft.multimodal.Mp4Index.FileRangeReader(f.getPath)
      val seek = try Warc.recordIndexSeekable(r).get finally r.close()
      assert(seek.map(key) === mem.map(key))
      // streaming over the plain bytes
      val stream = Warc.recordIndexStreaming(
        new java.io.ByteArrayInputStream(plain)).get
      assert(stream.map(key) === mem.map(key))
      // streaming over the gzipped form (offsets = uncompressed)
      val members = mem.map(x => java.util.Arrays.copyOfRange(plain,
        x.byteStart.toInt, (x.byteStart + x.byteLen).toInt))
      val gzIn = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(Warc.gzipPerRecord(members)))
      assert(Warc.recordIndexStreaming(gzIn).get.map(key) === mem.map(key))
      // trailing CRLFs tolerate; mid-stream padding refuses in both
      assert(Warc.recordIndexStreaming(new java.io.ByteArrayInputStream(
        plain ++ "\r\n\r\n".getBytes)).get.length === 3)
      val padded = {
        val first = mem.head
        java.util.Arrays.copyOfRange(plain, 0,
          (first.byteStart + first.byteLen).toInt) ++
          "\r\n".getBytes ++
          java.util.Arrays.copyOfRange(plain,
            (first.byteStart + first.byteLen).toInt, plain.length)
      }
      assert(Warc.recordIndex(padded).isEmpty)
      assert(Warc.recordIndexStreaming(
        new java.io.ByteArrayInputStream(padded)).isEmpty)
    } finally f.delete()
  }

  test("seekable: a sparse >2GiB record archive indexes in header-sized I/O") {
    // one response record whose 2.3 GB content is a sparse hole, then
    // a small trailing record — only header blocks are ever read
    val bigLen = 2300000000L
    val httpHead = Warc.httpResponse(200, "OK",
      Seq(("Content-Type", "application/octet-stream")), Array.empty)
    val head1 = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://big.example/blob\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${httpHead.length + bigLen}\r\n\r\n")
      .getBytes("ISO-8859-1")
    val rec2 = Warc.encodeSynthetic(Seq(("metadata", "", "text/plain",
      "done".getBytes("ISO-8859-1"))))
    val f = java.io.File.createTempFile("graft-bigwarc", ".warc")
    try {
      val raf = new java.io.RandomAccessFile(f, "rw")
      raf.write(head1)
      raf.write(httpHead)
      val holeStart = raf.getFilePointer
      raf.setLength(holeStart + bigLen) // sparse content
      raf.seek(holeStart + bigLen)
      raf.write("\r\n\r\n".getBytes("ISO-8859-1"))
      raf.write(rec2)
      raf.close()
      assert(f.length > Int.MaxValue.toLong)
      var bytesRead = 0L
      val inner = new graft.multimodal.Mp4Index.FileRangeReader(f.getPath)
      val counting = new graft.multimodal.Mp4Index.RangeReader {
        def length: Long = inner.length
        def readFully(at: Long, len: Int): Array[Byte] = {
          bytesRead += len; inner.readFully(at, len)
        }
        def close(): Unit = inner.close()
      }
      val rs = try Warc.recordIndexSeekable(counting).get
        finally counting.close()
      assert(rs.length === 2)
      assert(rs.head.warcType === "response" &&
        rs.head.httpStatus === 200 &&
        rs.head.bodyLen === bigLen &&
        rs.head.bodyStart === holeStart)
      assert(rs(1).warcType === "metadata")
      assert(rs(1).byteStart + rs(1).byteLen === f.length)
      assert(bytesRead < 200000L, s"read $bytesRead bytes")
    } finally f.delete()
  }

  test("seekable re-probes the HTTP head when the record header nearly fills the probe") {
    // WARC headers ~63 KiB (a long X-Pad header), then an HTTP head
    // whose CRLFCRLF lies beyond the leftover of the 64 KiB record
    // probe — the walk must re-read from contentStart, matching the
    // in-memory result exactly
    val pad = "x" * (63 * 1024)
    val http = Warc.httpResponse(200, "OK",
      Seq(("Content-Type", "text/html"), ("X-Fill", "y" * 2048)),
      "<html><body>deep</body></html>".getBytes("UTF-8"))
    val head = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"X-Pad: $pad\r\n" +
      "WARC-Target-URI: http://deep.example/\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1")
    val b = head ++ http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val mem = Warc.recordIndex(b).get
    assert(mem.head.httpStatus === 200 && mem.head.bodyLen === 30)
    val f = java.io.File.createTempFile("graft-warc", ".warc")
    try {
      java.nio.file.Files.write(f.toPath, b)
      val r = new graft.multimodal.Mp4Index.FileRangeReader(f.getPath)
      val seek = try Warc.recordIndexSeekable(r).get finally r.close()
      assert(seek.head.httpStatus === 200)
      assert(seek.head.bodyStart === mem.head.bodyStart)
      assert(seek.head.bodyLen === mem.head.bodyLen)
    } finally f.delete()
  }

  test("gunzipAll's output cap refuses instead of allocating") {
    val big = Warc.gzipPerRecord(Seq(new Array[Byte](100000)))
    assert(Warc.gunzipAll(big).isDefined)
    assert(Warc.gunzipAll(big, maxBytes = 50000L).isEmpty)
  }

  test("strictness: junk, truncation, bad lengths, missing framing refuse") {
    assert(Warc.recordIndex(Array[Byte](9, 9, 9)).isEmpty)
    assert(Warc.recordIndex(Array.empty[Byte]).isEmpty)
    assert(Warc.recordIndex("HTTP/1.1 200 OK\r\n\r\n".getBytes).isEmpty)
    val b = sample
    // truncate inside the last record's content
    assert(Warc.recordIndex(b.dropRight(5)).isEmpty)
    // corrupt a Content-Length digit → framing no longer lands on CRLFCRLF
    val idx = new String(b, "ISO-8859-1").indexOf("Content-Length: 17")
    if (idx >= 0) {
      val c = b.clone(); c(idx + 16) = '9'
      assert(Warc.recordIndex(c).isEmpty)
    }
    // trailing CRLFs after the last record are tolerated
    assert(Warc.recordIndex(b ++ "\r\n\r\n".getBytes("ISO-8859-1")).get
      .length === 3)
    // gzip junk refuses
    assert(Warc.gunzipAll(Array[Byte](0x1f, 0x8b.toByte, 9, 9)).isEmpty)
  }
}
