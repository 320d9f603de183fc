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
