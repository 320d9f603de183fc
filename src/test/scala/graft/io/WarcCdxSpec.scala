package graft.io

import graft.SparkSpec

/** CDX indexing + hydration ([[WarcCdx]]): SURT keys, timestamps,
  * block digests, gzip-member spans (streaming walk vs
  * [[GzipMembers.memberIndex]] parity), byte-column vs by-path
  * parity on both carriages, member/asset refusal postures, CDXJ
  * round-trip, and CDX-driven selective hydration with digest
  * integrity across the fetch.
  */
class WarcCdxSpec extends SparkSpec {
  implicit private def s = spark
  import spark.implicits._

  private def resp(uri: String, date: String, body: String,
      ct: String = "text/html", status: Int = 200): Array[Byte] =
    Warc.encodeSyntheticHeaders(Seq((Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:uuid:$uri>",
      "WARC-Date" -> date,
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=response"),
      Warc.httpResponse(status, "OK",
        Seq("Content-Type" -> s"$ct; charset=utf-8"),
        body.getBytes("UTF-8")))))

  private def req(uri: String, date: String): Array[Byte] =
    Warc.encodeSyntheticHeaders(Seq((Seq(
      "WARC-Type" -> "request",
      "WARC-Record-ID" -> s"<urn:uuid:req-$uri>",
      "WARC-Date" -> date,
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=request"),
      s"GET / HTTP/1.1\r\nHost: h\r\n\r\n".getBytes("ISO-8859-1"))))

  private val recs = Seq(
    resp("http://www.Example.COM:80/A/B?b=2&a=1&utm_x=9#frag",
      "2024-03-05T06:07:08Z",
      "<html><head><title>T1</title></head><body><p>Hello CDX</p></body></html>"),
    req("http://www.example.com/a/b", "2024-03-05T06:07:08Z"),
    resp("https://sub.test.org:8443/X", "2024-03-05T06:07:09Z",
      "plain text here", ct = "text/plain"))
  private def gz: Array[Byte] = Warc.gzipPerRecord(recs)
  private def plain: Array[Byte] = recs.reduce(_ ++ _)

  test("surtKey: the documented SURT variant") {
    assert(WarcCdx.surtKey(
      "http://www.Example.COM:80/A/B?b=2&a=1&utm_x=9#frag") ===
      "com,example)/a/b?a=1&b=2")
    assert(WarcCdx.surtKey("https://sub.test.org:8443/X") ===
      "org,test,sub:8443)/x")
    assert(WarcCdx.surtKey("http://user:pw@WWW2.foo.bar/") === "bar,foo)/")
    assert(WarcCdx.surtKey("http://192.168.1.10/a") === "192.168.1.10)/a")
    assert(WarcCdx.surtKey("http://[::1]:8080/x") === "[::1]:8080)/x")
    assert(WarcCdx.surtKey("https://example.com") === "com,example)/")
    assert(WarcCdx.surtKey("https://example.com:443/") === "com,example)/")
    assert(WarcCdx.surtKey("not a url") === "not a url")
    assert(WarcCdx.timestamp14("2024-03-05T06:07:08Z") === "20240305060708")
    assert(WarcCdx.timestamp14("nonsense") === "")
  }

  test("surtKey strips the IA/CC session-id params and path segments") {
    // query params on the strip list — the published CC urlkeys for
    // session-bearing URLs
    assert(WarcCdx.surtKey(
      "http://example.com/page?jsessionid=1A2B&a=1") ===
      "com,example)/page?a=1")
    assert(WarcCdx.surtKey("http://example.com/?PHPSESSID=deadbeef") ===
      "com,example)/")
    assert(WarcCdx.surtKey("http://example.com/x?sid=9&b=2") ===
      "com,example)/x?b=2")
    assert(WarcCdx.surtKey(
      "http://example.com/x?ASPSESSIONIDQQGGGQZC=JLKOPM&b=2") ===
      "com,example)/x?b=2")
    // bare (no '=') session param strips too
    assert(WarcCdx.surtKey("http://example.com/x?sid") ===
      "com,example)/x")
    // the servlet matrix form rides the PATH, not the query
    assert(WarcCdx.surtKey(
      "http://example.com/cart;jsessionid=ABC123?item=5") ===
      "com,example)/cart?item=5")
    assert(WarcCdx.surtKey(
      "http://example.com/a;jsessionid=X/b") === "com,example)/a/b")
    // names that merely share a prefix/suffix survive
    assert(WarcCdx.surtKey("http://example.com/x?side=1") ===
      "com,example)/x?side=1")
    assert(WarcCdx.surtKey("http://example.com/x?jsessionid2=x") ===
      "com,example)/x?jsessionid2=x")
    assert(WarcCdx.surtKey("http://example.com/x?mysid=1") ===
      "com,example)/x?mysid=1")
  }

  test("surtKey is total on fuzzed inputs") {
    val rng = new java.util.Random(42)
    val alphabet =
      "abcXYZ019:/?#@&=.,;%[]{}()<>\\\"'`~!$^*+|\n\r\t é中"
    (0 until 5000).foreach { _ =>
      val len = rng.nextInt(40)
      val sb = new StringBuilder()
      (0 until len).foreach(_ =>
        sb.append(alphabet(rng.nextInt(alphabet.length))))
      val s = if (rng.nextBoolean()) "http://" + sb else sb.toString
      val k = WarcCdx.surtKey(s) // must never throw
      assert(k != null)
    }
  }

  test("base32 SHA-1 matches the published empty-input vector") {
    // SHA-1("") = da39a3ee…; its RFC 4648 base32 form is well-known
    assert(WarcCdx.sha1Base32(Array.empty[Byte], 0, 0) ===
      "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
  }

  test("cdxIndex over .warc.gz: fields, spans, independent digest") {
    val idx = WarcCdx.cdxIndex(gz).get
    assert(idx.length === 3)
    assert(idx.forall(_.parsed))
    // fields of the first response
    val e0 = idx(0)
    assert(e0.urlkey === "com,example)/a/b?a=1&b=2")
    assert(e0.timestamp === "20240305060708")
    assert(e0.url === "http://www.Example.COM:80/A/B?b=2&a=1&utm_x=9#frag")
    assert(e0.mime === "text/html")
    assert(e0.status === 200)
    assert(e0.warcType === "response")
    // the request record: no status, record's own content-type
    assert(idx(1).status === -1)
    assert(idx(1).mime === "application/http")
    assert(idx(2).mime === "text/plain")
    // spans = the gzip members, tiling the archive exactly
    val members = GzipMembers.memberIndex(gz).get
    assert(idx.map(e => (e.offset, e.length, e.uncompLen)) ===
      members.map(m => (m.compStart, m.compLen, m.uncompLen)))
    assert(idx.last.offset + idx.last.length === gz.length.toLong)
    // digest = SHA-1(content block), base32 — recomputed independently
    val rec0 = recs(0)
    val blank = (0 until rec0.length - 3).find(i =>
      rec0(i) == '\r' && rec0(i + 1) == '\n' && rec0(i + 2) == '\r' &&
        rec0(i + 3) == '\n').get
    val contentLen = rec0.length - (blank + 4) - 4 // minus terminator
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(rec0, blank + 4, contentLen)
    assert(e0.digest === WarcCdx.base32(md.digest()))
    assert(idx.forall(_.digest.matches("[A-Z2-7]{32}")))
  }

  test("payload digest: the transfer-decoded HTTP body; block unchanged") {
    val idx = WarcCdx.cdxIndex(gz).get
    // response: payload = the entity body, so the payload digest is
    // SHA-1(body) — recomputed independently — and differs from the
    // block digest (which also covers the HTTP head)
    val body0 = ("<html><head><title>T1</title></head><body><p>Hello " +
      "CDX</p></body></html>").getBytes("UTF-8")
    assert(idx(0).payloadDigest ===
      WarcCdx.sha1Base32(body0, 0, body0.length))
    assert(idx(0).payloadDigest !== idx(0).digest)
    // request: empty entity body — the published empty-input vector
    assert(idx(1).payloadDigest === "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
    // non-http record: payload IS the content block
    val res = Warc.encodeSyntheticHeaders(Seq((Seq(
      "WARC-Type" -> "resource",
      "WARC-Target-URI" -> "http://a.example/r",
      "WARC-Date" -> "2024-03-05T06:07:08Z",
      "Content-Type" -> "text/plain"), "raw bytes".getBytes("UTF-8"))))
    val rIdx = WarcCdx.cdxIndex(Warc.gzipPerRecord(Seq(res))).get
    assert(rIdx.head.payloadDigest === rIdx.head.digest)
  }

  test("chunked transfer-encoding: payload digest is of the DECODED body") {
    val decoded = "Hello chunked payload".getBytes("UTF-8")
    val chunked = "7\r\nHello c\r\nE\r\nhunked payload\r\n0\r\n\r\n"
      .getBytes("ISO-8859-1")
    val rec = Warc.encodeSyntheticHeaders(Seq((Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:chunked>",
      "WARC-Date" -> "2024-03-05T06:07:08Z",
      "WARC-Target-URI" -> "http://a.example/chunked",
      "Content-Type" -> "application/http; msgtype=response"),
      Warc.httpResponse(200, "OK",
        Seq("Content-Type" -> "text/plain",
          "Transfer-Encoding" -> "chunked"), chunked))))
    val idx = WarcCdx.cdxIndex(Warc.gzipPerRecord(Seq(rec))).get
    assert(idx.head.payloadDigest ===
      WarcCdx.sha1Base32(decoded, 0, decoded.length))
    // malformed chunking falls back to the raw-body digest (total)
    val badChunk = "ZZ\r\nnot hex\r\n".getBytes("ISO-8859-1")
    val bad = Warc.encodeSyntheticHeaders(Seq((Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:badchunk>",
      "WARC-Date" -> "2024-03-05T06:07:08Z",
      "WARC-Target-URI" -> "http://a.example/bad",
      "Content-Type" -> "application/http; msgtype=response"),
      Warc.httpResponse(200, "OK",
        Seq("Transfer-Encoding" -> "chunked"), badChunk))))
    val bIdx = WarcCdx.cdxIndex(Warc.gzipPerRecord(Seq(bad))).get
    assert(bIdx.head.parsed)
    assert(bIdx.head.payloadDigest ===
      WarcCdx.sha1Base32(badChunk, 0, badChunk.length))
    // dechunk itself: framing violations are None, never throws
    assert(WarcCdx.dechunk("5\r\nab".getBytes("ISO-8859-1"), 0, 5).isEmpty)
    assert(WarcCdx.dechunk(Array.empty[Byte], 0, 0).isEmpty)
    // the size-line scan is capped: a corrupt body with no CRLF in
    // its first KB refuses without stringifying the whole body
    val noCrlf = Array.fill[Byte](1 << 20)('a')
    assert(WarcCdx.dechunk(noCrlf, 0, noCrlf.length).isEmpty)
    val lateCrlf = Array.fill[Byte](4096)('1')
    lateCrlf(2000) = '\r'; lateCrlf(2001) = '\n'
    assert(WarcCdx.dechunk(lateCrlf, 0, lateCrlf.length).isEmpty)
    // a size line with a sub-cap extension still decodes
    val ext = ("3;" + "x" * 100 + "\r\nabc\r\n0\r\n\r\n")
      .getBytes("ISO-8859-1")
    assert(WarcCdx.dechunk(ext, 0, ext.length)
      .map(new String(_, "ISO-8859-1")) === Some("abc"))
  }

  test("hydrateByCdx verifies against a published-style payload-digest index") {
    // the Common Crawl consumption contract end-to-end: serialize the
    // index to CDXJ (digest field = PAYLOAD digest, the published
    // convention), parse it back as a consumer would a cdx-*.gz row,
    // hydrate the selected member, and match the recomputed payload
    // digest against the INDEX row's digest
    val dir = java.nio.file.Files.createTempDirectory("cdx_pub")
    val f = dir.resolve("shard.warc.gz")
    java.nio.file.Files.write(f, gz)
    val cdx = WarcCdx.extractCdx(Seq((1L, gz)).toDF("id", "bytes"),
      "id", "bytes").collect()
    val lines = cdx.map(WarcCdx.cdxjLine(_, "shard.warc.gz")).toSeq
    val parsed = WarcCdx.parseCdxj(lines.toDF("line"), "line")
      .filter(org.apache.spark.sql.functions.col("mime") === "text/html")
      .withColumn("path", org.apache.spark.sql.functions.lit(f.toString))
    val hydrated = WarcCdx.hydrateByCdx(parsed, "offset", "path",
      "offset", "length").collect()
    assert(hydrated.length === 1 && hydrated.head.hydrated)
    val pubDigest = parsed.select("digest").collect().head.getString(0)
    assert(hydrated.head.payload_digest === pubDigest)
    // and the block digest still matches the self-built index row
    assert(hydrated.head.digest === cdx.find(_.record_idx == 0).get.digest)
  }

  test("uncompressed archives index with raw record spans") {
    val idx = WarcCdx.cdxIndex(plain).get
    val gzIdx = WarcCdx.cdxIndex(gz).get
    assert(idx.map(e => (e.urlkey, e.timestamp, e.url, e.mime, e.status,
      e.digest, e.warcType)) ===
      gzIdx.map(e => (e.urlkey, e.timestamp, e.url, e.mime, e.status,
        e.digest, e.warcType)))
    val spans = Warc.recordIndex(plain).get
    assert(idx.map(e => (e.offset, e.length)) ===
      spans.map(r => (r.byteStart, r.byteLen)))
  }

  test("byte-column and by-path walks agree on both carriages") {
    val dir = java.nio.file.Files.createTempDirectory("cdx_parity")
    val gzF = dir.resolve("a.warc.gz"); val plF = dir.resolve("b.warc")
    java.nio.file.Files.write(gzF, gz)
    java.nio.file.Files.write(plF, plain)
    val mem = WarcCdx.extractCdx(
      Seq((1L, gz), (2L, plain)).toDF("id", "bytes"), "id", "bytes")
      .collect().sortBy(r => (r.asset_id, r.record_idx))
    val byPath = WarcCdx.extractCdxByPath(
      Seq((1L, gzF.toString), (2L, "file://" + plF.toString))
        .toDF("id", "path"), "id", "path")
      .collect().sortBy(r => (r.asset_id, r.record_idx))
    assert(mem.toSeq === byPath.toSeq)
    assert(mem.length === 6 && mem.forall(r => r.indexed && r.parsed))
  }

  test("a member holding two records flags that member, walk continues") {
    val twoInOne = Warc.gzipPerRecord(Seq(recs(0) ++ recs(1), recs(2)))
    val idx = WarcCdx.cdxIndex(twoInOne).get
    assert(idx.length === 2)
    assert(!idx(0).parsed && idx(0).urlkey === "")
    assert(idx(1).parsed && idx(1).mime === "text/plain")
    // spans stay correct even for the flagged member
    val members = GzipMembers.memberIndex(twoInOne).get
    assert(idx.map(e => (e.offset, e.length)) ===
      members.map(m => (m.compStart, m.compLen)))
  }

  test("CRC corruption and trailing garbage refuse the asset") {
    val bad = gz.clone()
    // flip a byte inside the FIRST member's deflate stream
    bad(20) = (bad(20) ^ 0x5a).toByte
    assert(WarcCdx.cdxIndex(bad).isEmpty)
    assert(WarcCdx.cdxIndex(gz ++ Array[Byte](1, 2, 3)).isEmpty)
    assert(WarcCdx.cdxIndex(Array[Byte](9, 9)).isEmpty)
    assert(WarcCdx.cdxIndex(Array.empty[Byte]).isEmpty)
  }

  test("members past maxRecordBytes flag but keep spans; walk continues") {
    val idx = WarcCdx.cdxIndex(gz, maxRecordBytes = 16).get
    assert(idx.length === 3)
    assert(idx.forall(e => !e.parsed && e.length > 0 && e.uncompLen > 16))
    val members = GzipMembers.memberIndex(gz).get
    assert(idx.map(e => (e.offset, e.length)) ===
      members.map(m => (m.compStart, m.compLen)))
    // the PLAIN carriage applies the SAME cap posture (parity with
    // the gzip walk and the by-path twin): spans kept, parsed=false
    val plainIdx = WarcCdx.cdxIndex(plain, maxRecordBytes = 16).get
    assert(plainIdx.length === 3)
    assert(plainIdx.forall(e => !e.parsed && e.length > 16))
    assert(plainIdx.map(e => (e.offset, e.length)) ===
      Warc.recordIndex(plain).get.map(r => (r.byteStart, r.byteLen)))
  }

  test("cdxjLine escapes space-bearing urlkeys so the line stays 3 tokens") {
    // a dirty non-URL WARC-Target-URI passes through surtKey totally
    val row = WarcCdx.CdxRow(1L, 0, "not a url", "20240305060708",
      "not a url", "text/plain", 200, "X" * 32, "Y" * 32, 0L, 10L, 10L,
      "response", parsed = true, indexed = true)
    val line = WarcCdx.cdxjLine(row, "a.warc.gz")
    assert(line.startsWith("not%20a%20url 20240305060708 {"))
    val p = WarcCdx.parseCdxj(Seq(line).toDF("line"), "line").collect()(0)
    assert(p.getAs[String]("urlkey") === "not%20a%20url")
    assert(p.getAs[String]("timestamp") === "20240305060708")
    assert(p.getAs[String]("url") === "not a url") // JSON field intact
    // the other structural characters a dirty key can smuggle in:
    // line terminators (a lone \n inside a header VALUE survives the
    // CRLF header split) and '{' (parseCdxj's JSON-start probe)
    val dirty = row.copy(urlkey = "a\nb\rc\td{e")
    val l2 = WarcCdx.cdxjLine(dirty, "a.warc.gz")
    assert(!l2.exists(c => c == '\n' || c == '\r' || c == '\t'))
    assert(l2.startsWith("a%0Ab%0Dc%09d%7Be 20240305060708 {"))
    val p2 = WarcCdx.parseCdxj(Seq(l2).toDF("line"), "line").collect()(0)
    assert(p2.getAs[String]("urlkey") === "a%0Ab%0Dc%09d%7Be")
    assert(p2.getAs[String]("filename") === "a.warc.gz")
  }

  test("parseCdxj: corrupt lines are null-field rows, never job kills") {
    // the never-kill contract under Spark 4's default ANSI mode: a
    // blank line, a space-less line, a 2-token truncated line, and a
    // 3-token line whose third token is not JSON all flag (null
    // fields, line kept) instead of throwing INVALID_ARRAY_INDEX
    val lines = Seq(
      "",                               // blank line mid-shard
      "garbage",                        // no space at all
      "com,example)/ 20240305060708",   // truncated: no JSON token
      "a b notjson",                    // 3 tokens, no JSON object
      "com,example)/ 20240305060708 " +
        """{"url": "http://example.com/", "mime": "text/html", """ +
        """"status": "200", "digest": "D", "length": "10", """ +
        """"offset": "0", "filename": "a.warc.gz"}""")
    val p = WarcCdx.parseCdxj(lines.toDF("line"), "line")
      .collect().sortBy(_.getAs[String]("line"))
    assert(p.length === 5)
    val good = p.filter(_.getAs[String]("filename") != null)
    assert(good.length === 1)
    assert(good.head.getAs[String]("urlkey") === "com,example)/")
    assert(good.head.getAs[Int]("status") === 200)
    p.filter(_.getAs[String]("filename") == null).foreach { r =>
      assert(r.getAs[String]("urlkey") == null)
      assert(r.getAs[String]("timestamp") == null)
      assert(r.getAs[String]("line") != null) // the line stays visible
    }
  }

  test("parseCdxj: '-' placeholders in numeric fields read as null") {
    // published wayback/CDX data uses '-' for unknown numeric fields;
    // under ANSI a plain cast would throw CAST_INVALID_INPUT
    val line = "com,example)/ 20240305060708 " +
      """{"url": "http://example.com/", "mime": "warc/revisit", """ +
      """"status": "-", "digest": "D", "length": "-", """ +
      """"offset": "-", "filename": "a.warc.gz"}"""
    val p = WarcCdx.parseCdxj(Seq(line).toDF("line"), "line").collect()(0)
    assert(p.getAs[String]("urlkey") === "com,example)/")
    assert(p.getAs[String]("mime") === "warc/revisit")
    assert(p.isNullAt(p.fieldIndex("status")))
    assert(p.isNullAt(p.fieldIndex("length")))
    assert(p.isNullAt(p.fieldIndex("offset")))
    assert(p.getAs[String]("filename") === "a.warc.gz")
  }

  test("parseCdxj: published-style percent-encoded urlkeys pass verbatim") {
    // a urlkey whose %20 is the ORIGINAL URL's percent-encoding (the
    // published-index case) must NOT be decoded — it joins against
    // surtKey output byte-for-byte
    assert(WarcCdx.surtKey("http://example.com/a%20b") ===
      "com,example)/a%20b")
    val line = "com,example)/a%20b 20240305060708 " +
      """{"url": "http://example.com/a%20b", "mime": "text/html", """ +
      """"status": "200", "digest": "D", "length": "5", """ +
      """"offset": "0", "filename": "a.warc.gz"}"""
    val p = WarcCdx.parseCdxj(Seq(line).toDF("line"), "line").collect()(0)
    assert(p.getAs[String]("urlkey") === "com,example)/a%20b")
    assert(p.getAs[String]("urlkey") ===
      WarcCdx.surtKey("http://example.com/a%20b"))
  }

  test("parseCdxj: line columns needing backtick quoting resolve") {
    val df = Seq("com,example)/ 20240305060708 " +
      """{"url": "u", "mime": "m", "status": "200", "digest": "D", """ +
      """"length": "1", "offset": "0", "filename": "f"}""")
      .toDF("cdx.line")
    val p = WarcCdx.parseCdxj(df, "cdx.line").collect()(0)
    assert(p.getAs[String]("urlkey") === "com,example)/")
    assert(p.getAs[String]("filename") === "f")
  }

  test("streaming walk survives members larger than its 64 KiB buffer") {
    // incompressible body → compressed member well past one buffer
    val rng = new java.util.Random(7)
    val blob = new Array[Byte](200 * 1024)
    rng.nextBytes(blob)
    val big = Warc.encodeSyntheticHeaders(Seq((Seq(
      "WARC-Type" -> "resource",
      "WARC-Target-URI" -> "http://big.example/blob",
      "WARC-Date" -> "2024-03-05T06:07:10Z",
      "Content-Type" -> "application/octet-stream"), blob)))
    val shard = Warc.gzipPerRecord(Seq(big, recs(2)))
    val idx = WarcCdx.cdxIndex(shard).get
    assert(idx.length === 2 && idx.forall(_.parsed))
    assert(idx(0).uncompLen === big.length.toLong)
    assert(idx(0).length > 64 * 1024)
    val members = GzipMembers.memberIndex(shard).get
    assert(idx.map(e => (e.offset, e.length, e.uncompLen)) ===
      members.map(m => (m.compStart, m.compLen, m.uncompLen)))
    assert(idx(1).mime === "text/plain")
  }

  test("CDXJ lines round-trip through parseCdxj") {
    val cdx = WarcCdx.extractCdx(Seq((1L, gz)).toDF("id", "bytes"),
      "id", "bytes").collect().sortBy(_.record_idx)
    val lines = cdx.map(WarcCdx.cdxjLine(_, "a.warc.gz")).toSeq
    assert(lines.head.startsWith("com,example)/a/b?a=1&b=2 20240305060708 {"))
    val parsed = WarcCdx.parseCdxj(lines.toDF("line"), "line")
      .orderBy("offset").collect()
    parsed.zip(cdx).foreach { case (p, e) =>
      assert(p.getAs[String]("urlkey") === e.urlkey)
      assert(p.getAs[String]("timestamp") === e.timestamp)
      assert(p.getAs[String]("url") === e.url)
      assert(p.getAs[String]("mime") === e.mime)
      assert(p.getAs[Int]("status") === e.status)
      // the CDXJ digest field is the PAYLOAD digest (the published
      // CC convention), not the block digest
      assert(p.getAs[String]("digest") === e.payload_digest)
      assert(p.getAs[Long]("offset") === e.offset)
      assert(p.getAs[Long]("length") === e.length)
      assert(p.getAs[String]("filename") === "a.warc.gz")
    }
  }

  test("hydrateByCdx: filtered fetch, digest integrity, refusal row") {
    val dir = java.nio.file.Files.createTempDirectory("cdx_hydrate")
    val f = dir.resolve("shard.warc.gz")
    java.nio.file.Files.write(f, gz)
    val cdx = WarcCdx.extractCdxByPath(
      Seq((1L, f.toString)).toDF("id", "path"), "id", "path")
    // the consumption pattern: filter the INDEX, fetch only matches
    val wanted = cdx.filter(r => r.parsed && r.mime == "text/html" &&
      r.status == 200)
      .toDF().withColumn("path",
        org.apache.spark.sql.functions.lit(f.toString))
    val hydrated = WarcCdx.hydrateByCdx(wanted, "record_idx", "path",
      "offset", "length").collect()
    assert(hydrated.length === 1)
    val h = hydrated.head
    assert(h.hydrated && h.status === 200 && h.mime === "text/html")
    assert(h.title === "T1" && h.text.contains("Hello CDX"))
    // digest recomputed from FETCHED bytes equals the index's digest
    val idxDigest = cdx.collect().find(_.record_idx == 0).get.digest
    assert(h.digest === idxDigest)
    // refusal posture: a tampered offset flags, never throws
    val bad = Seq((9L, f.toString, 1L << 30, 10L))
      .toDF("record_idx", "path", "offset", "length")
    val r = WarcCdx.hydrateByCdx(bad, "record_idx", "path", "offset",
      "length").collect()
    assert(r.length === 1 && !r.head.hydrated)
  }
}
