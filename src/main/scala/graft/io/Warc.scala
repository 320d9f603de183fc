package graft.io

/** WARC RECORD INDEXING (ISO 28500 / the WARC 1.0-1.1 format, public
  * spec — the shape Common Crawl and every web archive ships) — the
  * front door of a web-scale text corpus: a crawl dump is a
  * concatenation of WARC records (request/response/warcinfo/
  * metadata), and the pipeline needs per-record byte spans, the
  * WARC headers that drive routing (type, target URI, content
  * type), and — for `response` records — the HTTP status and the
  * BODY span (the HTML the text pipeline actually wants), all
  * without materializing anything but the header blocks.
  *
  * Record shape (spec §4): `WARC/1.0` or `WARC/1.1` version line,
  * CRLF-separated `Name: value` headers, an empty line, then
  * exactly `Content-Length` content octets, then two CRLFs. For
  * `application/http` response content the HTTP head (status line +
  * headers + CRLFCRLF) precedes the body.
  *
  * Compression: Common Crawl `.warc.gz` files are MEMBER-PER-RECORD
  * gzip; [[gunzipAll]] inflates all members (java.util.zip handles
  * the concatenation) and the index then addresses the UNCOMPRESSED
  * stream — the documented contract, since per-member raw offsets
  * are a property of the compressed artifact, not of the records.
  *
  * Strictness (the container family's sniff contract): the stream
  * must open with a WARC version line, every record's header block
  * must parse with a valid Content-Length and WARC-Type, records
  * must tile the stream exactly (trailing CRLFs tolerated at EOF),
  * and header bytes are capped (64 KiB) before any allocation.
  * Corrupt bytes yield None, never an exception.
  */
object Warc {

  /** One indexed record: whole-record span, routing headers, content
    * span, and — for HTTP responses — status + body span (`-1`/empty
    * when absent). */
  final case class WarcRecord(recordIdx: Int, byteStart: Long,
      byteLen: Long, warcType: String, targetUri: String,
      contentType: String, contentStart: Long, contentLen: Long,
      httpStatus: Int, bodyStart: Long, bodyLen: Long)

  private val MaxHeaderBytes = 64 * 1024

  /** Find CRLFCRLF in [from, end); -1 when absent. */
  private def findBlankLine(b: Array[Byte], from: Int, end: Int): Int = {
    var i = from
    while (i + 3 < end) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private def headerMap(s: String): Option[Map[String, String]] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    s.split("\r\n").foreach { line =>
      // header continuation lines (rare) would start with space — a
      // strict reader folds them; none of the fields we read use them
      if (line.startsWith(" ") || line.startsWith("\t")) {
        if (out.isEmpty) return None
      } else {
        val c = line.indexOf(':')
        if (c <= 0) return None
        out(line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)) =
          line.substring(c + 1).trim
      }
    }
    Some(out.toMap)
  }

  /** The record index over UNCOMPRESSED WARC bytes. */
  def recordIndex(b: Array[Byte]): Option[IndexedSeq[WarcRecord]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var i = 0
    while (i < b.length) {
      // trailing CRLFs after the last record are spec-legal padding
      if (b.length - i <= 8 &&
          (i until b.length).forall(j => b(j) == '\r' || b(j) == '\n')) {
        return if (out.isEmpty) None else Some(out.toIndexedSeq)
      }
      val hdrCap = math.min(b.length, i + MaxHeaderBytes)
      // version line
      val v = "WARC/1."
      if (i + v.length + 1 > b.length ||
          !v.getBytes("ISO-8859-1").zipWithIndex.forall {
            case (c, j) => b(i + j) == c
          }) return None
      val blank = findBlankLine(b, i, hdrCap)
      if (blank < 0) return None
      val head = new String(b, i, blank - i, "ISO-8859-1")
      val lines = head.split("\r\n", 2)
      if (lines.length < 2) return None
      val hs = headerMap(lines(1)).getOrElse(return None)
      val len = hs.get("content-length").flatMap(s =>
        try Some(s.toLong) catch { case _: NumberFormatException => None })
        .getOrElse(return None)
      val warcType = hs.getOrElse("warc-type", return None)
      val contentStart = blank + 4
      if (len < 0 || len > b.length - contentStart) return None
      val contentEnd = contentStart + len.toInt
      // the record block ends with CRLFCRLF (spec §4)
      if (contentEnd + 4 > b.length ||
          b(contentEnd) != '\r' || b(contentEnd + 1) != '\n' ||
          b(contentEnd + 2) != '\r' || b(contentEnd + 3) != '\n')
        return None
      val contentType = hs.getOrElse("content-type", "")
      val uri = hs.getOrElse("warc-target-uri", "")
      // HTTP response content: status + body span
      var status = -1
      var bodyStart = -1L
      var bodyLen = -1L
      if (contentType.startsWith("application/http")) {
        val hb = findBlankLine(b, contentStart,
          math.min(contentEnd, contentStart + MaxHeaderBytes))
        if (hb >= 0) {
          val statusLine = new String(b, contentStart,
            math.min(hb - contentStart, 256), "ISO-8859-1")
            .split("\r\n")(0)
          val parts = statusLine.split(" ")
          if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
            status = try parts(1).toInt catch {
              case _: NumberFormatException => -1
            }
          bodyStart = (hb + 4).toLong
          bodyLen = (contentEnd - (hb + 4)).toLong
        }
      }
      out += WarcRecord(out.length, i.toLong, (contentEnd + 4 - i).toLong,
        warcType, uri, contentType, contentStart.toLong, len,
        status, bodyStart, bodyLen)
      i = contentEnd + 4
    }
    if (out.isEmpty) None else Some(out.toIndexedSeq)
  }

  /** Inflate a (possibly multi-member — the Common Crawl shape) gzip
    * stream whole; None when the bytes are not gzip or inflate fails.
    * `maxBytes` caps the output before the allocation can run away. */
  def gunzipAll(b: Array[Byte], maxBytes: Long = 1L << 31)
      : Option[Array[Byte]] = {
    if (b.length < 2 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b)
      return None
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size() > maxBytes) return None
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[recordIndex]] with transparent gzip: `.warc.gz` members are
    * inflated first ([[gunzipAll]]) and spans address the
    * UNCOMPRESSED stream; plain bytes index directly. */
  def recordIndexAuto(b: Array[Byte]): Option[IndexedSeq[WarcRecord]] =
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b)
      gunzipAll(b).flatMap(recordIndex)
    else recordIndex(b)

  /** One indexed record as a row; `indexed = false` flags assets
    * that are not a well-formed (possibly gzipped) WARC. */
  final case class WarcRow(asset_id: Long, record_idx: Int,
      byte_start: Long, byte_len: Long, warc_type: String,
      target_uri: String, content_type: String, content_start: Long,
      content_len: Long, http_status: Int, body_start: Long,
      body_len: Long, indexed: Boolean)

  /** WARC record indexing over a (id, bytes) corpus: one
    * [[recordIndexAuto]] per asset (gzip transparent), records out
    * as rows — the routing table a crawl pipeline joins/filters
    * before touching any body bytes. mapPartitions, flagged
    * fallback, the container-family batch shape.
    */
  def extractRecords(df: org.apache.spark.sql.DataFrame, idCol: String,
      bytesCol: String)(implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[WarcRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val indexed =
            try Option(bytes).flatMap(recordIndexAuto)
            catch { case scala.util.control.NonFatal(_) => None }
          indexed match {
            case Some(rs) => rs.iterator.map(r =>
              WarcRow(id, r.recordIdx, r.byteStart, r.byteLen, r.warcType,
                r.targetUri, r.contentType, r.contentStart, r.contentLen,
                r.httpStatus, r.bodyStart, r.bodyLen, indexed = true))
            case None =>
              Iterator.single(WarcRow(id, -1, 0L, 0L, "", "", "", 0L, 0L,
                -1, -1L, -1L, indexed = false))
          }
        }
      }
  }

  /** One extracted page: the HTML → text step of the crawl pipeline;
    * `extracted = false` flags non-WARC assets. */
  final case class WarcPage(asset_id: Long, record_idx: Int,
      target_uri: String, http_status: Int, title: String, text: String,
      n_chars: Int, extracted: Boolean)

  /** The crawl-corpus front door in one call: gunzip → record index
    * → keep `response` records with 2xx HTTP status and an HTML
    * content type → slice the body span → [[graft.text.HtmlText]]
    * extraction (title + normalized text). The output rows feed the
    * text operators (quality, dedup, language ID) directly — exactly
    * the Common-Crawl-to-training-text path. Body bytes decode as
    * UTF-8 with replacement (charset sniffing is a downstream
    * refinement; replacement keeps the pipeline total).
    */
  def extractHtmlPages(df: org.apache.spark.sql.DataFrame, idCol: String,
      bytesCol: String)(implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[WarcPage] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, raw) =>
          val work =
            try {
              Option(raw).flatMap { r =>
                val plain =
                  if (r.length >= 2 && (r(0) & 0xff) == 0x1f &&
                    (r(1) & 0xff) == 0x8b) gunzipAll(r)
                  else Some(r)
                plain.flatMap(p => recordIndex(p).map((p, _)))
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          work match {
            case Some((bytes, rs)) =>
              rs.iterator
                .filter(r => r.warcType == "response" &&
                  r.httpStatus >= 200 && r.httpStatus < 300 &&
                  r.bodyStart >= 0)
                .flatMap { r =>
                  val html = new String(bytes, r.bodyStart.toInt,
                    r.bodyLen.toInt, java.nio.charset.StandardCharsets.UTF_8)
                  // only keep HTML bodies (the HTTP Content-Type rides
                  // inside the body head; a cheap sniff on the markup
                  // keeps binaries out without re-parsing HTTP headers)
                  val looksHtml = {
                    val head = html.take(512)
                      .toLowerCase(java.util.Locale.ROOT)
                    head.contains("<html") || head.contains("<!doctype") ||
                      head.contains("<head") || head.contains("<body")
                  }
                  if (!looksHtml) Iterator.empty
                  else {
                    val text = graft.text.HtmlText.extract(html)
                    Iterator.single(WarcPage(id, r.recordIdx, r.targetUri,
                      r.httpStatus,
                      graft.text.HtmlText.title(html).getOrElse(""),
                      text, text.length, extracted = true))
                  }
                }
            case None =>
              Iterator.single(WarcPage(id, -1, "", -1, "", "", 0,
                extracted = false))
          }
        }
      }
  }

  /** Synthetic WARC for specs/oracles: one record per entry of
    * (type, uri, contentType, content). Header order and CRLF
    * framing follow the spec exactly. */
  def encodeSynthetic(records: Seq[(String, String, String, Array[Byte])])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.zipWithIndex.foreach { case ((t, uri, ct, content), i) =>
      val sb = new StringBuilder()
      sb.append("WARC/1.0\r\n")
      sb.append(s"WARC-Type: $t\r\n")
      sb.append(s"WARC-Record-ID: <urn:uuid:rec-$i>\r\n")
      if (uri.nonEmpty) sb.append(s"WARC-Target-URI: $uri\r\n")
      if (ct.nonEmpty) sb.append(s"Content-Type: $ct\r\n")
      sb.append(s"Content-Length: ${content.length}\r\n")
      sb.append("\r\n")
      out.write(sb.toString.getBytes("ISO-8859-1"))
      out.write(content)
      out.write("\r\n\r\n".getBytes("ISO-8859-1"))
    }
    out.toByteArray
  }

  /** An HTTP response payload for [[encodeSynthetic]]: status line +
    * headers + CRLFCRLF + body. */
  def httpResponse(status: Int, reason: String, headers: Seq[(String, String)],
      body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder()
    sb.append(s"HTTP/1.1 $status $reason\r\n")
    headers.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append("\r\n")
    sb.toString.getBytes("ISO-8859-1") ++ body
  }

  /** Gzip one member per record — the Common Crawl `.warc.gz` shape. */
  def gzipPerRecord(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(r); gz.finish()
    }
    out.toByteArray
  }
}
