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
  private[io] def findBlankLine(b: Array[Byte], from: Int, end: Int): Int = {
    var i = from
    while (i + 3 < end) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private[io] def headerMap(s: String): Option[Map[String, String]] = {
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
      val (len, warcType, uri, contentType) =
        parseHead(new String(b, i, blank - i, "ISO-8859-1"))
          .getOrElse(return None)
      val contentStart = blank + 4
      if (len > b.length - contentStart) return None
      val contentEnd = contentStart + len.toInt
      // the record block ends with CRLFCRLF (spec §4)
      if (contentEnd + 4 > b.length ||
          b(contentEnd) != '\r' || b(contentEnd + 1) != '\n' ||
          b(contentEnd + 2) != '\r' || b(contentEnd + 3) != '\n')
        return None
      // HTTP response content: status + body span
      var status = -1
      var bodyStart = -1L
      var bodyLen = -1L
      if (contentType.startsWith("application/http") && len > 0) {
        val probeLen = math.min(len, MaxHeaderBytes.toLong).toInt
        val (st, bo) = parseHttpHead(
          java.util.Arrays.copyOfRange(b, contentStart,
            contentStart + probeLen))
        if (bo >= 0) {
          status = st
          bodyStart = (contentStart + bo).toLong
          bodyLen = (contentEnd - (contentStart + bo)).toLong
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
  def gunzipAll(b: Array[Byte], maxBytes: Long = Int.MaxValue - 16L)
      : Option[Array[Byte]] = {
    if (b.length < 2 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b)
      return None
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var total = 0L // counted in Long BEFORE the write: out.size()
      var n = in.read(buf) // is an Int and can never exceed the cap,
      while (n >= 0) {     // and the array cap must refuse, not OOM
        total += n
        if (total > maxBytes) return None
        out.write(buf, 0, n)
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

  /** Parse one record's header block given its bytes (everything
    * before the CRLFCRLF, version line included) — the shared core
    * of the in-memory, seekable and streaming walks. Returns
    * (contentLength, warcType, targetUri, contentType). */
  private def parseHead(head: String)
      : Option[(Long, String, String, String)] = {
    val lines = head.split("\r\n", 2)
    if (lines.length < 2) return None
    if (!lines(0).startsWith("WARC/1.")) return None
    val hs = headerMap(lines(1)).getOrElse(return None)
    val len = hs.get("content-length").flatMap(s =>
      try Some(s.toLong) catch { case _: NumberFormatException => None })
      .getOrElse(return None)
    if (len < 0) return None
    val t = hs.getOrElse("warc-type", return None)
    Some((len, t, hs.getOrElse("warc-target-uri", ""),
      hs.getOrElse("content-type", "")))
  }

  /** Wrap `raw` in a GZIPInputStream, CLOSING `raw` when the
    * constructor itself throws (gzip magic present but the header
    * malformed) — without this the caller's corrupt-drop path leaks
    * an open stream (an open S3A/HDFS connection per corrupt drop:
    * the outer NonFatal catch only sees the un-assigned `in`). */
  private def gzipOrClose(raw: java.io.InputStream)
      : java.util.zip.GZIPInputStream =
    try new java.util.zip.GZIPInputStream(raw)
    catch {
      case e: Throwable =>
        try raw.close() catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }

  /** Parse the HTTP head out of `httpHead` (the first bytes of an
    * `application/http` content block): (status, bodyOffsetInContent)
    * or (-1, -1) when no CRLFCRLF head is present in the probe. */
  private[io] def parseHttpHead(httpHead: Array[Byte])
      : (Int, Int) = {
    val hb = findBlankLine(httpHead, 0, httpHead.length)
    if (hb < 0) return (-1, -1)
    val statusLine = new String(httpHead, 0,
      math.min(hb, 256), "ISO-8859-1").split("\r\n")(0)
    val parts = statusLine.split(" ")
    val status =
      if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
        try parts(1).toInt catch { case _: NumberFormatException => -1 }
      else -1
    (status, hb + 4)
  }

  /** Seekable record indexing for >2 GiB UNCOMPRESSED archives: per
    * record, read the ≤64 KiB header block (+ a bounded HTTP-head
    * probe for response records) and SEEK past the content — a 50 GB
    * archive indexes in header-sized I/O, the same posture as the
    * media containers' seekable walks. Strictness identical to
    * [[recordIndex]].
    */
  def recordIndexSeekable(r: graft.multimodal.Mp4Index.RangeReader)
      : Option[IndexedSeq[WarcRecord]] = {
    val total = r.length
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var i = 0L
    while (i < total) {
      if (total - i <= 8) {
        val tailBytes = r.readFully(i, (total - i).toInt)
        return if (tailBytes.forall(c => c == '\r' || c == '\n') &&
          out.nonEmpty) Some(out.toIndexedSeq) else None
      }
      val probeLen = math.min(MaxHeaderBytes.toLong, total - i).toInt
      val probe = r.readFully(i, probeLen)
      val blank = findBlankLine(probe, 0, probeLen)
      if (blank < 0) return None
      val head = new String(probe, 0, blank, "ISO-8859-1")
      val (len, warcType, uri, contentType) =
        parseHead(head).getOrElse(return None)
      val contentStart = i + blank + 4
      if (len > total - contentStart) return None
      val contentEnd = contentStart + len
      if (contentEnd + 4 > total) return None
      // record terminator: CRLFCRLF after the content
      val term = r.readFully(contentEnd, 4)
      if (!(term(0) == '\r' && term(1) == '\n' && term(2) == '\r' &&
        term(3) == '\n')) return None
      var status = -1
      var bodyStart = -1L
      var bodyLen = -1L
      if (contentType.startsWith("application/http") && len > 0) {
        val fullProbe = math.min(len, MaxHeaderBytes.toLong).toInt
        val leftover = math.min(fullProbe.toLong,
          probeLen.toLong - (blank + 4)).toInt
        var httpHead =
          if (leftover > 0)
            java.util.Arrays.copyOfRange(probe, blank + 4,
              blank + 4 + leftover)
          else Array.empty[Byte]
        var (st, bo) = parseHttpHead(httpHead)
        // the leftover slice may be TOO SHORT to hold the HTTP head
        // (a record-header block near the 64 KiB cap): re-probe from
        // contentStart at the same width the in-memory walk uses, so
        // the two walks index identical bytes identically
        if (bo < 0 && leftover < fullProbe) {
          httpHead = r.readFully(contentStart, fullProbe)
          val again = parseHttpHead(httpHead)
          st = again._1; bo = again._2
        }
        if (bo >= 0) {
          status = st
          bodyStart = contentStart + bo
          bodyLen = len - bo
        }
      }
      out += WarcRecord(out.length, i, contentEnd + 4 - i, warcType, uri,
        contentType, contentStart, len, status, bodyStart, bodyLen)
      i = contentEnd + 4
    }
    if (out.isEmpty) None else Some(out.toIndexedSeq)
  }

  /** Streaming record indexing over a (possibly multi-member gzip)
    * InputStream: one forward pass in O(header) memory — the
    * `.warc.gz` twin of [[recordIndexSeekable]] (gzip has no random
    * access, so content bytes are DISCARDED by streaming rather than
    * skipped by seek; offsets address the uncompressed stream, the
    * same contract as [[recordIndexAuto]]). The caller owns the
    * stream's lifecycle.
    */
  def recordIndexStreaming(in: java.io.InputStream)
      : Option[IndexedSeq[WarcRecord]] =
    streamWalk(in, captureMax = -1L)((r, _) => Some(r))

  /** The streaming walk's ONE implementation: records in order, each
    * handed to `emit` WITH its captured CONTENT bytes the moment the
    * record's framing validates — the content array is released as
    * soon as `emit` returns (only the emitted values accumulate), so
    * a whole-archive walk holds O(one record) of content no matter
    * how many records qualify. Content is captured only when
    * `captureMax >= 0` and the record is an `application/http`
    * response no longer than the cap (bigger responses are
    * binaries/outliers the HTML path skips anyway). `captureMax < 0`
    * captures nothing — the [[recordIndexStreaming]] contract,
    * byte-for-byte. Corrupt framing anywhere yields None regardless
    * of what was already emitted. */
  private def streamWalk[A](in: java.io.InputStream, captureMax: Long)(
      emit: (WarcRecord, Option[Array[Byte]]) => Option[A])
      : Option[IndexedSeq[A]] = {
    val bin = new java.io.BufferedInputStream(in, 64 * 1024)
    val out = scala.collection.mutable.ArrayBuffer.empty[A]
    var pos = 0L
    def skipFully(n: Long): Boolean = {
      var left = n
      while (left > 0) {
        val k = bin.skip(left)
        if (k > 0) left -= k
        else if (bin.read() < 0) return false // EOF mid-content
        else left -= 1
      }
      true
    }
    // read until CRLFCRLF into a capped buffer; null at clean EOF
    def readHead(): Option[Array[Byte]] = {
      val buf = new java.io.ByteArrayOutputStream()
      var state = 0
      while (state < 4) {
        val c = bin.read()
        if (c < 0) return None
        buf.write(c)
        if (buf.size > MaxHeaderBytes) return None
        state = (state, c) match {
          case (0, '\r') => 1
          case (1, '\n') => 2
          case (2, '\r') => 3
          case (3, '\n') => 4
          case (_, '\r') => 1
          case _ => 0
        }
      }
      Some(buf.toByteArray)
    }
    var nRecords = 0L
    try {
      var done = false
      while (!done) {
        bin.mark(16)
        val first = bin.read()
        if (first < 0) done = true // clean EOF
        else if (first == '\r' || first == '\n') {
          // trailing padding: ONLY legal as <=8 CR/LF bytes before
          // EOF (mirrors recordIndex exactly — padding between
          // records would hide framing corruption)
          var n = 1
          var c = bin.read()
          while (c == '\r' || c == '\n') {
            n += 1
            if (n > 8) return None
            c = bin.read()
          }
          if (c >= 0) return None
          done = true
          if (nRecords == 0) return None // padding alone is not a WARC
        } else {
          bin.reset()
          val headBytes = readHead().getOrElse(return None)
          val head = new String(headBytes, 0, headBytes.length - 4,
            "ISO-8859-1")
          val (len, warcType, uri, contentType) =
            parseHead(head).getOrElse(return None)
          val contentStart = pos + headBytes.length
          var status = -1
          var bodyStart = -1L
          var bodyLen = -1L
          var consumed = 0L
          var captured: Option[Array[Byte]] = None
          if (contentType.startsWith("application/http") && len > 0) {
            val probeLen = math.min(len, MaxHeaderBytes.toLong).toInt
            val probe = new Array[Byte](probeLen)
            var got = 0
            while (got < probeLen) {
              val k = bin.read(probe, got, probeLen - got)
              if (k < 0) return None
              got += k
            }
            consumed = probeLen.toLong
            val (st, bo) = parseHttpHead(probe)
            if (bo >= 0) {
              status = st
              bodyStart = contentStart + bo
              bodyLen = len - bo
            }
            if (captureMax >= 0 && warcType == "response" &&
                len <= captureMax && len <= (Int.MaxValue - 8).toLong) {
              val content = new Array[Byte](len.toInt)
              System.arraycopy(probe, 0, content, 0, probeLen)
              var got2 = probeLen
              while (got2 < len.toInt) {
                val k = bin.read(content, got2, len.toInt - got2)
                if (k < 0) return None
                got2 += k
              }
              consumed = len
              captured = Some(content)
            }
          }
          if (!skipFully(len - consumed)) return None
          val term = new Array[Byte](4)
          var g = 0
          while (g < 4) {
            val k = bin.read(term, g, 4 - g)
            if (k < 0) return None
            g += k
          }
          if (!(term(0) == '\r' && term(1) == '\n' && term(2) == '\r' &&
            term(3) == '\n')) return None
          val rec = WarcRecord(nRecords.toInt, pos,
            headBytes.length + len + 4, warcType, uri, contentType,
            contentStart, len, status, bodyStart, bodyLen)
          nRecords += 1
          emit(rec, captured).foreach(out += _)
          pos = contentStart + len + 4
        }
      }
      if (nRecords == 0) None else Some(out.toIndexedSeq)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

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

  /** Path-columned WARC indexing for >2 GiB archives (a real Common
    * Crawl file is ~5 GB uncompressed): plain archives walk
    * seekable (header reads + seeks — KBs of I/O for GBs of
    * records); `.warc.gz` walks the gzip STREAM in O(header) memory
    * (gzip has no random access — content is discarded, not
    * materialized). Paths route through [[PathIO]]: scheme-qualified
    * URIs (`s3a://…`, `hdfs://…`, `file:///…`) open via Hadoop
    * FileSystem — positioned reads on the seekable walk, a plain
    * forward stream on the gzip walk — plain paths stay on
    * `java.io`. Unreadable/ill-formed paths emit the flagged row.
    */
  def extractRecordsByPath(df: org.apache.spark.sql.DataFrame,
      idCol: String, pathCol: String)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[WarcRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val confBc = PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (id, path) =>
          val indexed =
            try {
              // sniff on ONE opened stream (per-byte reads so a short
              // first read cannot misroute) and push the bytes back:
              // the `.warc.gz` route costs a single open per object
              val raw = new java.io.PushbackInputStream(
                PathIO.openStream(path, conf), 2)
              val h0 = raw.read()
              val h1 = raw.read()
              if (h0 == 0x1f && h1 == 0x8b) {
                raw.unread(h1); raw.unread(h0)
                val in = gzipOrClose(raw)
                try recordIndexStreaming(in) finally in.close()
              } else {
                raw.close()
                val r = PathIO.openRange(path, conf)
                try recordIndexSeekable(r) finally r.close()
              }
            } catch { case scala.util.control.NonFatal(_) => None }
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

  /** HTML pages of ONE path-addressed archive — the per-file walk
    * behind the batch AND streaming page seams (one implementation):
    * plain archives walk record heads by seek
    * ([[recordIndexSeekable]]) and fetch ONLY qualifying 2xx
    * response contents by ranged read; `.warc.gz` streams once
    * ([[streamWalk]]), capturing response contents as they pass.
    * Response records with content over `maxContentBytes` are
    * SKIPPED, not truncated (real HTML pages are KBs; multi-MB
    * responses are the binaries the markup sniff drops anyway) —
    * memory stays O(record) either way. Paths route through
    * [[PathIO]] (Hadoop FS for scheme-qualified URIs). None when
    * the path is unreadable or not a well-formed WARC. */
  def pagesFromPath(path: String,
      conf: org.apache.hadoop.conf.Configuration,
      maxContentBytes: Long = 1L << 22)
      : Option[Seq[(WarcRecord, String, String)]] =
    try {
      // the cap can never exceed what a JVM array holds — a >2 GiB
      // caller cap must not wrap len.toInt negative and flag a valid
      // archive as corrupt on its one oversize record
      val cap = math.min(maxContentBytes, (Int.MaxValue - 8).toLong)
      def qualifies(r: WarcRecord): Boolean =
        r.warcType == "response" && r.httpStatus >= 200 &&
          r.httpStatus < 300 && r.bodyStart >= 0
      // sniff on ONE opened stream and push the bytes back: the
      // common `.warc.gz` crawl shape costs a single open per object
      // (on S3A every open is a GET initiation)
      val raw = new java.io.PushbackInputStream(
        PathIO.openStream(path, conf), 2)
      val h0 = raw.read()
      val h1 = raw.read()
      if (h0 == 0x1f && h1 == 0x8b) {
        raw.unread(h1); raw.unread(h0)
        val in = gzipOrClose(raw)
        // per-record emit: each captured content array is released
        // the moment its text is extracted — the walk holds O(record)
        // memory over the whole archive, not the sum of its HTML
        try streamWalk(in, cap) { (r, content) =>
          content match {
            case Some(c) if qualifies(r) =>
              htmlPageText(c, 0L, r.bodyStart - r.contentStart,
                r.bodyLen).map { case (t, x) => (r, t, x) }
            case _ => None
          }
        } finally in.close()
      } else {
        raw.close()
        val rr = PathIO.openRange(path, conf)
        try recordIndexSeekable(rr).map { rs =>
          rs.iterator
            .filter(r => qualifies(r) && r.contentLen <= cap)
            .flatMap { r =>
              val content = rr.readFully(r.contentStart, r.contentLen.toInt)
              htmlPageText(content, 0L, r.bodyStart - r.contentStart,
                r.bodyLen).map { case (t, x) => (r, t, x) }
            }.toVector
        } finally rr.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Path-columned page extraction: [[pagesFromPath]] as the batch
    * seam — the >2 GiB / distributed-FS twin of
    * [[extractHtmlPages]]. Unreadable/ill-formed paths emit the
    * flagged row. */
  def extractHtmlPagesByPath(df: org.apache.spark.sql.DataFrame,
      idCol: String, pathCol: String, maxContentBytes: Long = 1L << 22)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[WarcPage] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val confBc = PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (id, path) =>
          pagesFromPath(path, conf, maxContentBytes) match {
            case Some(ps) => ps.iterator.map { case (r, title, text) =>
              WarcPage(id, r.recordIdx, r.targetUri, r.httpStatus,
                title, text, text.length, extracted = true)
            }
            case None =>
              Iterator.single(WarcPage(id, -1, "", -1, "", "", 0,
                extracted = false))
          }
        }
      }
  }

  /** The charset a page declares — the HTTP head's `charset=`
    * parameter first, else a `<meta charset=…>` /
    * `<meta http-equiv … content="…charset=…">` in the body prefix —
    * resolved to a JVM Charset; None when absent or unknown. A
    * crawl corpus is NOT all UTF-8 (ISO-8859-1 and windows-1251/2
    * pages remain common); decoding them as UTF-8 turns every
    * non-ASCII character into U+FFFD. */
  // charset= restricted to where it is MEANINGFUL: the Content-Type
  // header line (RFC 9110 — an unrelated Link:/Refresh: header
  // mentioning charset= must not hijack the decode) and <meta> tags
  // in the body prefix; the value may be quoted (charset="iso-8859-1"
  // is a legal quoted-string)
  private val HeadCharsetRe =
    "(?m)^content-type:[^\\r\\n]*?charset=\"?'?([a-z0-9_\\-]+)".r
  private val MetaCharsetRe =
    "(?s)<meta[^>]*charset\\s*=\\s*\"?'?([a-z0-9_\\-]+)".r

  /** A declared charset name resolved to a JVM Charset; None for
    * unknown/illegal names — shared by every declared-charset probe
    * in graft.io so resolution behavior cannot drift. */
  private[io] def resolveCharset(name: String)
      : Option[java.nio.charset.Charset] =
    try Some(java.nio.charset.Charset.forName(name))
    catch { case scala.util.control.NonFatal(_) => None }

  /** The `<meta charset=…>` declaration in a LOWERCASED markup
    * prefix, resolved — the body half of [[declaredCharset]], also
    * the meta half of [[ZipIndex.memberCharset]] (one regex, one
    * resolution — no drift between the WARC and zip-member paths). */
  private[io] def metaCharsetIn(lowerProbe: String)
      : Option[java.nio.charset.Charset] =
    MetaCharsetRe.findFirstMatchIn(lowerProbe).map(_.group(1))
      .flatMap(resolveCharset)

  private[io] def declaredCharset(bytes: Array[Byte], headFrom: Long,
      headUntil: Long, bodyFrom: Long, bodyLen: Long)
      : Option[java.nio.charset.Charset] = {
    val head = new String(bytes, headFrom.toInt,
      (headUntil - headFrom).toInt, "ISO-8859-1")
      .toLowerCase(java.util.Locale.ROOT)
    HeadCharsetRe.findFirstMatchIn(head).map(_.group(1))
      .flatMap(resolveCharset)
      .orElse {
        val probe = math.min(1024L, bodyLen).toInt
        val bodyHead = new String(bytes, bodyFrom.toInt, probe,
          "ISO-8859-1").toLowerCase(java.util.Locale.ROOT)
        metaCharsetIn(bodyHead)
      }
  }

  /** Title + text of one HTML response body inside `bytes` — the
    * sniff → declared-charset → [[graft.text.HtmlText]] step shared
    * by EVERY page walk (in-memory, seekable, streaming — one
    * implementation, no twin drift). The markup sniff runs on a
    * 512-byte prefix BEFORE any full-body decode: a partition of 2xx
    * image/PDF responses must not pay a multi-MB String per row.
    * None when the body does not look like HTML. */
  private[io] def htmlPageText(bytes: Array[Byte], contentStart: Long,
      bodyStart: Long, bodyLen: Long): Option[(String, String)] = {
    val looksHtml = {
      val probe = math.min(512L, bodyLen).toInt
      val head = new String(bytes, bodyStart.toInt, probe,
        java.nio.charset.StandardCharsets.UTF_8)
        .toLowerCase(java.util.Locale.ROOT)
      head.contains("<html") || head.contains("<!doctype") ||
        head.contains("<head") || head.contains("<body")
    }
    if (!looksHtml) None
    else {
      val cs = declaredCharset(bytes, contentStart, bodyStart, bodyStart,
        bodyLen).getOrElse(java.nio.charset.StandardCharsets.UTF_8)
      val html = new String(bytes, bodyStart.toInt, bodyLen.toInt, cs)
      val text = graft.text.HtmlText.extract(html)
      Some((graft.text.HtmlText.title(html).getOrElse(""), text))
    }
  }

  /** Outgoing links of one HTML response body — the sniff/charset
    * steps of [[htmlPageText]], then [[graft.text.HtmlText
    * .linksWithBase]]. Each link is (path-label, raw href,
    * resolved-absolute-or-empty); resolution honors a `<base href>`
    * (itself resolved against the page URI) and falls back to the
    * page URI. None when the body does not look like HTML. */
  private[io] def htmlPageLinks(bytes: Array[Byte], contentStart: Long,
      bodyStart: Long, bodyLen: Long, pageUri: String)
      : Option[Seq[(String, String, String)]] = {
    val looksHtml = {
      val probe = math.min(512L, bodyLen).toInt
      val head = new String(bytes, bodyStart.toInt, probe,
        java.nio.charset.StandardCharsets.UTF_8)
        .toLowerCase(java.util.Locale.ROOT)
      head.contains("<html") || head.contains("<!doctype") ||
        head.contains("<head") || head.contains("<body")
    }
    if (!looksHtml) None
    else {
      val cs = declaredCharset(bytes, contentStart, bodyStart, bodyStart,
        bodyLen).getOrElse(java.nio.charset.StandardCharsets.UTF_8)
      val html = new String(bytes, bodyStart.toInt, bodyLen.toInt, cs)
      val (baseHref, links) = graft.text.HtmlText.linksWithBase(html)
      val effBase = baseHref
        .flatMap(graft.text.HtmlText.resolveUrl(pageUri, _))
        .getOrElse(pageUri)
      Some(links.map { case (path, href) =>
        (path, href,
          graft.text.HtmlText.resolveUrl(effBase, href).getOrElse(""))
      })
    }
  }

  /** One extracted page: the HTML → text step of the crawl pipeline;
    * `extracted = false` flags non-WARC assets. */
  final case class WarcPage(asset_id: Long, record_idx: Int,
      target_uri: String, http_status: Int, title: String, text: String,
      n_chars: Int, extracted: Boolean)

  /** One outgoing link: `path` is the CC WAT label (`A@/href`,
    * `LINK@/href`, `IMG@/src`, `SCRIPT@/src`), `href` the raw
    * entity-decoded attribute value, `resolved` the RFC 3986
    * absolute form (empty when unresolvable); `extracted = false`
    * flags non-WARC assets. */
  final case class WarcLink(asset_id: Long, record_idx: Int,
      url: String, link_idx: Int, path: String, href: String,
      resolved: String, extracted: Boolean)

  /** The crawl-corpus front door in one call: gunzip → record index
    * → keep `response` records with 2xx HTTP status and an HTML
    * content type → slice the body span → [[graft.text.HtmlText]]
    * extraction (title + normalized text). The output rows feed the
    * text operators (quality, dedup, language ID) directly — exactly
    * the Common-Crawl-to-training-text path. Bodies decode with the
    * page's DECLARED charset (HTTP `charset=` param, else a meta tag
    * in the body prefix — [[declaredCharset]]); UTF-8 with
    * replacement is the fallback, keeping the pipeline total.
    * Responses with content over `maxContentBytes` are SKIPPED, not
    * truncated — the SAME cap, same default, as
    * [[extractHtmlPagesByPath]], so one archive yields one page set
    * whichever seam it enters through (real HTML is KBs; multi-MB
    * responses are the binaries the markup sniff drops anyway).
    */
  def extractHtmlPages(df: org.apache.spark.sql.DataFrame, idCol: String,
      bytesCol: String, maxContentBytes: Long = 1L << 22)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[WarcPage] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cap = math.min(maxContentBytes, (Int.MaxValue - 8).toLong)
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
                  r.bodyStart >= 0 && r.contentLen <= cap)
                .flatMap { r =>
                  htmlPageText(bytes, r.contentStart, r.bodyStart,
                    r.bodyLen).iterator.map { case (title, text) =>
                    WarcPage(id, r.recordIdx, r.targetUri, r.httpStatus,
                      title, text, text.length, extracted = true)
                  }
                }
            case None =>
              Iterator.single(WarcPage(id, -1, "", -1, "", "", 0,
                extracted = false))
          }
        }
      }
  }

  /** Outgoing-link extraction over an (id, bytes) corpus — the link
    * half of the crawl front door (the CC WAT `Links` list as rows):
    * the SAME page rule as [[extractHtmlPages]] (2xx responses under
    * `maxContentBytes` whose body sniffs as HTML), one row per link
    * in document order, resolved against the page's `<base href>` or
    * its own URI. Pages without links emit nothing; unwalkable
    * assets emit the flagged row. Feeds [[CrawlGraph.hostEdges]]
    * and the existing graph operators (PageRank over the crawl's
    * host graph). */
  def extractHtmlLinks(df: org.apache.spark.sql.DataFrame, idCol: String,
      bytesCol: String, maxContentBytes: Long = 1L << 22)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[WarcLink] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cap = math.min(maxContentBytes, (Int.MaxValue - 8).toLong)
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
                  r.bodyStart >= 0 && r.contentLen <= cap)
                .flatMap { r =>
                  htmlPageLinks(bytes, r.contentStart, r.bodyStart,
                    r.bodyLen, r.targetUri).iterator.flatMap(
                    _.zipWithIndex.map { case ((p, h, res), i) =>
                      WarcLink(id, r.recordIdx, r.targetUri, i, p, h,
                        res, extracted = true)
                    })
                }
            case None =>
              Iterator.single(WarcLink(id, -1, "", -1, "", "", "",
                extracted = false))
          }
        }
      }
  }

  /** One robots.txt capture; `extracted = false` flags non-WARC
    * assets. */
  final case class RobotsCapture(asset_id: Long, record_idx: Int,
      host: String, url: String, txt: String, extracted: Boolean)

  /** Lowercased host with scheme-default port stripped — the Scala
    * twin of [[graft.text.UrlNormalize.host]] for row-level walks. */
  private def hostOf(url: String): String = {
    val m = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)".r
      .findFirstMatchIn(url).getOrElse(return "")
    val scheme = m.group(1).toLowerCase(java.util.Locale.ROOT)
    val hp = m.group(2).toLowerCase(java.util.Locale.ROOT)
    if (scheme == "http") hp.stripSuffix(":80")
    else if (scheme == "https") hp.stripSuffix(":443")
    else hp
  }

  /** robots.txt captures out of an (id, bytes) crawl corpus — the
    * input [[graft.text.Robots.parseRules]] consumes, closing the
    * crawl → policy → retro-filter loop inside the engine: a crawl
    * archives each host's `/robots.txt` as an ordinary 2xx response
    * record; this walker surfaces them as (host, text) rows (body
    * decoded with the declared charset, UTF-8 fallback — robots
    * files are ASCII in practice). The path match is exact
    * (`/robots.txt`, query ignored), per RFC 9309 §2.3's
    * well-known location. */
  def extractRobots(df: org.apache.spark.sql.DataFrame, idCol: String,
      bytesCol: String, maxContentBytes: Long = 1L << 22)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[RobotsCapture] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cap = math.min(maxContentBytes, (Int.MaxValue - 8).toLong)
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
                .filter { r =>
                  r.warcType == "response" && r.httpStatus >= 200 &&
                    r.httpStatus < 300 && r.bodyStart >= 0 &&
                    r.contentLen <= cap &&
                    // ROOT /robots.txt only (RFC 9309 §2.3's
                    // well-known location) — /foo/robots.txt is just
                    // a file
                    r.targetUri.replaceFirst("[?#].*$", "").matches(
                      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*/robots\\.txt")
                }
                .map { r =>
                  val cs = declaredCharset(bytes, r.contentStart,
                    r.bodyStart, r.bodyStart, r.bodyLen)
                    .getOrElse(java.nio.charset.StandardCharsets.UTF_8)
                  RobotsCapture(id, r.recordIdx, hostOf(r.targetUri),
                    r.targetUri,
                    new String(bytes, r.bodyStart.toInt,
                      r.bodyLen.toInt, cs),
                    extracted = true)
                }
            case None =>
              Iterator.single(RobotsCapture(id, -1, "", "", "",
                extracted = false))
          }
        }
      }
  }

  /** Links of ONE path-addressed archive — [[pagesFromPath]]'s twin
    * for [[htmlPageLinks]]: plain archives seek + ranged-read only
    * qualifying contents, `.warc.gz` streams once, O(record)
    * memory. None when the path is unreadable or not a WARC. */
  private[graft] def linksFromPath(path: String,
      conf: org.apache.hadoop.conf.Configuration,
      maxContentBytes: Long = 1L << 22)
      : Option[Seq[(WarcRecord, Seq[(String, String, String)])]] =
    try {
      val cap = math.min(maxContentBytes, (Int.MaxValue - 8).toLong)
      def qualifies(r: WarcRecord): Boolean =
        r.warcType == "response" && r.httpStatus >= 200 &&
          r.httpStatus < 300 && r.bodyStart >= 0
      val raw = new java.io.PushbackInputStream(
        PathIO.openStream(path, conf), 2)
      val h0 = raw.read()
      val h1 = raw.read()
      if (h0 == 0x1f && h1 == 0x8b) {
        raw.unread(h1); raw.unread(h0)
        val in = gzipOrClose(raw)
        try streamWalk(in, cap) { (r, content) =>
          content match {
            case Some(c) if qualifies(r) =>
              htmlPageLinks(c, 0L, r.bodyStart - r.contentStart,
                r.bodyLen, r.targetUri).map(ls => (r, ls))
            case _ => None
          }
        } finally in.close()
      } else {
        raw.close()
        val rr = PathIO.openRange(path, conf)
        try recordIndexSeekable(rr).map { rs =>
          rs.iterator
            .filter(r => qualifies(r) && r.contentLen <= cap)
            .flatMap { r =>
              val content = rr.readFully(r.contentStart, r.contentLen.toInt)
              htmlPageLinks(content, 0L, r.bodyStart - r.contentStart,
                r.bodyLen, r.targetUri).map(ls => (r, ls))
            }.toVector
        } finally rr.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Path-columned link extraction: [[linksFromPath]] as the batch
    * seam — the >2 GiB / distributed-FS twin of
    * [[extractHtmlLinks]], row-identical by construction (same page
    * rule, same per-page link walk). Unreadable/ill-formed paths
    * emit the flagged row. */
  def extractHtmlLinksByPath(df: org.apache.spark.sql.DataFrame,
      idCol: String, pathCol: String, maxContentBytes: Long = 1L << 22)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[WarcLink] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val confBc = PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (id, path) =>
          linksFromPath(path, conf, maxContentBytes) match {
            case Some(ps) => ps.iterator.flatMap { case (r, ls) =>
              ls.zipWithIndex.map { case ((p, h, res), i) =>
                WarcLink(id, r.recordIdx, r.targetUri, i, p, h, res,
                  extracted = true)
              }
            }
            case None =>
              Iterator.single(WarcLink(id, -1, "", -1, "", "", "",
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

  /** [[encodeSynthetic]] with caller-supplied record headers: each
    * entry is (headers, content); headers MUST include `WARC-Type`
    * (spec-mandatory) and may carry any other field (`WARC-Date`,
    * `WARC-Target-URI`, …) in the given order. `Content-Length` is
    * appended automatically. Exists so CDX fixtures can pin
    * `WARC-Date`-derived timestamps. */
  def encodeSyntheticHeaders(
      records: Seq[(Seq[(String, String)], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (headers, content) =>
      require(headers.exists(_._1.equalsIgnoreCase("WARC-Type")),
        "WARC-Type header is mandatory")
      val sb = new StringBuilder()
      sb.append("WARC/1.0\r\n")
      headers.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
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
      gz.write(r)
      gz.close() // releases the native Deflater; BAOS.close is a no-op
    }
    out.toByteArray
  }
}
