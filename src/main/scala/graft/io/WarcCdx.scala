package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** CDX INDEXING + CDX-DRIVEN HYDRATION — the Common Crawl random-
  * access pattern (public formats: ISO 28500 WARC, the CDX(J) index
  * convention published with the IIPC web-archiving tooling, RFC 1952
  * gzip, RFC 4648 base32).
  *
  * A crawl corpus at 100 TB is never processed by re-reading archives
  * whole: Common Crawl ships, next to every `.warc.gz`, a CDX index
  * whose rows carry the canonicalized URL key (SURT), the capture
  * timestamp, the payload MIME + HTTP status, a content digest, and —
  * the load-bearing part — the COMPRESSED byte span of the gzip
  * member holding that one record. A consumer filters the INDEX
  * (mime, status, language of the urlkey's TLD, …) and then fetches
  * ONLY the matching members by ranged GET, inflating one record
  * each. This module is both halves:
  *
  *  - [[cdxIndex]] / [[extractCdx]] / [[extractCdxByPath]] build the
  *    index from archive bytes: per gzip member (one record per
  *    member — the Common Crawl layout, what [[Warc.gzipPerRecord]]
  *    writes), parse the single WARC record and emit its CDX facts
  *    with the member's compressed span. Uncompressed archives index
  *    with raw record spans (still the correct ranged-fetch unit).
  *    The by-path walk STREAMS (gzip has no random access): one
  *    forward pass, O(record) memory, routed through [[PathIO]] so
  *    `s3a://`/`hdfs://` archives stream without local staging.
  *  - [[hydrateByCdx]] consumes index rows: [[SpanFetch]] ranged
  *    reads of the compressed spans, per-member inflate, single-
  *    record parse, HTML title/text extraction — the selective-fetch
  *    path that makes "give me the English text/html 200s out of
  *    100 TB" cost only the matching records' bytes.
  *  - [[cdxjLine]] / [[parseCdxj]] serialize/parse the CDXJ text
  *    form (`urlkey timestamp {json}`) so indexes interoperate with
  *    the published Common Crawl index files.
  *
  * Field semantics (documented where they choose among published
  * variants): `urlkey` is the SURT form ([[surtKey]]); `timestamp`
  * is the 14-digit `yyyyMMddHHmmss` of `WARC-Date`; `mime` is the
  * HTTP payload Content-Type (bare type, parameters stripped,
  * lowercased) for `response` records and the record's own
  * Content-Type otherwise; `status` is the HTTP status for
  * `response` records, -1 otherwise; `digest` is the SHA-1 of the
  * record's CONTENT BLOCK in base32 — the WARC spec's own
  * `WARC-Block-Digest` definition (ISO 28500 §5.8), pinning strictly
  * more bytes than any payload form; `payload_digest` is the SHA-1 of
  * the PAYLOAD (the transfer-decoded HTTP entity body for
  * `application/http` records, the content block otherwise) — the
  * `WARC-Payload-Digest` definition and THE digest published Common
  * Crawl indexes carry, so `hydrateByCdx` output verifies against
  * both self-built indexes (block or payload) and published
  * `cdx-*.gz` rows (payload). [[cdxjLine]] serializes the payload
  * digest for the same interop reason.
  *
  * Strictness: gzip members validate like [[GzipMembers]] (header
  * flags, per-member CRC-32 + ISIZE, exact tiling) — a broken member
  * boundary poisons everything after it, so tiling/CRC corruption
  * refuses the ASSET (flagged row). A member that inflates fine but
  * does not hold EXACTLY one well-formed record — or inflates past
  * `maxRecordBytes` (corrupt-length OOM guard, same posture as
  * [[SpanFetch]]'s span cap) — flags that MEMBER (`parsed = false`,
  * spans still emitted) and the walk continues. Corrupt bytes never
  * throw.
  */
object WarcCdx {

  private val MaxHeaderBytes = 64 * 1024

  // ------------------------------------------------------------------
  // SURT urlkey
  // ------------------------------------------------------------------

  /** The SURT (Sort-friendly URI Reordering Transform) url key, the
    * variant the wayback/Common Crawl indexes use: lowercase; scheme
    * and userinfo dropped; a leading `www\d*.` host label dropped;
    * host labels REVERSED and comma-joined (IPv4 and bracketed IPv6
    * hosts pass unreversed); scheme-default ports (`:80` http,
    * `:443` https) dropped, other ports kept; `)` then the path
    * (root normalizes to `/`, `;jsessionid=…` matrix segments
    * dropped — the servlet-container session id the IA/CC
    * canonicalizer strips from paths); query params with `utm_*` or
    * a session-id name (`jsessionid`, `phpsessid`, `sid`,
    * `aspsessionid*` — the IA/CC strip list, so urlkeys join against
    * published Common Crawl indexes for session-bearing URLs) dropped
    * and the rest sorted (the same param policy as
    * [[graft.text.UrlNormalize.sortedQuery]]); fragment dropped.
    * Non-URLs (no `scheme://`) pass through lowercased so the key is
    * total on dirty corpora.
    *
    * `surtKey("http://www.Example.COM:80/A/B?b=2&a=1#f")` is
    * `"com,example)/a/b?a=1&b=2"`.
    */
  def surtKey(url: String): String = {
    val u = url.trim.toLowerCase(java.util.Locale.ROOT)
    val schemeEnd = u.indexOf("://")
    if (schemeEnd <= 0) return u
    val scheme = u.substring(0, schemeEnd)
    var rest = u.substring(schemeEnd + 3)
    val hashAt = rest.indexOf('#')
    if (hashAt >= 0) rest = rest.substring(0, hashAt)
    var authEnd = rest.indexWhere(c => c == '/' || c == '?')
    if (authEnd < 0) authEnd = rest.length
    var auth = rest.substring(0, authEnd)
    val pathQuery = rest.substring(authEnd)
    val atPos = auth.lastIndexOf('@')
    if (atPos >= 0) auth = auth.substring(atPos + 1)
    // port split — bracketed IPv6 hosts ([::1]:8080) keep their colons
    val closeBracket = auth.lastIndexOf(']')
    val colonAt = auth.lastIndexOf(':')
    val (host0, port) =
      if (colonAt > closeBracket && colonAt >= 0)
        (auth.substring(0, colonAt), auth.substring(colonAt + 1))
      else (auth, "")
    val defaultPort = (scheme == "http" && port == "80") ||
      (scheme == "https" && port == "443")
    val host =
      if (host0.matches("^www\\d*\\..+"))
        host0.substring(host0.indexOf('.') + 1)
      else host0
    val isLiteral = host.startsWith("[") ||
      host.matches("^\\d{1,3}(\\.\\d{1,3}){3}$")
    val revHost =
      if (isLiteral) host else host.split('.').reverse.mkString(",")
    val portPart = if (port.isEmpty || defaultPort) "" else ":" + port
    val qAt = pathQuery.indexOf('?')
    val (p0, q0) =
      if (qAt >= 0) (pathQuery.substring(0, qAt),
        pathQuery.substring(qAt + 1))
      else (pathQuery, null)
    // `;jsessionid=…` rides the PATH as a matrix segment, not a param
    val p1 = p0.replaceAll(";jsessionid=[^;/?]*", "")
    val path = if (p1.isEmpty) "/" else p1
    val query =
      if (q0 == null) ""
      else {
        val params = q0.split("&")
          .filter(p => p.nonEmpty && !p.startsWith("utm_") &&
            !sessionParam(p)).sorted
        if (params.isEmpty) "" else "?" + params.mkString("&")
      }
    revHost + portPart + ")" + path + query
  }

  /** Whether a (already-lowercased) query param is one of the
    * session-id names the IA/CC canonicalizer strips. Matches the
    * NAME exactly (`sid=…`, bare `sid`) — `side=1` or `jsessionid2=x`
    * survive. */
  private def sessionParam(p: String): Boolean =
    p.matches("(jsessionid|phpsessid|sid|aspsessionid[a-z0-9]*)(=.*)?")

  /** `WARC-Date` (ISO 8601) → the CDX 14-digit `yyyyMMddHHmmss` UTC
    * timestamp; empty string when absent/unparseable (total). */
  def timestamp14(warcDate: String): String =
    try {
      val ins = java.time.Instant.parse(warcDate)
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
        .withZone(java.time.ZoneOffset.UTC).format(ins)
    } catch { case scala.util.control.NonFatal(_) => "" }

  /** RFC 4648 base32 (no padding; SHA-1's 160 bits are exactly 32
    * chars — the digest form WARC tooling prints). */
  private[io] def base32(bytes: Array[Byte]): String = {
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new java.lang.StringBuilder(((bytes.length * 8) + 4) / 5)
    var acc = 0L
    var bits = 0
    var i = 0
    while (i < bytes.length) {
      acc = (acc << 8) | (bytes(i) & 0xffL); bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(alpha(((acc >> bits) & 31L).toInt))
      }
      i += 1
    }
    if (bits > 0) sb.append(alpha(((acc << (5 - bits)) & 31L).toInt))
    sb.toString
  }

  private[io] def sha1Base32(b: Array[Byte], from: Int, len: Int)
      : String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(b, from, len)
    base32(md.digest())
  }

  // ------------------------------------------------------------------
  // Single-record parse
  // ------------------------------------------------------------------

  /** The CDX facts of one record. `digest` is the BLOCK digest (whole
    * content block); `payloadDigest` is the PAYLOAD digest — the
    * HTTP entity body, transfer-decoded, for `application/http`
    * records, and the content block itself otherwise (ISO 28500's
    * `WARC-Payload-Digest` definition, the digest published Common
    * Crawl indexes carry). */
  private[io] final case class RecordFacts(warcType: String, url: String,
      date: String, mime: String, status: Int, digest: String,
      payloadDigest: String, contentStart: Int, contentLen: Long,
      bodyStart: Long, bodyLen: Long)

  /** Decode an HTTP/1.1 `Transfer-Encoding: chunked` body
    * `b[from, until)`: hex size line (extensions after `;` ignored),
    * CRLF, chunk bytes, CRLF, …, terminated by a 0-size chunk
    * (trailers ignored). None on any framing violation — the caller
    * falls back to digesting the raw body, so a malformed chunked
    * capture still gets a deterministic digest rather than a refusal
    * (total, never throws). */
  private[io] def dechunk(b: Array[Byte], from: Int, until: Int)
      : Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var p = from
    while (true) {
      // hex chunk-size line — capped: a real size line is tens of
      // bytes (hex digits + extensions); a corrupt body with no CRLF
      // must not scan (and later stringify) megabytes
      val lineCap = math.min(until, p + 1026)
      var lineEnd = p
      while (lineEnd + 1 < lineCap &&
        !(b(lineEnd) == '\r' && b(lineEnd + 1) == '\n')) lineEnd += 1
      if (lineEnd + 1 >= lineCap ||
        !(b(lineEnd) == '\r' && b(lineEnd + 1) == '\n')) return None
      val sizeStr = new String(b, p, lineEnd - p, "ISO-8859-1")
        .split(";")(0).trim
      if (sizeStr.isEmpty || !sizeStr.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
          (c >= 'A' && c <= 'F'))) return None
      val size =
        try java.lang.Long.parseLong(sizeStr, 16)
        catch { case _: NumberFormatException => return None }
      p = lineEnd + 2
      if (size == 0) return Some(out.toByteArray) // trailers ignored
      if (size > until.toLong - p) return None
      out.write(b, p, size.toInt)
      p += size.toInt
      // chunk-data CRLF
      if (p + 1 >= until || b(p) != '\r' || b(p + 1) != '\n') return None
      p += 2
    }
    None // unreachable
  }

  /** Whether the HTTP head declares `Transfer-Encoding: chunked`. */
  private def isChunked(httpHead: Array[Byte], bodyOff: Int): Boolean = {
    val headStr = new String(httpHead, 0,
      math.min(bodyOff, httpHead.length), "ISO-8859-1")
    headStr.split("\r\n").iterator.drop(1).exists { l =>
      val lo = l.toLowerCase(java.util.Locale.ROOT)
      lo.startsWith("transfer-encoding:") && lo.contains("chunked")
    }
  }

  /** Parse `b[from, until)` as EXACTLY one WARC record (the one-
    * record-per-gzip-member contract): version line, header block
    * within the 64 KiB cap, content block + CRLFCRLF terminator
    * tiling `until` precisely. None on any violation. */
  private[io] def parseSingleRecord(b: Array[Byte], from: Int, until: Int)
      : Option[RecordFacts] = {
    if (until - from < 12 || until > b.length || from < 0) return None
    val hdrCap = math.min(until, from + MaxHeaderBytes)
    val blank = Warc.findBlankLine(b, from, hdrCap)
    if (blank < 0) return None
    val head = new String(b, from, blank - from, "ISO-8859-1")
    val lines = head.split("\r\n", 2)
    if (lines.length < 2 || !lines(0).startsWith("WARC/1.")) return None
    val hs = Warc.headerMap(lines(1)).getOrElse(return None)
    val len = hs.get("content-length").flatMap(s =>
      try Some(s.toLong) catch { case _: NumberFormatException => None })
      .getOrElse(return None)
    val contentStart = blank + 4
    if (len < 0 || len > until.toLong - contentStart) return None
    val contentEnd = contentStart + len.toInt
    if (contentEnd + 4 != until) return None // exactly one record
    if (b(contentEnd) != '\r' || b(contentEnd + 1) != '\n' ||
      b(contentEnd + 2) != '\r' || b(contentEnd + 3) != '\n') return None
    val warcType = hs.getOrElse("warc-type", return None)
    val url = hs.getOrElse("warc-target-uri", "")
    val date = hs.getOrElse("warc-date", "")
    val recCt = hs.getOrElse("content-type", "")
    var mime = bareMime(recCt)
    var status = -1
    var bodyStart = -1L
    var bodyLen = -1L
    val blockDigest = sha1Base32(b, contentStart, len.toInt)
    // payload digest defaults to the block digest (non-http records:
    // the payload IS the content block) and narrows to the transfer-
    // decoded HTTP body when an http head parses
    var payloadDigest = blockDigest
    if (recCt.startsWith("application/http") && len > 0) {
      val probeLen = math.min(len, MaxHeaderBytes.toLong).toInt
      val httpHead = java.util.Arrays.copyOfRange(b, contentStart,
        contentStart + probeLen)
      val (st, bo) = Warc.parseHttpHead(httpHead)
      if (bo >= 0) {
        val bFrom = contentStart + bo
        val bUntil = contentStart + len.toInt
        payloadDigest =
          (if (isChunked(httpHead, bo)) dechunk(b, bFrom, bUntil)
           else None) match {
            case Some(dec) => sha1Base32(dec, 0, dec.length)
            // identity encoding — or malformed chunking, where the
            // raw body is the only deterministic thing to digest
            case None => sha1Base32(b, bFrom, bUntil - bFrom)
          }
        if (warcType == "response") {
          status = st
          bodyStart = bFrom.toLong
          bodyLen = len - bo
          mime = httpContentType(httpHead, bo).getOrElse("unk")
        }
      }
    }
    // revisit records (ISO 28500 §6.7.2) carry a truncated content
    // block by DESIGN — their declared `WARC-Payload-Digest` names
    // the ORIGINAL capture's payload, and the published CDX
    // convention keys revisit rows on it (that is how wayback joins
    // a revisit to its capture). Recomputing over the truncated
    // block would break every such join, so the declared digest
    // wins for revisits; everything else keeps the recompute (the
    // integrity posture).
    if (warcType == "revisit") {
      hs.get("warc-payload-digest").foreach { d =>
        val v = d.trim
        if (v.toLowerCase(java.util.Locale.ROOT).startsWith("sha1:"))
          payloadDigest = v.substring(5)
      }
    }
    Some(RecordFacts(warcType, url, date, mime, status, blockDigest,
      payloadDigest, contentStart, len, bodyStart, bodyLen))
  }

  /** Bare lowercased media type — parameters (`; charset=…`) off. */
  private def bareMime(ct: String): String =
    ct.split(";")(0).trim.toLowerCase(java.util.Locale.ROOT)

  /** The payload `Content-Type` out of an HTTP head (bytes
    * `[0, bodyOff)` of the content block). */
  private def httpContentType(httpHead: Array[Byte], bodyOff: Int)
      : Option[String] = {
    val headStr = new String(httpHead, 0,
      math.min(bodyOff, httpHead.length), "ISO-8859-1")
    headStr.split("\r\n").iterator.drop(1).collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT)
          .startsWith("content-type:") =>
        bareMime(l.substring(l.indexOf(':') + 1))
    }
  }

  // ------------------------------------------------------------------
  // Streaming gzip member walk
  // ------------------------------------------------------------------

  /** One forward pass over a multi-member gzip STREAM, emitting per
    * member `(compStart, compLen, uncompLen, retained)` — `retained`
    * is the inflated bytes while `uncompLen <= retainMax`, None past
    * the cap (inflation continues uncounted so the member boundary
    * is still found; CRC still validates). Returns false on ANY
    * framing/CRC/ISIZE violation or truncation — member boundaries
    * downstream of corruption cannot be trusted, so the caller flags
    * the whole asset (the [[GzipMembers.memberIndex]] strictness,
    * re-expressed over a stream). The caller owns the stream.
    *
    * Memory is O(64 KiB + min(member, retainMax)): the input buffer
    * never grows, and leftover compressed bytes after each member's
    * DEFLATE stream (trailer + next member) are re-consumed from the
    * same buffer via `Inflater.getRemaining` — no pushback stream,
    * no re-reads.
    */
  private[io] def memberWalkStreaming(in: java.io.InputStream,
      retainMax: Long)(
      emit: (Long, Long, Long, Option[Array[Byte]]) => Unit): Boolean = {
    val buf = new Array[Byte](64 * 1024)
    var pos = 0
    var lim = 0
    var base = 0L // absolute stream offset of buf(0)
    var eof = false
    def refill(): Unit = {
      if (pos > 0) {
        System.arraycopy(buf, pos, buf, 0, lim - pos)
        base += pos; lim -= pos; pos = 0
      }
      if (!eof && lim < buf.length) {
        val n = in.read(buf, lim, buf.length - lim)
        if (n < 0) eof = true else lim += n
      }
    }
    def avail: Int = lim - pos
    def need(n: Int): Boolean = {
      while (avail < n && !eof) refill()
      avail >= n
    }
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def skip(n: Int): Boolean = {
      var left = n
      while (left > 0) {
        if (!need(1)) return false
        val take = math.min(left, avail)
        pos += take; left -= take
      }
      true
    }
    try {
      var any = false
      while ({ if (avail == 0 && !eof) refill(); avail > 0 }) {
        val memberStart = base + pos
        if (!need(10)) return false
        if (u8() != 0x1f || u8() != 0x8b) return false
        if (u8() != 8) return false // CM must be deflate
        val flg = u8()
        if ((flg & 0xe0) != 0) return false // reserved flag bits
        pos += 6 // MTIME/XFL/OS
        if ((flg & 0x04) != 0) { // FEXTRA
          if (!need(2)) return false
          val xlen = u8() | (u8() << 8)
          if (!skip(xlen)) return false
        }
        if ((flg & 0x08) != 0) { // FNAME: NUL-terminated
          var c = 1
          while (c != 0) { if (!need(1)) return false; c = u8() }
        }
        if ((flg & 0x10) != 0) { // FCOMMENT
          var c = 1
          while (c != 0) { if (!need(1)) return false; c = u8() }
        }
        if ((flg & 0x02) != 0) { if (!skip(2)) return false } // FHCRC
        // the raw deflate stream: feed buffer slices, sync `pos` with
        // the inflater's leftover after every call so refills never
        // discard unconsumed compressed bytes
        val inf = new java.util.zip.Inflater(true)
        val crc = new java.util.zip.CRC32()
        val out = new java.io.ByteArrayOutputStream()
        val obuf = new Array[Byte](64 * 1024)
        var produced = 0L
        var retain = true
        try {
          // `fed` tracks whether the inflater currently holds a slice
          // of `buf`: before ANY refill/re-feed, `pos` must sync to
          // `lim - getRemaining` (what the inflater actually consumed)
          // or the next setInput would re-feed consumed bytes
          var fed = false
          var done = false
          while (!done) {
            if (inf.needsInput) {
              if (fed) { pos = lim - inf.getRemaining; fed = false }
              if (!need(1)) return false // truncated deflate stream
              inf.setInput(buf, pos, avail)
              fed = true
            }
            val n = inf.inflate(obuf)
            if (n > 0) {
              crc.update(obuf, 0, n); produced += n
              if (retain) {
                if (produced > retainMax) { retain = false; out.reset() }
                else out.write(obuf, 0, n)
              }
            }
            if (inf.finished()) {
              pos = lim - inf.getRemaining
              done = true
            } else if (n == 0) {
              if (inf.needsDictionary) return false
              if (!inf.needsInput) return false // cannot progress
            }
          }
        } finally inf.end()
        // trailer: CRC-32 + ISIZE, both LE
        if (!need(8)) return false
        def u32le(): Long =
          u8().toLong | (u8().toLong << 8) | (u8().toLong << 16) |
            (u8().toLong << 24)
        if (u32le() != crc.getValue) return false
        if (u32le() != (produced & 0xffffffffL)) return false
        emit(memberStart, base + pos - memberStart, produced,
          if (retain) Some(out.toByteArray) else None)
        any = true
      }
      any
    } catch { case scala.util.control.NonFatal(_) => false }
  }

  // ------------------------------------------------------------------
  // Index construction
  // ------------------------------------------------------------------

  /** One CDX entry; `parsed = false` flags a member whose spans are
    * valid but whose payload was not exactly one well-formed record
    * (or exceeded `maxRecordBytes`) — field columns empty. */
  final case class CdxEntry(recordIdx: Int, urlkey: String,
      timestamp: String, url: String, mime: String, status: Int,
      digest: String, payloadDigest: String, offset: Long, length: Long,
      uncompLen: Long, warcType: String, parsed: Boolean)

  private def entryFor(idx: Int, offset: Long, length: Long,
      uncompLen: Long, bytes: Option[Array[Byte]]): CdxEntry =
    entryFromFacts(idx, offset, length, uncompLen,
      bytes.flatMap(u => parseSingleRecord(u, 0, u.length)))

  private def entryFromFacts(idx: Int, offset: Long, length: Long,
      uncompLen: Long, facts: Option[RecordFacts]): CdxEntry =
    facts match {
      case Some(f) => CdxEntry(idx, surtKey(f.url), timestamp14(f.date),
        f.url, f.mime, f.status, f.digest, f.payloadDigest, offset,
        length, uncompLen, f.warcType, parsed = true)
      case None => CdxEntry(idx, "", "", "", "", -1, "", "", offset,
        length, uncompLen, "", parsed = false)
    }

  /** The CDX index over archive BYTES: `.warc.gz` walks gzip members
    * (compressed spans — the ranged-fetch unit); plain WARC indexes
    * records directly (raw record spans). None when the bytes are
    * neither (or member tiling/CRC is broken). */
  def cdxIndex(b: Array[Byte], maxRecordBytes: Long = 1L << 26)
      : Option[IndexedSeq[CdxEntry]] = {
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) {
      val out = scala.collection.mutable.ArrayBuffer.empty[CdxEntry]
      val in = new java.io.ByteArrayInputStream(b)
      val ok = memberWalkStreaming(in, maxRecordBytes) {
        (start, clen, ulen, bytes) =>
          out += entryFor(out.length, start, clen, ulen, bytes)
      }
      if (!ok || out.isEmpty) None else Some(out.toIndexedSeq)
    } else {
      Warc.recordIndex(b).map(_.map { r =>
        // parse IN PLACE (no per-record copy), and apply the SAME
        // maxRecordBytes flag posture as the gzip walk and the
        // by-path twin: a record past the cap keeps its span but
        // flags `parsed = false` — one archive, one row set,
        // whichever seam it enters through (and a corrupt
        // Content-Length cannot drive a giant allocation here)
        entryFromFacts(r.recordIdx, r.byteStart, r.byteLen, r.byteLen,
          if (r.byteLen <= maxRecordBytes)
            parseSingleRecord(b, r.byteStart.toInt,
              (r.byteStart + r.byteLen).toInt)
          else None)
      })
    }
  }

  /** One CDX row; `indexed = false` flags an unwalkable asset. */
  final case class CdxRow(asset_id: Long, record_idx: Int, urlkey: String,
      timestamp: String, url: String, mime: String, status: Int,
      digest: String, payload_digest: String, offset: Long, length: Long,
      uncomp_len: Long, warc_type: String, parsed: Boolean,
      indexed: Boolean)

  private def rows(id: Long, entries: Option[Seq[CdxEntry]])
      : Iterator[CdxRow] = entries match {
    case Some(es) => es.iterator.map(e =>
      CdxRow(id, e.recordIdx, e.urlkey, e.timestamp, e.url, e.mime,
        e.status, e.digest, e.payloadDigest, e.offset, e.length,
        e.uncompLen, e.warcType, e.parsed, indexed = true))
    case None => Iterator.single(CdxRow(id, -1, "", "", "", "", -1, "",
      "", 0L, 0L, 0L, "", parsed = false, indexed = false))
  }

  /** CDX indexing over an (id, bytes) corpus. mapPartitions, flagged
    * fallback — the walker contract. */
  def extractCdx(df: DataFrame, idCol: String, bytesCol: String,
      maxRecordBytes: Long = 1L << 26)(implicit spark: SparkSession)
      : Dataset[CdxRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val idx =
          try Option(bytes).flatMap(cdxIndex(_, maxRecordBytes))
          catch { case scala.util.control.NonFatal(_) => None }
        rows(id, idx)
      })
  }

  /** CDX indexing over an (id, path) corpus — the index-BUILD job a
    * crawl bucket runs once per archive. `.warc.gz` streams forward
    * through [[PathIO]] in O(record) memory (one open per object);
    * plain archives reuse [[Warc.recordIndexSeekable]] for spans and
    * read each record once (bounded by `maxRecordBytes`) for its
    * facts + digest. Building an index reads the data by nature —
    * ONE pass, after which consumers touch only the spans the index
    * selects. Unreadable/ill-formed paths emit the flagged row. */
  def extractCdxByPath(df: DataFrame, idCol: String, pathCol: String,
      maxRecordBytes: Long = 1L << 26)(implicit spark: SparkSession)
      : Dataset[CdxRow] = {
    import spark.implicits._
    val confBc = PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (id, path) =>
          val idx: Option[Seq[CdxEntry]] =
            try {
              val raw = new java.io.PushbackInputStream(
                PathIO.openStream(path, conf), 2)
              // the probe reads can themselves fail (network stream);
              // close before the outer catch flags the row, or the
              // handle leaks once per failing path
              val (h0, h1) =
                try (raw.read(), raw.read())
                catch {
                  case scala.util.control.NonFatal(e) =>
                    raw.close(); throw e
                }
              if (h0 == 0x1f && h1 == 0x8b) {
                raw.unread(h1); raw.unread(h0)
                try {
                  val out =
                    scala.collection.mutable.ArrayBuffer.empty[CdxEntry]
                  val ok = memberWalkStreaming(raw, maxRecordBytes) {
                    (start, clen, ulen, bytes) =>
                      out += entryFor(out.length, start, clen, ulen, bytes)
                  }
                  if (!ok || out.isEmpty) None else Some(out.toSeq)
                } finally raw.close()
              } else {
                raw.close()
                val r = PathIO.openRange(path, conf)
                try {
                  Warc.recordIndexSeekable(r).map(_.map { rec =>
                    val whole =
                      if (rec.byteLen <= maxRecordBytes)
                        Some(r.readFully(rec.byteStart, rec.byteLen.toInt))
                      else None
                    entryFor(rec.recordIdx, rec.byteStart, rec.byteLen,
                      rec.byteLen, whole)
                  })
                } finally r.close()
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          rows(id, idx)
        }
      }
  }

  // ------------------------------------------------------------------
  // CDX-driven hydration
  // ------------------------------------------------------------------

  /** One hydrated record: the fields re-derived from the FETCHED
    * bytes (both digests included — comparing `digest` against a
    * self-built index row's block digest, or `payload_digest` against
    * a PUBLISHED Common Crawl index row's digest, pins byte integrity
    * across the fetch), plus HTML title/text when the body is markup.
    * `hydrated = false` flags refusal (fetch failed, inflate failed,
    * not exactly one record). */
  final case class HydratedRecord(id: Long, warc_type: String,
      url: String, status: Int, mime: String, digest: String,
      payload_digest: String, title: String, text: String,
      n_bytes: Long, hydrated: Boolean)

  /** Selective record hydration from CDX rows `(id, path, offset,
    * length)`: [[SpanFetch]] moves exactly the indexed spans (ranged
    * GETs, per-partition reader reuse, oversize refusal), each span
    * inflates if it is a gzip member ([[Warc.gunzipAll]], capped at
    * `maxRecordBytes`) and parses as exactly one record. THE scale
    * property: a filter on the index (mime/status/urlkey) upstream
    * of this call prunes the bytes that ever move — the Common Crawl
    * consumption pattern. */
  def hydrateByCdx(df: DataFrame, idCol: String, pathCol: String,
      offsetCol: String, lengthCol: String,
      maxSpanBytes: Long = 1L << 26, maxRecordBytes: Long = 1L << 26)(
      implicit spark: SparkSession): Dataset[HydratedRecord] = {
    import spark.implicits._
    SpanFetch.fetchSpans(df, idCol, pathCol, offsetCol, lengthCol,
      maxSpanBytes).map { f =>
      val facts: Option[(RecordFacts, Array[Byte])] =
        if (!f.fetched) None
        else {
          val rec =
            if (f.bytes.length >= 2 && (f.bytes(0) & 0xff) == 0x1f &&
              (f.bytes(1) & 0xff) == 0x8b)
              Warc.gunzipAll(f.bytes, maxRecordBytes)
            else Some(f.bytes)
          rec.flatMap(u => parseSingleRecord(u, 0, u.length).map((_, u)))
        }
      facts match {
        case Some((rf, u)) =>
          val page =
            if (rf.bodyStart >= 0 && rf.bodyLen > 0)
              Warc.htmlPageText(u, rf.contentStart.toLong, rf.bodyStart,
                rf.bodyLen)
            else None
          HydratedRecord(f.id, rf.warcType, rf.url, rf.status, rf.mime,
            rf.digest, rf.payloadDigest, page.map(_._1).getOrElse(""),
            page.map(_._2).getOrElse(""), u.length.toLong,
            hydrated = true)
        case None => HydratedRecord(f.id, "", "", -1, "", "", "", "",
          "", 0L, hydrated = false)
      }
    }
  }

  // ------------------------------------------------------------------
  // CDXJ text form
  // ------------------------------------------------------------------

  private[io] def jsonEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** One CDXJ line: `urlkey timestamp {json}` — the published Common
    * Crawl index layout (numeric fields as strings, per the format's
    * own convention). The JSON `digest` field carries the PAYLOAD
    * digest — what published CC index rows carry, so emitted lines
    * interoperate with CC tooling and with [[hydrateByCdx]]'s
    * payload-digest verification; the block digest stays a column of
    * [[CdxRow]] for self-built-index integrity checks. The text form
    * is SPACE-delimited, so a urlkey
    * carrying spaces (dirty non-URL WARC-Target-URIs pass through
    * [[surtKey]] totally) serializes with `%20` in their place —
    * real canonicalized urlkeys never contain spaces, and an escaped
    * key still round-trips as ONE token instead of silently
    * corrupting the urlkey AND timestamp fields on parse. The same
    * treatment covers the other structural characters a dirty key
    * could smuggle in: CR/LF/TAB (line terminators — a lone `\n`
    * inside a header VALUE survives [[Warc.headerMap]]'s CRLF split)
    * and `{` (which [[parseCdxj]]'s JSON-start probe keys on).
    *
    * The escape is ONE-WAY by design: [[parseCdxj]] does not decode
    * it, because legitimate urlkeys carry the original URL's own
    * percent-encoding and published-index interop requires verbatim
    * keys (see the parse-side doc). A dirty escaped key therefore
    * reads back escaped — the readable-and-joinable form for a key
    * that was never a real URL to begin with. */
  def cdxjLine(e: CdxRow, filename: String): String = {
    val key = {
      val k = e.urlkey
      if (k.forall(c => c != ' ' && c != '\r' && c != '\n' &&
          c != '\t' && c != '{')) k
      else {
        val sb = new java.lang.StringBuilder(k.length + 8)
        k.foreach {
          case ' ' => sb.append("%20")
          case '\r' => sb.append("%0D")
          case '\n' => sb.append("%0A")
          case '\t' => sb.append("%09")
          case '{' => sb.append("%7B")
          case c => sb.append(c)
        }
        sb.toString
      }
    }
    val j = new java.lang.StringBuilder()
    j.append("{\"url\": \"").append(jsonEscape(e.url))
      .append("\", \"mime\": \"").append(jsonEscape(e.mime))
      .append("\", \"status\": \"").append(e.status)
      .append("\", \"digest\": \"").append(jsonEscape(
        if (e.payload_digest.nonEmpty) e.payload_digest else e.digest))
      .append("\", \"length\": \"").append(e.length)
      .append("\", \"offset\": \"").append(e.offset)
      .append("\", \"filename\": \"").append(jsonEscape(filename))
      .append("\"}")
    s"$key ${e.timestamp} ${j.toString}"
  }

  /** Parse CDXJ lines back to rows — the consumer side for
    * PUBLISHED index files (Common Crawl's `cdx-*.gz`): urlkey and
    * timestamp split off the first two spaces, the rest `from_json`
    * (codegen'd — no UDF). Unparseable lines keep their `line` with
    * null fields, so corrupt index shards stay visible — and that
    * contract holds under Spark 4's default ANSI mode: every
    * positional read is the `try_` variant and every numeric cast is
    * `try_cast`, so a blank line, a truncated final line, a line
    * without spaces, or a `-` placeholder in a numeric field (common
    * in published wayback data) yields a null-field row, never a
    * thrown `INVALID_ARRAY_INDEX`/`CAST_INVALID_INPUT` that would
    * kill the whole batch or [[graft.streaming.StreamCdx]] stream.
    *
    * The urlkey column is VERBATIM — [[cdxjLine]]'s `%20`-style
    * escapes of dirty keys are deliberately NOT decoded here, because
    * legitimate canonicalized urlkeys carry the original URL's own
    * percent-encoding (`com,example)/a%20b` for `/a%20b`), and a
    * published Common Crawl index row must join byte-for-byte against
    * [[surtKey]] output. Decoding would corrupt every such key to
    * make a dirty-key round-trip cosmetic; the asymmetry is the
    * documented price of interop (see [[cdxjLine]]).
    *
    * Columns: urlkey, timestamp, url, mime, status (int), digest,
    * length, offset (long), filename. */
  def parseCdxj(df: DataFrame, lineCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("url", StringType), StructField("mime", StringType),
      StructField("status", StringType), StructField("digest", StringType),
      StructField("length", StringType), StructField("offset", StringType),
      StructField("filename", StringType)))
    // Column API throughout (no SQL-string splice); the name is
    // backtick-quoted so a column needing quoting (dots/spaces)
    // resolves as ONE name instead of a nested-field path
    val line = col("`" + lineCol.replace("`", "``") + "`")
    val toks = split(line, " ", 3)
    val jsonTok = try_element_at(toks, lit(3))
    // a well-formed CDXJ line is exactly `urlkey timestamp {json}`
    val ok = size(toks) === 3 && jsonTok.startsWith("{")
    val j = from_json(when(ok, jsonTok), schema)
    df.withColumn("urlkey", when(ok, try_element_at(toks, lit(1))))
      .withColumn("timestamp", when(ok, try_element_at(toks, lit(2))))
      .withColumn("url", j("url"))
      .withColumn("mime", j("mime"))
      .withColumn("status", j("status").try_cast("int"))
      .withColumn("digest", j("digest"))
      .withColumn("length", j("length").try_cast("long"))
      .withColumn("offset", j("offset").try_cast("long"))
      .withColumn("filename", j("filename"))
  }
}
