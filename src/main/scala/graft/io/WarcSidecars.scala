package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** WET/WAT SIDECAR GENERATION — the text/metadata extract shards
  * Common Crawl publishes BESIDE every archive (public convention:
  * the `.warc.wet.gz` / `.warc.wat.gz` files of the CC layout, built
  * on ISO 28500 record forms).
  *
  * Most consumers of a 100 TB crawl never read the archives: they
  * read the WET (one `conversion` record per page, body = the
  * extracted plain text) or the WAT (one `metadata` record per source
  * record, body = a JSON envelope of the record's WARC headers, HTTP
  * facts, and container span). The engine already extracts per-record
  * text ([[Warc.extractHtmlPages]]) and metadata ([[WarcCdx]]); this
  * module emits them in the published sidecar shard forms so a
  * curated corpus interoperates with CC tooling — and, round-trip,
  * the engine's own walkers index the emitted sidecars (they are
  * per-record-gzipped WARC files like any other).
  *
  * Deviations from CC's own generator, chosen for DETERMINISM (two
  * runs over one archive must emit identical bytes — that is what
  * makes the shards dedupable, cacheable, and oracle-testable):
  *  - `WARC-Record-ID`s are content-addressed (`<urn:sha1:…>` of the
  *    record body) instead of random UUIDs;
  *  - the warcinfo `WARC-Date` is caller-supplied, defaulting to the
  *    FIRST source record's date, instead of wall-clock time;
  *  - WAT JSON carries a fixed, documented field order.
  *
  * Scale posture: one forward pass per archive, O(record) transient
  * memory beyond the asset bytes; the DataFrame seam is the standard
  * mapPartitions walker shape with flagged fallback (corrupt assets
  * emit `ok = false`, never a task kill). Sidecar bytes are
  * per-record gzip members ([[Warc.gzipPerRecord]] — the CC shape),
  * so [[WarcCdx.cdxIndex]] spans them for ranged fetch like any
  * archive.
  */
object WarcSidecars {

  private val MaxHeaderBytes = 64 * 1024

  /** `shard.warc.gz` → `shard.warc.wet.gz` (or `.wat.`) — the CC
    * sidecar naming convention; non-`.warc[.gz]` names just append. */
  def sidecarName(filename: String, kind: String): String = {
    require(kind == "wet" || kind == "wat", s"unknown sidecar: $kind")
    if (filename.endsWith(".warc.gz"))
      filename.stripSuffix(".warc.gz") + s".warc.$kind.gz"
    else if (filename.endsWith(".warc"))
      filename.stripSuffix(".warc") + s".warc.$kind.gz"
    else filename + s".$kind.gz"
  }

  /** The record's WARC headers as ORDERED (name, value) pairs —
    * [[Warc.headerMap]] lowercases and unorders for routing; the WAT
    * envelope reproduces the original carriage. None on a malformed
    * head. */
  private[io] def recordHeaders(u: Array[Byte], start: Int)
      : Option[(Seq[(String, String)], Int)] = {
    val hdrCap = math.min(u.length, start + MaxHeaderBytes)
    val blank = Warc.findBlankLine(u, start, hdrCap)
    if (blank < 0) return None
    val head = new String(u, start, blank - start, "ISO-8859-1")
    val lines = head.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("WARC/1.")) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    lines.iterator.drop(1).foreach { l =>
      val c = l.indexOf(':')
      if (c <= 0) return None
      out += ((l.substring(0, c).trim, l.substring(c + 1).trim))
    }
    Some((out.toSeq, blank - start))
  }

  private def headerValue(hs: Seq[(String, String)], name: String)
      : Option[String] =
    hs.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v
    }

  private def contentAddressedId(body: Array[Byte]): String =
    s"<urn:sha1:${WarcCdx.sha1Base32(body, 0, body.length)}>"

  /** The leading `warcinfo` record both sidecars open with. */
  private def warcinfo(filename: String, kind: String, date: String,
      software: String): Array[Byte] = {
    val body = (s"software: $software\r\n" +
      "format: WARC File Format 1.0\r\n" +
      s"extractedFrom: $filename\r\n").getBytes("ISO-8859-1")
    Warc.encodeSyntheticHeaders(Seq((Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> contentAddressedId(body),
      "WARC-Date" -> date,
      "WARC-Filename" -> sidecarName(filename, kind),
      "Content-Type" -> "application/warc-fields"), body)))
  }

  /** The walked source: uncompressed bytes, record index, and the
    * container span per record — a record alone in its gzip member
    * (the per-record-gzipped CC shape) gets the member's COMPRESSED
    * span (the ranged-fetch unit, the same span [[WarcCdx.cdxIndex]]
    * emits); records sharing a member, and records of plain archives,
    * keep raw record spans. The rule is PER MEMBER so the byte- and
    * path-twins agree exactly. */
  private def walkSource(archive: Array[Byte])
      : Option[(Array[Byte], IndexedSeq[Warc.WarcRecord],
        Int => (Long, Long))] = {
    val isGz = archive.length >= 2 && (archive(0) & 0xff) == 0x1f &&
      (archive(1) & 0xff) == 0x8b
    val u = (if (isGz) Warc.gunzipAll(archive)
             else Some(archive)).getOrElse(return None)
    val recs = Warc.recordIndex(u).getOrElse(return None)
    val raw: Int => (Long, Long) =
      i => (recs(i).byteStart, recs(i).byteLen)
    val spanOf: Int => (Long, Long) =
      if (isGz) {
        GzipMembers.memberIndex(archive) match {
          case Some(ms) =>
            // records → members by cumulative uncompressed offset
            val spans = new Array[(Long, Long)](recs.length)
            var uOff = 0L
            var ri = 0
            ms.foreach { m =>
              val from = ri
              while (ri < recs.length &&
                recs(ri).byteStart < uOff + m.uncompLen) ri += 1
              // span the member ONLY when its one record opens it and
              // fits inside it (the streaming twin's standalone-parse
              // shape) — a record crossing a member boundary keeps
              // its raw span (a member-span fetch would truncate it)
              if (ri - from == 1 && recs(from).byteStart == uOff &&
                recs(from).byteLen <= m.uncompLen)
                spans(from) = (m.compStart, m.compLen)
              uOff += m.uncompLen
            }
            i => Option(spans(i)).getOrElse(raw(i))
          case None => raw
        }
      } else raw
    Some((u, recs, spanOf))
  }

  private def firstDate(u: Array[Byte],
      recs: IndexedSeq[Warc.WarcRecord]): String =
    recs.headOption
      .flatMap(r => recordHeaders(u, r.byteStart.toInt))
      .flatMap { case (hs, _) => headerValue(hs, "WARC-Date") }
      .getOrElse("")

  // ------------------------------------------------------------------
  // WET — text extraction sidecar
  // ------------------------------------------------------------------

  /** The `conversion` record for one source record, or None when the
    * record is not a 2xx HTML response under `maxContentBytes` (the
    * [[Warc.extractHtmlPages]] page rule). `u` holds the record's
    * bytes; `r`'s offsets address `u`. */
  private def conversionFor(u: Array[Byte], r: Warc.WarcRecord,
      fallbackDate: String, maxContentBytes: Long)
      : Option[Array[Byte]] = {
    if (!(r.warcType == "response" && r.httpStatus >= 200 &&
      r.httpStatus < 300 && r.bodyStart >= 0 &&
      r.contentLen <= maxContentBytes)) return None
    Warc.htmlPageText(u, r.contentStart, r.bodyStart, r.bodyLen)
      .map { case (_, text) =>
        val body = text.getBytes("UTF-8")
        val hs = recordHeaders(u, r.byteStart.toInt).map(_._1)
          .getOrElse(Seq.empty)
        val headers = Seq(
          "WARC-Type" -> "conversion",
          "WARC-Record-ID" -> contentAddressedId(body),
          "WARC-Date" -> headerValue(hs, "WARC-Date")
            .getOrElse(fallbackDate)) ++
          headerValue(hs, "WARC-Record-ID")
            .map("WARC-Refers-To" -> _).toSeq ++ Seq(
          "WARC-Target-URI" -> r.targetUri,
          "WARC-Block-Digest" ->
            s"sha1:${WarcCdx.sha1Base32(body, 0, body.length)}",
          "Content-Type" -> "text/plain")
        Warc.encodeSyntheticHeaders(Seq((headers, body)))
      }
  }

  /** The WET sidecar records of an archive: the warcinfo, then one
    * `conversion` record per response with a 2xx status and an HTML
    * body under `maxContentBytes` whose text extraction succeeds —
    * the SAME page rule as [[Warc.extractHtmlPages]], so the WET of
    * an archive carries exactly the page set every other seam
    * yields. Conversion records carry the original `WARC-Target-URI`
    * and `WARC-Date`, `WARC-Refers-To` the source record's id, a
    * `WARC-Block-Digest` of the text bytes, and `Content-Type:
    * text/plain`. Records over `maxRecordBytes` are OMITTED (the
    * same skip the streaming path twin applies — their facts live in
    * the CDX index; sidecars carry text/metadata). None when the
    * bytes are not a WARC. */
  def wetRecords(archive: Array[Byte], filename: String,
      date: String = "", software: String = "graft.WarcSidecars",
      maxContentBytes: Long = 1L << 22,
      maxRecordBytes: Long = 1L << 26): Option[Seq[Array[Byte]]] = {
    val (u, recs, _) = walkSource(archive).getOrElse(return None)
    val d = if (date.nonEmpty) date else firstDate(u, recs)
    val conversions = recs.iterator
      .filter(_.byteLen <= maxRecordBytes)
      .flatMap(r => conversionFor(u, r, d, maxContentBytes))
      .toSeq
    Some(warcinfo(filename, "wet", d, software) +: conversions)
  }

  /** [[wetRecords]] in the published shard form: one gzip member per
    * record (`.warc.wet.gz`). */
  def wetGz(archive: Array[Byte], filename: String, date: String = "",
      software: String = "graft.WarcSidecars",
      maxContentBytes: Long = 1L << 22): Option[Array[Byte]] =
    wetRecords(archive, filename, date, software, maxContentBytes)
      .map(Warc.gzipPerRecord)

  // ------------------------------------------------------------------
  // WAT — metadata sidecar
  // ------------------------------------------------------------------

  private def jsonStr(s: String): String =
    "\"" + WarcCdx.jsonEscape(s) + "\""

  private def jsonObj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => jsonStr(k) + ":" + v }
      .mkString("{", ",", "}")

  /** The WAT envelope JSON of one record — fixed field order
    * (Envelope{Format, WARC-Header-Length, Actual-Content-Length,
    * Block-Digest, Payload-Digest, WARC-Header-Metadata (original
    * header order), Payload-Metadata{Actual-Content-Type,
    * HTTP-Response-Metadata{Response-Message{Status}, Content-Type,
    * HTML-Metadata{Head{Title}, Links[{path, url}]}}}},
    * Container{Filename, Offset, Length}), digests in the WARC
    * `sha1:BASE32` label form. */
  private def watJson(u: Array[Byte], r: Warc.WarcRecord,
      hs: Seq[(String, String)], headerLen: Int, filename: String,
      span: (Long, Long), maxContentBytes: Long): String = {
    val facts = WarcCdx.parseSingleRecord(u, r.byteStart.toInt,
      (r.byteStart + r.byteLen).toInt)
    val headerMeta = jsonObj(hs.map { case (k, v) => (k, jsonStr(v)) })
    val httpMeta: Option[(String, String)] = facts
      .filter(f => f.status >= 0 && r.warcType == "response")
      .map { f =>
        // title/link extraction walks the whole body — capped at the
        // WET page bound so an oversize response still gets its
        // envelope (headers/digests/span) without an unbounded HTML
        // parse
        val walkBody = r.bodyStart >= 0 && r.bodyLen > 0 &&
          r.contentLen <= maxContentBytes
        val title =
          if (walkBody)
            Warc.htmlPageText(u, r.contentStart, r.bodyStart, r.bodyLen)
              .map(_._1).filter(_.nonEmpty)
          else None
        // the CC WAT Links list: raw entity-decoded hrefs with their
        // path labels, document order (resolution is the consumer's
        // step); omitted when the page has none
        val links =
          if (walkBody)
            Warc.htmlPageLinks(u, r.contentStart, r.bodyStart,
              r.bodyLen, r.targetUri).getOrElse(Seq.empty)
          else Seq.empty
        val htmlMeta =
          title.map(t =>
            "Head" -> jsonObj(Seq("Title" -> jsonStr(t)))).toSeq ++
            (if (links.nonEmpty)
              Seq("Links" -> links.map { case (p, h, _) =>
                jsonObj(Seq("path" -> jsonStr(p), "url" -> jsonStr(h)))
              }.mkString("[", ",", "]"))
            else Seq.empty)
        "HTTP-Response-Metadata" -> jsonObj(Seq(
          "Response-Message" -> jsonObj(Seq(
            "Status" -> jsonStr(f.status.toString))),
          "Content-Type" -> jsonStr(f.mime)) ++
          (if (htmlMeta.nonEmpty)
            Seq("HTML-Metadata" -> jsonObj(htmlMeta)) else Seq.empty))
      }
    val payloadMeta = jsonObj(Seq(
      "Actual-Content-Type" -> jsonStr(r.contentType)) ++ httpMeta.toSeq)
    val envelope = jsonObj(Seq(
      "Format" -> jsonStr("WARC"),
      "WARC-Header-Length" -> jsonStr(headerLen.toString),
      "Actual-Content-Length" -> jsonStr(r.contentLen.toString)) ++
      facts.map(f => Seq(
        "Block-Digest" -> jsonStr(s"sha1:${f.digest}"),
        "Payload-Digest" -> jsonStr(s"sha1:${f.payloadDigest}"))
      ).getOrElse(Seq.empty) ++ Seq(
      "WARC-Header-Metadata" -> headerMeta,
      "Payload-Metadata" -> payloadMeta))
    jsonObj(Seq(
      "Envelope" -> envelope,
      "Container" -> jsonObj(Seq(
        "Filename" -> jsonStr(filename),
        "Offset" -> jsonStr(span._1.toString),
        "Length" -> jsonStr(span._2.toString)))))
  }

  /** The `metadata` record for one source record. `u` holds the
    * record's bytes; `r`'s offsets address `u`; `span` is the
    * container span the envelope points at. */
  private def metadataFor(u: Array[Byte], r: Warc.WarcRecord,
      filename: String, span: (Long, Long), fallbackDate: String,
      maxContentBytes: Long): Array[Byte] = {
    val (hs, headerLen) = recordHeaders(u, r.byteStart.toInt)
      .getOrElse((Seq.empty[(String, String)], 0))
    val body = watJson(u, r, hs, headerLen, filename, span,
        maxContentBytes)
      .getBytes("UTF-8")
    val headers = Seq(
      "WARC-Type" -> "metadata",
      "WARC-Record-ID" -> contentAddressedId(body),
      "WARC-Date" -> headerValue(hs, "WARC-Date")
        .getOrElse(fallbackDate)) ++
      headerValue(hs, "WARC-Record-ID")
        .map("WARC-Refers-To" -> _).toSeq ++
      (if (r.targetUri.nonEmpty)
        Seq("WARC-Target-URI" -> r.targetUri) else Seq.empty) ++ Seq(
      "Content-Type" -> "application/json")
    Warc.encodeSyntheticHeaders(Seq((headers, body)))
  }

  /** The WAT sidecar records of an archive: the warcinfo, then one
    * `metadata` record per SOURCE record (every type — request,
    * response, metadata, warcinfo alike), body = the [[watJson]]
    * envelope, `Content-Type: application/json`. Container spans are
    * gzip-member spans for the per-record-gzipped CC shape (the
    * ranged-fetch unit — the same spans [[WarcCdx.cdxIndex]] emits),
    * raw record spans otherwise. Records over `maxRecordBytes` are
    * OMITTED (path-twin parity, as in [[wetRecords]]). The envelope's
    * optional `Head.Title` is extracted only for responses under
    * `maxContentBytes` (the WET page bound) — an oversize response
    * keeps its full envelope, just without the HTML walk. None when
    * the bytes are not a WARC. */
  def watRecords(archive: Array[Byte], filename: String,
      date: String = "", software: String = "graft.WarcSidecars",
      maxRecordBytes: Long = 1L << 26,
      maxContentBytes: Long = 1L << 22): Option[Seq[Array[Byte]]] = {
    val (u, recs, spanOf) = walkSource(archive).getOrElse(return None)
    val d = if (date.nonEmpty) date else firstDate(u, recs)
    val metas = recs.iterator
      .filter(_.byteLen <= maxRecordBytes)
      .map(r => metadataFor(u, r, filename, spanOf(r.recordIdx), d,
        maxContentBytes))
      .toSeq
    Some(warcinfo(filename, "wat", d, software) +: metas)
  }

  /** [[watRecords]] in the published shard form (`.warc.wat.gz`). */
  def watGz(archive: Array[Byte], filename: String, date: String = "",
      software: String = "graft.WarcSidecars"): Option[Array[Byte]] =
    watRecords(archive, filename, date, software)
      .map(Warc.gzipPerRecord)

  // ------------------------------------------------------------------
  // DataFrame seam
  // ------------------------------------------------------------------

  /** One asset's sidecars; `ok = false` flags a non-WARC asset (both
    * shards empty). Record counts include the warcinfo. */
  final case class SidecarShard(asset_id: Long, filename: String,
      wet: Array[Byte], wat: Array[Byte], wet_records: Int,
      wat_records: Int, ok: Boolean)

  /** WET+WAT generation over an (id, bytes, filename) corpus — the
    * sidecar-build job a crawl bucket runs once per archive, emitted
    * as per-record-gzipped shard bytes ready for a parquet/binary
    * sink or [[graft.io.Tables]] write. mapPartitions, flagged
    * fallback — the walker contract. For archives too large to stage
    * as a byte column, [[extractSidecarsByPath]] streams. */
  def extractSidecars(df: DataFrame, idCol: String, bytesCol: String,
      filenameCol: String, date: String = "",
      software: String = "graft.WarcSidecars")(
      implicit spark: SparkSession): Dataset[SidecarShard] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol),
        col(filenameCol).cast("string"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, filename) =>
        val built =
          try {
            for {
              b <- Option(bytes)
              wet <- wetRecords(b, filename, date, software)
              wat <- watRecords(b, filename, date, software)
            } yield (Warc.gzipPerRecord(wet), Warc.gzipPerRecord(wat),
              wet.length, wat.length)
          } catch { case scala.util.control.NonFatal(_) => None }
        built match {
          case Some((wet, wat, nWet, nWat)) =>
            SidecarShard(id, filename, wet, wat, nWet, nWat, ok = true)
          case None => SidecarShard(id, filename, Array.empty[Byte],
            Array.empty[Byte], 0, 0, ok = false)
        }
      })
  }

  /** [[extractSidecars]] over an (id, path) corpus — the sidecar-
    * build job for archives that must NOT stage in memory (a real CC
    * archive is ~1 GB compressed): `.warc.gz` streams forward through
    * [[PathIO]] via [[WarcCdx.memberWalkStreaming]] in O(member)
    * transient memory; plain archives walk seekable and read each
    * record once. Only the OUTPUT shards accumulate — WET/WAT are KBs
    * per MB of archive, the proportionality that makes sidecars worth
    * publishing. Byte-for-byte parity with the byte twin is
    * spec-pinned (same page rule, same `maxRecordBytes` skip, same
    * per-member container-span rule), with two documented corners:
    * if the FIRST record exceeds `maxRecordBytes` the stream cannot
    * read its date for the warcinfo fallback — supply `date`
    * explicitly for such archives; and a record CROSSING a gzip
    * member boundary (never the per-record-gzipped CC shape) parses
    * in the byte twin (which inflates the whole archive) but flags
    * here (the forward walk sees only one member at a time). The envelope/warcinfo filename is the path's
    * last segment. Unreadable/ill-formed paths (or any corrupt
    * member/record — sidecars of a corrupt archive would silently
    * misrepresent it) emit the flagged row. */
  def extractSidecarsByPath(df: DataFrame, idCol: String,
      pathCol: String, date: String = "",
      software: String = "graft.WarcSidecars",
      maxContentBytes: Long = 1L << 22,
      maxRecordBytes: Long = 1L << 26)(
      implicit spark: SparkSession): Dataset[SidecarShard] = {
    import spark.implicits._
    val confBc = PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.map { case (id, path) =>
          val filename = path.substring(path.lastIndexOf('/') + 1)
          val built: Option[(Array[Byte], Array[Byte], Int, Int)] =
            try {
              val wets =
                scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
              val wats =
                scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
              var d = date
              var dateResolved = date.nonEmpty
              var bad = false
              // one record's worth of sidecar records, appended in
              // source order — m holds the record, r addresses m
              def emitFor(m: Array[Byte], r: Warc.WarcRecord,
                  span: (Long, Long)): Unit = {
                if (!dateResolved) {
                  d = recordHeaders(m, r.byteStart.toInt)
                    .flatMap { case (hs, _) =>
                      headerValue(hs, "WARC-Date") }
                    .getOrElse("")
                  dateResolved = true
                }
                conversionFor(m, r, d, maxContentBytes)
                  .foreach(wets += _)
                wats += metadataFor(m, r, filename, span, d,
                  maxContentBytes)
              }
              val raw = new java.io.PushbackInputStream(
                PathIO.openStream(path, conf), 2)
              val (h0, h1) =
                try (raw.read(), raw.read())
                catch {
                  case scala.util.control.NonFatal(e) =>
                    raw.close(); throw e
                }
              val walked: Boolean =
                if (h0 == 0x1f && h1 == 0x8b) {
                  raw.unread(h1); raw.unread(h0)
                  try {
                    // global uncompressed offset, so multi-record
                    // members fall back to the SAME raw spans the
                    // byte twin's walkSource computes
                    var uOff = 0L
                    WarcCdx.memberWalkStreaming(raw, maxRecordBytes) {
                      (start, clen, ulen, bytes) =>
                        bytes.foreach { m =>
                          Warc.recordIndex(m) match {
                            case Some(rs) => rs.foreach { r =>
                              // a record ALONE in its member gets the
                              // member's compressed span (the walkSource
                              // per-member rule)
                              emitFor(m, r,
                                if (rs.length == 1) (start, clen)
                                else (uOff + r.byteStart, r.byteLen))
                            }
                            case None => bad = true
                          }
                        } // bytes None: member over the cap — skipped
                        uOff += ulen
                    }
                  } finally raw.close()
                } else {
                  raw.close()
                  val r = PathIO.openRange(path, conf)
                  try {
                    Warc.recordIndexSeekable(r) match {
                      case Some(rs) =>
                        rs.foreach { rec =>
                          if (rec.byteLen <= maxRecordBytes) {
                            val m = r.readFully(rec.byteStart,
                              rec.byteLen.toInt)
                            // re-index the slice so offsets address m
                            Warc.recordIndex(m) match {
                              case Some(one) => one.foreach(rr =>
                                emitFor(m, rr,
                                  (rec.byteStart, rec.byteLen)))
                              case None => bad = true
                            }
                          }
                        }
                        true
                      case None => false
                    }
                  } finally r.close()
                }
              if (!walked || bad) None
              else Some((
                Warc.gzipPerRecord(
                  warcinfo(filename, "wet", d, software) +: wets.toSeq),
                Warc.gzipPerRecord(
                  warcinfo(filename, "wat", d, software) +: wats.toSeq),
                wets.length + 1, wats.length + 1))
            } catch { case scala.util.control.NonFatal(_) => None }
          built match {
            case Some((wet, wat, nWet, nWat)) =>
              SidecarShard(id, filename, wet, wat, nWet, nWat, ok = true)
            case None => SidecarShard(id, filename, Array.empty[Byte],
              Array.empty[Byte], 0, 0, ok = false)
          }
        }
      }
  }
}
