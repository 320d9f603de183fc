package graft.io

/** ZIP CENTRAL-DIRECTORY INDEXING (PKWARE APPNOTE, public spec) —
  * member byte spans WITHOUT extraction: document corpora ship as
  * zips (and DOCX/EPUB ARE zips), and the central directory at the
  * file END makes ZIP the family's most seek-friendly container — a
  * 10 GB archive indexes from its EOCD + central directory + one
  * 30-byte local-header read per member, never touching data.
  *
  * Walk: scan the tail for the EOCD signature (PK\05\06 — the
  * comment makes it float up to 64 KiB from the end), honoring the
  * ZIP64 EOCD locator/record (PK\06\07 / PK\06\06) when the 16/32-
  * bit fields saturate; read the central directory; per entry
  * (PK\01\02) take method/sizes/CRC/name (ZIP64 extra field 0x0001
  * overriding saturated fields in spec order), then read the LOCAL
  * header (PK\03\04) for its own name/extra lengths — they may
  * differ from the directory's — to place the data span.
  *
  * Strictness: signatures at every level, entry count and directory
  * size consistent, every span bounds-checked. Corrupt bytes yield
  * None, never an exception.
  */
object ZipIndex {

  /** One member: name, method (0 stored / 8 deflate), the COMPRESSED
    * data span (the fetch unit), uncompressed size and CRC-32. */
  final case class ZipEntry(entryIdx: Int, name: String, method: Int,
      dataStart: Long, compLen: Long, uncompLen: Long, crc32: Long)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def u64(b: Array[Byte], i: Int): Long =
    u32(b, i) | (u32(b, i + 4) << 32)

  private val Utf8Cs = java.nio.charset.StandardCharsets.UTF_8
  private val Cp437: java.nio.charset.Charset =
    try java.nio.charset.Charset.forName("IBM437")
    catch { case scala.util.control.NonFatal(_) =>
      java.nio.charset.StandardCharsets.ISO_8859_1 }

  /** The member index over a seekable source — THE implementation
    * (byte columns wrap [[graft.multimodal.Mp4Index.BytesRangeReader]]).
    */
  def entryIndexSeekable(r: graft.multimodal.Mp4Index.RangeReader,
      maxCdBytes: Int = 1 << 28): Option[IndexedSeq[ZipEntry]] = {
    val total = r.length
    if (total < 22) return None
    // EOCD: scan back through the largest legal comment
    val tailLen = math.min(total, 22L + 0xffff).toInt
    val tail = r.readFully(total - tailLen, tailLen)
    var e = -1
    var i = tailLen - 22
    while (e < 0 && i >= 0) {
      if (tail(i) == 'P' && tail(i + 1) == 'K' && tail(i + 2) == 5 &&
          tail(i + 3) == 6 &&
          // the comment must run exactly to EOF — else this is data
          // that happens to spell the signature
          u16(tail, i + 20) == tailLen - (i + 22)) e = i
      else i -= 1
    }
    if (e < 0) return None
    var nEntries = u16(tail, e + 10).toLong
    var cdSize = u32(tail, e + 12)
    var cdOff = u32(tail, e + 16)
    val eocdAbs = total - tailLen + e
    if (nEntries == 0xffffL || cdSize == 0xffffffffL ||
        cdOff == 0xffffffffL) {
      // ZIP64: the locator sits directly before the EOCD. A
      // saturated field WITHOUT a locator is also legal (an archive
      // of exactly 65535 members stores the count literally) — fall
      // back to the EOCD values then, like java.util.zip does.
      val loc = if (eocdAbs >= 20) r.readFully(eocdAbs - 20, 20)
        else Array.empty[Byte]
      if (loc.length == 20 && loc(0) == 'P' && loc(1) == 'K' &&
          loc(2) == 6 && loc(3) == 7) {
        val e64At = u64(loc, 8)
        // subtraction-form bounds: additions can wrap a crafted
        // 0x7fff… offset negative and slip past a sum-side check
        if (e64At < 0 || e64At > total - 56) return None
        val e64 = r.readFully(e64At, 56)
        if (!(e64(0) == 'P' && e64(1) == 'K' && e64(2) == 6 &&
          e64(3) == 6)) return None
        nEntries = u64(e64, 32)
        cdSize = u64(e64, 40)
        cdOff = u64(e64, 48)
      } else if (cdSize == 0xffffffffL || cdOff == 0xffffffffL) {
        return None // directory truly unaddressable without ZIP64
      }
    }
    if (cdSize < 0 || cdSize > maxCdBytes || cdOff < 0 ||
        cdOff > total - cdSize || nEntries < 0 ||
        nEntries > cdSize / 46 + 1) return None
    val cd = r.readFully(cdOff, cdSize.toInt)
    val out = scala.collection.mutable.ArrayBuffer.empty[ZipEntry]
    var p = 0
    var k = 0L
    while (k < nEntries) {
      if (p + 46 > cd.length) return None
      if (!(cd(p) == 'P' && cd(p + 1) == 'K' && cd(p + 2) == 1 &&
        cd(p + 3) == 2)) return None
      val flags = u16(cd, p + 8)
      val method = u16(cd, p + 10)
      val crc = u32(cd, p + 16)
      var compLen = u32(cd, p + 20)
      var uncompLen = u32(cd, p + 24)
      val nameLen = u16(cd, p + 28)
      val extraLen = u16(cd, p + 30)
      val commentLen = u16(cd, p + 32)
      var localOff = u32(cd, p + 42)
      if (p + 46 + nameLen + extraLen + commentLen > cd.length)
        return None
      // general-purpose bit 11 (EFS) = UTF-8 names; without it the
      // APPNOTE says IBM CP437 — decoding a legacy archive's
      // high-byte name as UTF-8 would mangle it to U+FFFD
      val name = new String(cd, p + 46, nameLen,
        if ((flags & 0x0800) != 0) Utf8Cs else Cp437)
      // ZIP64 extra field 0x0001: values replace saturated fields in
      // spec order (uncomp, comp, localOff)
      var x = p + 46 + nameLen
      val xEnd = x + extraLen
      while (x + 4 <= xEnd) {
        val id = u16(cd, x)
        val sz = u16(cd, x + 2)
        if (x + 4 + sz > xEnd) return None
        if (id == 0x0001) {
          var q = x + 4
          if (uncompLen == 0xffffffffL) {
            if (q + 8 > x + 4 + sz) return None
            uncompLen = u64(cd, q); q += 8
          }
          if (compLen == 0xffffffffL) {
            if (q + 8 > x + 4 + sz) return None
            compLen = u64(cd, q); q += 8
          }
          if (localOff == 0xffffffffL) {
            if (q + 8 > x + 4 + sz) return None
            localOff = u64(cd, q); q += 8
          }
        }
        x += 4 + sz
      }
      if (localOff < 0 || localOff > total - 30) return None
      val lh = r.readFully(localOff, 30)
      if (!(lh(0) == 'P' && lh(1) == 'K' && lh(2) == 3 && lh(3) == 4))
        return None
      val dataStart = localOff + 30 + u16(lh, 26) + u16(lh, 28)
      if (compLen < 0 || uncompLen < 0 || dataStart > total ||
          compLen > total - dataStart) return None
      out += ZipEntry(out.length, name, method, dataStart, compLen,
        uncompLen, crc)
      p += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    if (out.isEmpty) None else Some(out.toIndexedSeq)
  }

  /** The member index of a byte-column archive. */
  def entryIndex(b: Array[Byte]): Option[IndexedSeq[ZipEntry]] =
    entryIndexSeekable(new graft.multimodal.Mp4Index.BytesRangeReader(b))

  /** Inflate one member's data span (method 8 raw-deflate, method 0
    * verbatim); None on other methods, inflate failure, or output
    * past `maxBytes`. */
  private[io] def inflateMember(b: Array[Byte], z: ZipEntry,
      maxBytes: Int): Option[Array[Byte]] = z.method match {
    case 0 =>
      if (z.compLen > maxBytes) None
      else Some(java.util.Arrays.copyOfRange(b, z.dataStart.toInt,
        (z.dataStart + z.compLen).toInt))
    case 8 =>
      // a ZIP64-overridden uncompLen can be any u64 bit pattern — a
      // NEGATIVE Long would sail past a (> maxBytes) check and size
      // an array from its truncated low bits (or OOM fatally)
      if (z.uncompLen < 0 || z.uncompLen > maxBytes) return None
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(b, z.dataStart.toInt, z.compLen.toInt)
        val out = new Array[Byte](z.uncompLen.toInt)
        var got = 0
        while (got < out.length && !inf.finished()) {
          val n = inf.inflate(out, got, out.length - got)
          if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
            return None
          got += n
        }
        if (got == out.length) Some(out) else None
      } catch { case scala.util.control.NonFatal(_) => None }
      finally inf.end()
    case _ => None
  }

  /** One extracted document member: the books/documents twin of
    * [[Warc.extractHtmlPages]] — EPUBs ARE zips of XHTML, so
    * zip → HTML members → [[graft.text.HtmlText]] is the
    * book-corpus-to-training-text path. `extracted = false` flags
    * non-ZIP assets. */
  final case class ZipDoc(asset_id: Long, entry_idx: Int, name: String,
      title: String, text: String, n_chars: Int, extracted: Boolean)

  // the Warc.declaredCharset body-prefix posture for zip members: a
  // legacy-encoded (e.g. windows-1251) EPUB chapter decoded as UTF-8
  // unconditionally turns every non-ASCII character into U+FFFD.
  // Members have no HTTP head, so the declarations that exist are the
  // <meta charset=…> tag (Warc.metaCharsetIn — the SAME probe the
  // WARC path uses, so the two cannot drift) and the XML prolog's
  // encoding=… (the usual EPUB XHTML shape); probe the first KB.
  private val XmlEncodingRe =
    "(?s)<\\?xml[^>]*encoding\\s*=\\s*[\"']?([a-z0-9_\\-]+)".r

  private[io] def memberCharset(data: Array[Byte])
      : java.nio.charset.Charset = {
    val probe = new String(data, 0, math.min(1024, data.length),
      "ISO-8859-1").toLowerCase(java.util.Locale.ROOT)
    Warc.metaCharsetIn(probe)
      .orElse(XmlEncodingRe.findFirstMatchIn(probe).map(_.group(1))
        .flatMap(Warc.resolveCharset))
      .getOrElse(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The zip-of-documents front door: index → members whose names
    * end `.xhtml/.html/.htm` → inflate (bounded per member) →
    * [[graft.text.HtmlText]] title+text extraction. One call takes
    * an EPUB (or any HTML-carrying archive) to text rows the
    * quality/dedup/langid operators consume. Members decode with
    * their DECLARED charset ([[memberCharset]]: meta tag or XML
    * prolog in the first KB), falling back to UTF-8. */
  def extractHtmlMembers(df: org.apache.spark.sql.DataFrame,
      idCol: String, bytesCol: String, maxMemberBytes: Int = 1 << 26)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[ZipDoc] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val indexed =
            try Option(bytes).flatMap(entryIndex)
            catch { case scala.util.control.NonFatal(_) => None }
          indexed match {
            case Some(es) =>
              es.iterator
                .filter { z =>
                  val n = z.name.toLowerCase(java.util.Locale.ROOT)
                  n.endsWith(".xhtml") || n.endsWith(".html") ||
                    n.endsWith(".htm")
                }
                .flatMap { z =>
                  inflateMember(bytes, z, maxMemberBytes).map { data =>
                    val html = new String(data, memberCharset(data))
                    val text = graft.text.HtmlText.extract(html)
                    ZipDoc(id, z.entryIdx, z.name,
                      graft.text.HtmlText.title(html).getOrElse(""),
                      text, text.length, extracted = true)
                  }
                }
            case None =>
              Iterator.single(ZipDoc(id, -1, "", "", "", 0,
                extracted = false))
          }
        }
      }
  }

  /** One member row; `indexed = false` flags non-ZIP assets. */
  final case class ZipRow(asset_id: Long, entry_idx: Int, name: String,
      method: Int, data_start: Long, comp_len: Long, uncomp_len: Long,
      indexed: Boolean)

  /** Member indexing over a (id, bytes) corpus. mapPartitions,
    * flagged fallback. */
  def extractEntries(df: org.apache.spark.sql.DataFrame, idCol: String,
      bytesCol: String)(implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[ZipRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val indexed =
            try Option(bytes).flatMap(entryIndex)
            catch { case scala.util.control.NonFatal(_) => None }
          indexed match {
            case Some(es) => es.iterator.map(z =>
              ZipRow(id, z.entryIdx, z.name, z.method, z.dataStart,
                z.compLen, z.uncompLen, indexed = true))
            case None =>
              Iterator.single(ZipRow(id, -1, "", -1, 0L, 0L, 0L,
                indexed = false))
          }
        }
      }
  }
}
