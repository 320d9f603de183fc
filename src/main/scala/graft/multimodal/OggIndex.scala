package graft.multimodal

/** Ogg container PAGE indexing (RFC 3533, public spec) — the open
  * audio corpora shape: Opus and Vorbis ship in Ogg pages, and the
  * page IS Ogg's seek unit (granule positions live per page; packet
  * boundaries inside are lacing arithmetic). One linear walk emits
  * per-page byte ranges + the header facts an audio pipeline needs
  * without decode — granule position (for Opus: the 48 kHz PCM
  * sample count, so duration analytics are arithmetic over the
  * index), completed-packet counts, and the BOS/EOS/continued flags
  * — completing the audio face of the external-decoder seam beside
  * [[Mp3Frames]].
  *
  * Strictness (the family's sniff contract, here unusually strong):
  * the first page must carry the BOS flag; pages must tile the
  * stream EXACTLY; version must be 0; and every page's CRC-32
  * (polynomial 0x04C11DB7, unreflected, zero init/xorout, computed
  * with the CRC field zeroed — RFC 3533 §6) must VALIDATE, so junk
  * or a corrupted page can essentially never false-positive or
  * half-parse. Multiplexed physical streams (multiple serials) walk
  * fine; page sequence numbers must increase per serial.
  */
object OggIndex {

  /** One indexed page: full-page byte span (header included — the
    * unit a decoder seam fetches), granule position, serial,
    * completed-packet count (lacing values < 255), and flags. */
  final case class OggPage(pageIdx: Int, byteStart: Int, byteLen: Int,
      granule: Long, serial: Long, packetsCompleted: Int,
      isBos: Boolean, isEos: Boolean, isContinued: Boolean)

  /** Unreflected CRC-32 table, poly 0x04C11DB7 — shared with
    * [[MpegTs]] (the MPEG-PSI CRC uses the same table; only the
    * register init differs, which lives in each crc routine). */
  private[multimodal] val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  /** RFC 3533 §6 page CRC over [off, off+len) with the 4 bytes at
    * `crcAt` treated as zero. */
  private[multimodal] def pageCrc(b: Array[Byte], off: Int, len: Int,
      crcAt: Int): Int = {
    var crc = 0
    var i = off
    val end = off + len
    while (i < end) {
      val v = if (i >= crcAt && i < crcAt + 4) 0 else b(i) & 0xff
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ v) & 0xff)
      i += 1
    }
    crc
  }

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def u64le(b: Array[Byte], i: Int): Long =
    u32le(b, i) | (u32le(b, i + 4) << 32)

  /** The page index. None unless the bytes are a well-formed Ogg
    * stream: BOS first, exact tiling, version 0, every CRC green,
    * per-serial page sequences increasing.
    */
  def pageIndex(b: Array[Byte]): Option[IndexedSeq[OggPage]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[OggPage]
    val lastSeq = scala.collection.mutable.Map.empty[Long, Long]
    var i = 0
    while (i < b.length) {
      if (i + 27 > b.length) return None
      if (!(b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' &&
          b(i + 3) == 'S')) return None
      if (b(i + 4) != 0) return None // stream_structure_version
      val flags = b(i + 5) & 0xff
      if ((flags & 0xf8) != 0) return None // reserved bits must be 0
      val granule = u64le(b, i + 6)
      val serial = u32le(b, i + 14)
      val seq = u32le(b, i + 18)
      val nSegs = b(i + 26) & 0xff
      if (i + 27 + nSegs > b.length) return None
      var dataLen = 0
      var completed = 0
      var s = 0
      while (s < nSegs) {
        val v = b(i + 27 + s) & 0xff
        dataLen += v
        if (v < 255) completed += 1
        s += 1
      }
      val pageLen = 27 + nSegs + dataLen
      if (i + pageLen > b.length) return None
      if (pageCrc(b, i, pageLen, crcAt = i + 22) !=
          u32le(b, i + 22).toInt) return None
      val isBos = (flags & 0x02) != 0
      if (out.isEmpty && !isBos) return None // a stream STARTS with BOS
      lastSeq.get(serial) match {
        case Some(prev) if seq <= prev => return None
        case _ =>
      }
      lastSeq(serial) = seq
      out += OggPage(out.length, i, pageLen, granule, serial, completed,
        isBos, (flags & 0x04) != 0, (flags & 0x01) != 0)
      i += pageLen
    }
    if (out.isEmpty) None else Some(out.toIndexedSeq)
  }

  /** The first `maxPackets` assembled PACKETS of the first logical
    * stream (the BOS page's serial): lacing values concatenate
    * segments, a value < 255 completes a packet, continuation runs
    * across pages (RFC 3533 §5). The stream must pass [[pageIndex]]
    * whole first — this is a header-packet reader (codec id +
    * comment headers live in packets 1-2), not a media demuxer.
    */
  def firstPackets(b: Array[Byte], maxPackets: Int)
      : Option[IndexedSeq[Array[Byte]]] = {
    val pages = pageIndex(b).getOrElse(return None)
    val serial = pages.head.serial
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val cur = new java.io.ByteArrayOutputStream()
    pages.iterator.filter(_.serial == serial).foreach { p =>
      val nSegs = b(p.byteStart + 26) & 0xff
      var dataOff = p.byteStart + 27 + nSegs
      var s = 0
      while (s < nSegs) {
        val v = b(p.byteStart + 27 + s) & 0xff
        cur.write(b, dataOff, v)
        dataOff += v
        if (v < 255) {
          out += cur.toByteArray
          cur.reset()
          if (out.size >= maxPackets) return Some(out.toIndexedSeq)
        }
        s += 1
      }
    }
    Some(out.toIndexedSeq)
  }

  /** One indexed page with 64-bit byte addressing — the seekable
    * path's twin of [[OggPage]] for >2 GiB streams. */
  final case class OggPageLong(pageIdx: Int, byteStart: Long, byteLen: Long,
      granule: Long, serial: Long, packetsCompleted: Int,
      isBos: Boolean, isEos: Boolean, isContinued: Boolean)

  /** Seekable Ogg page indexing for >2 GiB audio (long Opus/Vorbis
    * captures): page headers + lacing tables (27 + ≤255 bytes) are
    * read by seek. With `validateCrc` (the default — the same
    * contract as [[pageIndex]]) each page's payload is ALSO read, in
    * one bounded ≤65 KB chunk, because Ogg's CRC covers the whole
    * page; the stream is never materialized whole. `validateCrc =
    * false` skips payloads entirely (header-only I/O — the trusted-
    * corpus fast path; the structural checks below still hold).
    * Strictness otherwise identical to [[pageIndex]]: BOS first,
    * version 0, reserved flag bits clear, exact tiling to the file
    * end, per-serial sequence numbers increasing.
    */
  def pageIndexSeekable(r: Mp4Index.RangeReader,
      validateCrc: Boolean = true): Option[IndexedSeq[OggPageLong]] = {
    val total = r.length
    val out = scala.collection.mutable.ArrayBuffer.empty[OggPageLong]
    val lastSeq = scala.collection.mutable.Map.empty[Long, Long]
    var i = 0L
    while (i < total) {
      if (i + 27 > total) return None
      val h = r.readFully(i, 27)
      if (!(h(0) == 'O' && h(1) == 'g' && h(2) == 'g' && h(3) == 'S'))
        return None
      if (h(4) != 0) return None
      val flags = h(5) & 0xff
      if ((flags & 0xf8) != 0) return None
      val granule = u64le(h, 6)
      val serial = u32le(h, 14)
      val seq = u32le(h, 18)
      val nSegs = h(26) & 0xff
      if (i + 27 + nSegs > total) return None
      val lacing = if (nSegs > 0) r.readFully(i + 27, nSegs)
        else Array.empty[Byte]
      var dataLen = 0
      var completed = 0
      var s = 0
      while (s < nSegs) {
        val v = lacing(s) & 0xff
        dataLen += v
        if (v < 255) completed += 1
        s += 1
      }
      val pageLen = 27 + nSegs + dataLen
      if (i + pageLen > total) return None
      if (validateCrc) {
        // only the payload tail is a NEW read — the header and lacing
        // bytes are already in hand (a remote RangeReader should not
        // pay a second request for ranges it just fetched)
        val tail = if (dataLen > 0) r.readFully(i + 27 + nSegs, dataLen)
          else Array.empty[Byte]
        val page = h ++ lacing ++ tail
        if (pageCrc(page, 0, pageLen, crcAt = 22) != u32le(page, 22).toInt)
          return None
      }
      val isBos = (flags & 0x02) != 0
      if (out.isEmpty && !isBos) return None
      lastSeq.get(serial) match {
        case Some(prev) if seq <= prev => return None
        case _ =>
      }
      lastSeq(serial) = seq
      out += OggPageLong(out.length, i, pageLen, granule, serial,
        completed, isBos, (flags & 0x04) != 0, (flags & 0x01) != 0)
      i += pageLen
    }
    if (out.isEmpty) None else Some(out.toIndexedSeq)
  }

  /** Synthetic Ogg stream for specs/oracles: one page per entry of
    * `pages` = (packets, granule, bos, eos); packets lace as 255-runs
    * + terminator (a packet of an exact 255 multiple gets its 0
    * terminator per the spec). Serial is fixed, sequence numbers run
    * 0..n-1, CRCs computed for real.
    */
  def encodeSynthetic(
      pages: Seq[(Seq[Array[Byte]], Long, Boolean, Boolean)],
      serial: Long = 0x1234L): Array[Byte] = {
    require(pages.nonEmpty)
    val out = new java.io.ByteArrayOutputStream()
    pages.zipWithIndex.foreach { case ((packets, granule, bos, eos), pi) =>
      val lacing = packets.flatMap { p =>
        val full = p.length / 255
        Seq.fill(full)(255) :+ (p.length % 255)
      }
      require(lacing.size <= 255, "spec encoder keeps one lacing table")
      val hdr = new Array[Byte](27 + lacing.size)
      "OggS".getBytes("ISO-8859-1").copyToArray(hdr, 0)
      hdr(4) = 0
      hdr(5) = (((if (bos) 2 else 0) | (if (eos) 4 else 0))).toByte
      (0 until 8).foreach(j => hdr(6 + j) = ((granule >> (8 * j)) & 0xff).toByte)
      (0 until 4).foreach(j => hdr(14 + j) = ((serial >> (8 * j)) & 0xff).toByte)
      (0 until 4).foreach(j => hdr(18 + j) = ((pi.toLong >> (8 * j)) & 0xff).toByte)
      hdr(26) = lacing.size.toByte
      lacing.zipWithIndex.foreach { case (v, j) => hdr(27 + j) = v.toByte }
      val page = hdr ++ packets.toArray.flatten
      val crc = pageCrc(page, 0, page.length, crcAt = 22)
      (0 until 4).foreach(j => page(22 + j) = ((crc >> (8 * j)) & 0xff).toByte)
      out.write(page)
    }
    out.toByteArray
  }
}
