package graft.multimodal

/** MEDIA TAG EXTRACTION (ID3v2.3/2.4 text frames and Vorbis comments
  * in FLAC — both public formats: id3.org informal standard, RFC
  * 9639 §8.6 / the Xiph VorbisComment spec) — the curation-metadata
  * face of an audio corpus: title/artist/album/language tags drive
  * dedup keys, source attribution and split stratification, and they
  * ride the first kilobytes of the file, so extraction is
  * header-only like the rest of the seam.
  *
  *  - ID3v2: "ID3" + version + synchsafe tag size, then frames of
  *    [id(4), size(4 — PLAIN u32 in v2.3, synchsafe in v2.4),
  *    flags(2), payload]. Text frames (id `T...`) carry an encoding
  *    byte — 0 ISO-8859-1, 1 UTF-16 with BOM, 2 UTF-16BE, 3 UTF-8 —
  *    then the value (TXXX: description NUL value). Padding (a zero
  *    id byte) ends the walk.
  *  - FLAC VORBIS_COMMENT (block type 4): LE u32 vendor length +
  *    vendor, LE u32 count, then per comment LE u32 length +
  *    `KEY=value` (key case-insensitive ASCII — uppercased here for
  *    a canonical join key; value UTF-8).
  *
  * Strictness: headers validated, every length bounds-checked before
  * any allocation, malformed frames/comments refuse the whole tag
  * (None — a flagged row, not a half-parse); unsupported frame
  * flags (compression/encryption) skip the frame, not the tag.
  */
object MediaTags {

  /** One tag: canonical key (frame id or uppercased comment key) and
    * decoded text value. */
  final case class Tag(key: String, value: String)

  private def synchsafe(b: Array[Byte], i: Int): Int =
    ((b(i) & 0x7f) << 21) | ((b(i + 1) & 0x7f) << 14) |
      ((b(i + 2) & 0x7f) << 7) | (b(i + 3) & 0x7f)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Decode an ID3v2 text payload: encoding byte + text, NUL
    * terminators preserved (TXXX splits on one; plain text frames
    * strip them at the call site). None for an unknown encoding. */
  private def decodeText(b: Array[Byte], off: Int, len: Int)
      : Option[String] = {
    if (len < 1) return Some("")
    val enc = b(off) & 0xff
    val cs = enc match {
      case 0 => "ISO-8859-1"
      case 1 => "UTF-16"   // BOM-led per the spec
      case 2 => "UTF-16BE"
      case 3 => "UTF-8"
      case _ => return None
    }
    Some(new String(b, off + 1, len - 1, cs))
  }

  /** The ID3v2 text frames of an MP3/AAC asset. None when no valid
    * ID3v2 header opens the bytes or a frame is malformed. */
  def id3v2Tags(b: Array[Byte]): Option[IndexedSeq[Tag]] = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3')
      return None
    val ver = b(3) & 0xff
    if (ver != 3 && ver != 4) return None // 2.2 (3-byte ids) unsupported
    val hdrFlags = b(5) & 0xff
    // tag-level unsynchronisation re-writes every frame size — a walk
    // ignoring it would misalign silently; refuse to a flagged row
    if ((hdrFlags & 0x80) != 0) return None
    if (((b(6) | b(7) | b(8) | b(9)) & 0x80) != 0) return None
    val tagEnd = math.min(10L + synchsafe(b, 6), b.length.toLong).toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[Tag]
    var i = 10
    if ((hdrFlags & 0x40) != 0) {
      // extended header: v2.3 size EXCLUDES its own 4 size bytes
      // (plain u32); v2.4 size INCLUDES itself (synchsafe, ≥ 6)
      if (i + 4 > tagEnd) return None
      val ext =
        if (ver == 4) synchsafe(b, i).toLong else 4L + u32be(b, i)
      if (ver == 4 && ext < 6) return None
      if (ext < 0 || ext > tagEnd - i) return None
      i += ext.toInt
    }
    var done = false
    while (!done && i + 10 <= tagEnd) {
      if (b(i) == 0) done = true // padding
      else {
        val id = new String(b, i, 4, "ISO-8859-1")
        if (!id.forall(c => c.isUpper || c.isDigit)) return None
        val size = (if (ver == 4) synchsafe(b, i + 4).toLong
          else u32be(b, i + 4))
        if (size < 0 || size > tagEnd - (i + 10)) return None
        val flags2 = b(i + 9) & 0xff
        // compression/encryption/unsynchronised payloads: skip frame
        val skip = (flags2 & 0x0e) != 0 || (ver == 3 && (flags2 & 0xc0) != 0)
        if (!skip && id.startsWith("T") && size >= 1) {
          val raw = decodeText(b, i + 10, size.toInt)
            .getOrElse(return None)
          if (id == "TXXX") {
            // encoding + description NUL value → key TXXX:description
            val cut = raw.indexOf('\u0000')
            if (cut < 0) return None
            out += Tag("TXXX:" + raw.substring(0, cut),
              raw.substring(cut + 1).replace("\u0000", ""))
          } else {
            out += Tag(id, raw.replace("\u0000", ""))
          }
        }
        i += 10 + size.toInt
      }
    }
    Some(out.toIndexedSeq)
  }

  /** The shared Vorbis-comment structure (Xiph spec, used verbatim
    * by FLAC blocks and Ogg Opus/Vorbis comment headers): LE vendor
    * length + vendor, LE count, per comment LE length + `KEY=value`.
    * Parses [off, end); trailing bytes after the last comment are
    * the caller's business (Vorbis appends a framing bit). */
  private def vorbisComments(b: Array[Byte], off: Int, end: Int)
      : Option[IndexedSeq[Tag]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Tag]
    var p = off
    if (p + 4 > end) return None
    val vlen = u32le(b, p)
    if (vlen < 0 || vlen > end - (p + 4)) return None
    p += 4 + vlen.toInt
    if (p + 4 > end) return None
    val n = u32le(b, p)
    p += 4
    var k = 0L
    while (k < n) {
      if (p + 4 > end) return None
      val clen = u32le(b, p)
      if (clen < 0 || clen > end - (p + 4)) return None
      val s = new String(b, p + 4, clen.toInt, "UTF-8")
      val eq = s.indexOf('=')
      if (eq <= 0) return None
      out += Tag(s.substring(0, eq).toUpperCase(java.util.Locale.ROOT),
        s.substring(eq + 1))
      p += 4 + clen.toInt
      k += 1
    }
    Some(out.toIndexedSeq)
  }

  /** The Vorbis comments of a FLAC asset (block type 4). None when
    * the stream head is not FLAC ([[FlacIndex.streamInfo]] contract)
    * or the comment block is malformed; a FLAC without the block
    * yields an empty list. */
  def flacTags(b: Array[Byte]): Option[IndexedSeq[Tag]] = {
    if (FlacIndex.streamInfo(b).isEmpty) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Tag]
    // re-walk metadata blocks for type 4 (streamInfo validated tiling)
    var i = 4
    var last = false
    while (!last && i + 4 <= b.length) {
      val h = b(i) & 0xff
      last = (h & 0x80) != 0
      val len = ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) |
        (b(i + 3) & 0xff)
      if ((h & 0x7f) == 4)
        out ++= vorbisComments(b, i + 4, i + 4 + len)
          .getOrElse(return None)
      i += 4 + len
    }
    Some(out.toIndexedSeq)
  }

  /** The comment tags of an Ogg Opus/Vorbis stream: packet 2 of the
    * first logical stream is `OpusTags` (RFC 7845 §5.2) or
    * `\x03vorbis` (Vorbis I §5), both wrapping the same
    * Vorbis-comment structure. None when the bytes are not a
    * CRC-valid Ogg stream ([[OggIndex.pageIndex]] contract) or the
    * comment header is malformed; an Ogg whose second packet is no
    * known comment header yields an empty list (data streams exist).
    */
  def oggTags(b: Array[Byte]): Option[IndexedSeq[Tag]] = {
    val packets = OggIndex.firstPackets(b, 2).getOrElse(return None)
    if (packets.size < 2) return Some(Vector.empty)
    val p2 = packets(1)
    def lead(m: String): Boolean =
      p2.length >= m.length &&
        m.getBytes("ISO-8859-1").zipWithIndex.forall {
          case (c, i) => p2(i) == c
        }
    if (lead("OpusTags"))
      vorbisComments(p2, 8, p2.length)
    else if (p2.length >= 7 && (p2(0) & 0xff) == 0x03 && lead2(p2))
      // \x03vorbis …comments… + framing bit (ignored as trailing)
      vorbisComments(p2, 7, p2.length)
    else Some(Vector.empty)
  }
  private def lead2(p2: Array[Byte]): Boolean =
    "vorbis".getBytes("ISO-8859-1").zipWithIndex.forall {
      case (c, i) => p2(i + 1) == c
    }

  /** Tags of an audio asset, dispatching by container: ID3v2 for
    * MP3/ADTS shapes, Vorbis comments for FLAC, Opus/Vorbis comment
    * headers for Ogg. None when no parser accepts the bytes. */
  def tags(b: Array[Byte]): Option[(String, IndexedSeq[Tag])] =
    id3v2Tags(b).map(("id3", _))
      .orElse(flacTags(b).map(("flac", _)))
      .orElse(oggTags(b).map(("ogg", _)))

  /** Synthetic Ogg Opus stream with an OpusTags comment header for
    * specs/oracles: OpusHead BOS page, OpusTags page (vendor +
    * comments), one audio page — the RFC 7845 layout. */
  def encodeOpusStream(comments: Seq[(String, String)],
      vendor: String = "libopus 1.3"): Array[Byte] = {
    val head = "OpusHead".getBytes("ISO-8859-1") ++
      Array[Byte](1, 2, 0x38, 1) ++ // ver 1, 2ch, pre-skip 312
      Array[Byte](0x80.toByte, 0xbb.toByte, 0, 0, 0, 0, 0) // 48k,gain,map
    val tags = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("OpusTags".getBytes("ISO-8859-1"))
      def le32(v: Int): Unit =
        (0 until 4).foreach(j => out.write((v >> (8 * j)) & 0xff))
      val vb = vendor.getBytes("UTF-8")
      le32(vb.length); out.write(vb)
      le32(comments.size)
      comments.foreach { case (k, v) =>
        val kv = s"$k=$v".getBytes("UTF-8")
        le32(kv.length); out.write(kv)
      }
      out.toByteArray
    }
    OggIndex.encodeSynthetic(Seq(
      (Seq(head), 0L, true, false),
      (Seq(tags), 0L, false, false),
      (Seq(Array.fill[Byte](20)(0x11)), 960L, false, true)))
  }

  /** Synthetic ID3v2 tag + minimal MP3 body for specs/oracles:
    * `frames` gives (id, value, encodingByte); v2.3 or v2.4 sizing.
    */
  def encodeId3(frames: Seq[(String, String, Int)], v4: Boolean = false,
      padding: Int = 0): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    frames.foreach { case (id, value, enc) =>
      require(id.length == 4)
      val cs = enc match {
        case 0 => "ISO-8859-1"
        case 1 => "UTF-16"
        case 2 => "UTF-16BE"
        case _ => "UTF-8"
      }
      val vb = value.getBytes(cs)
      body.write(id.getBytes("ISO-8859-1"))
      val size = vb.length + 1
      if (v4) {
        body.write((size >> 21) & 0x7f); body.write((size >> 14) & 0x7f)
        body.write((size >> 7) & 0x7f); body.write(size & 0x7f)
      } else {
        body.write((size >> 24) & 0xff); body.write((size >> 16) & 0xff)
        body.write((size >> 8) & 0xff); body.write(size & 0xff)
      }
      body.write(0); body.write(0)
      body.write(enc)
      body.write(vb)
    }
    body.write(new Array[Byte](padding))
    val bb = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(if (v4) 4 else 3); out.write(0); out.write(0)
    out.write((bb.length >> 21) & 0x7f); out.write((bb.length >> 14) & 0x7f)
    out.write((bb.length >> 7) & 0x7f); out.write(bb.length & 0x7f)
    out.write(bb)
    // a real Layer-III body after the tag so container walks also work
    out.write(Mp3Frames.encodeSynthetic(Seq((9, 0), (9, 0))))
    out.toByteArray
  }
}
