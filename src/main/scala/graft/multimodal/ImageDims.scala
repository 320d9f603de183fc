package graft.multimodal

/** HEADER-ONLY IMAGE DIMENSIONS (PNG/JPEG/GIF/BMP/WebP, public
  * formats) — the decode-free image metadata path: filtering a
  * 100 TB image corpus by resolution/aspect must not pay a full
  * pixel decode per asset (ImageIO inflates the whole bitmap), and
  * must work for images larger than memory. Every mainstream format
  * states its dimensions in the first few hundred bytes:
  *
  *  - PNG: the IHDR chunk is REQUIRED first (PNG spec §11.2.1) —
  *    width/height are big-endian u32 at bytes 16/20.
  *  - JPEG: marker walk to any SOFn (baseline/progressive/etc.,
  *    excluding DHT/DAC/JPG which share the 0xC class) — height and
  *    width ride the frame header (ITU T.81 §B.2.2). Standalone
  *    markers (RSTn/TEM) and fill bytes are stepped correctly.
  *  - GIF: the logical screen descriptor directly follows the
  *    6-byte version magic — little-endian u16 pair.
  *  - BMP: BITMAPINFOHEADER (≥40 B: s32 pair, height sign =
  *    orientation) and the legacy BITMAPCOREHEADER (12 B: u16 pair).
  *  - WebP: RIFF/WEBP with the first chunk dispatching lossy
  *    (`VP8 `: the keyframe sync 9D 012A then 14-bit LE pair),
  *    lossless (`VP8L`: 0x2F then packed 14-bit minus-one pair) or
  *    extended (`VP8X`: 24-bit LE canvas minus-one pair).
  *
  * Strictness: magic + structural checks per format (a JPEG without
  * a SOF, a PNG whose first chunk is not IHDR, zero dimensions —
  * all None, never an exception). Pixel data is never touched; a
  * task-sized batch of 100-megapixel scans costs the same as
  * thumbnails.
  */
object ImageDims {

  /** Decode-free dimensions + the sniffed container. */
  final case class Dims(format: String, width: Int, height: Int)

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def s32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def png(b: Array[Byte]): Option[Dims] = {
    if (b.length < 24) return None
    val magic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    if (!magic.zipWithIndex.forall { case (m, i) => (b(i) & 0xff) == m })
      return None
    // first chunk must be IHDR (§11.2.1)
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return None
    val w = u32be(b, 16); val h = u32be(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(Dims("png", w.toInt, h.toInt))
  }

  /** The SHARED JPEG marker walk (fill bytes, standalone markers,
    * length-bounds checks — subtle enough that [[jpeg]] and
    * [[jpegOrientation]] must not each carry a drifting copy):
    * segments as (marker, payloadStart, payloadLen), collected up to
    * the first SOS/EOI. None on structural breaks (lost alignment,
    * a length overrunning the stream). */
  private def jpegSegs(b: Array[Byte])
      : Option[IndexedSeq[(Int, Int, Int)]] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None // marker alignment lost
      var m = b(i + 1) & 0xff
      // fill bytes: any number of 0xFF before the marker code
      while (m == 0xff && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xff }
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i += 2 // standalone markers carry no length
      } else if (m == 0xd9 || m == 0xda) {
        return Some(out.toIndexedSeq) // scan data follows — stop here
      } else {
        // the fill-byte loop advanced i: re-check before the length read
        if (i + 4 > b.length) return None
        val segLen = u16be(b, i + 2)
        if (segLen < 2 || i + 2 + segLen > b.length) return None
        out += ((m, i + 4, segLen - 2))
        i += 2 + segLen
      }
    }
    Some(out.toIndexedSeq)
  }

  private def isSofMarker(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  private def jpeg(b: Array[Byte]): Option[Dims] =
    jpegSegs(b).flatMap { segs =>
      segs.find(s => isSofMarker(s._1)).flatMap { case (_, off, len) =>
        if (len < 5) None
        else {
          val h = u16be(b, off + 1); val w = u16be(b, off + 3)
          if (w > 0 && h > 0) Some(Dims("jpeg", w, h)) else None
        }
      }
    }

  private def gif(b: Array[Byte]): Option[Dims] = {
    if (b.length < 10) return None
    val v = new String(b, 0, 6, "ISO-8859-1")
    if (v != "GIF87a" && v != "GIF89a") return None
    val w = u16le(b, 6); val h = u16le(b, 8)
    if (w > 0 && h > 0) Some(Dims("gif", w, h)) else None
  }

  private def bmp(b: Array[Byte]): Option[Dims] = {
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') return None
    val dib = s32le(b, 14)
    if (dib >= 40) {
      val w = s32le(b, 18); val h = s32le(b, 22)
      // negative height = top-down rows (the magnitude is the size)
      if (w > 0 && h != 0 && h != Int.MinValue)
        Some(Dims("bmp", w, math.abs(h)))
      else None
    } else if (dib == 12) { // BITMAPCOREHEADER: u16 pair
      val w = u16le(b, 18); val h = u16le(b, 20)
      if (w > 0 && h > 0) Some(Dims("bmp", w, h)) else None
    } else None
  }

  private def webp(b: Array[Byte]): Option[Dims] = {
    if (b.length < 30) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'))
      return None
    val chunk = new String(b, 12, 4, "ISO-8859-1")
    chunk match {
      case "VP8 " =>
        // lossy keyframe: 3-byte frame tag, sync 9D 01 2A, 14-bit pair
        val p = 20
        if ((b(p + 3) & 0xff) != 0x9d || (b(p + 4) & 0xff) != 0x01 ||
            (b(p + 5) & 0xff) != 0x2a) return None
        val w = u16le(b, p + 6) & 0x3fff
        val h = u16le(b, p + 8) & 0x3fff
        if (w > 0 && h > 0) Some(Dims("webp", w, h)) else None
      case "VP8L" =>
        val p = 20
        if ((b(p) & 0xff) != 0x2f) return None
        val bits = (b(p + 1) & 0xffL) | ((b(p + 2) & 0xffL) << 8) |
          ((b(p + 3) & 0xffL) << 16) | ((b(p + 4) & 0xffL) << 24)
        val w = (bits & 0x3fff).toInt + 1
        val h = ((bits >> 14) & 0x3fff).toInt + 1
        Some(Dims("webp", w, h))
      case "VP8X" =>
        val p = 20
        if (b.length < p + 10) return None
        val w = ((b(p + 4) & 0xff) | ((b(p + 5) & 0xff) << 8) |
          ((b(p + 6) & 0xff) << 16)) + 1
        val h = ((b(p + 7) & 0xff) | ((b(p + 8) & 0xff) << 8) |
          ((b(p + 9) & 0xff) << 16)) + 1
        Some(Dims("webp", w, h))
      case _ => None
    }
  }

  /** ISO-BMFF image brands (HEIF §10 / AVIF spec): the `ftyp` major
    * brands that mean "image item file", not "movie". */
  private val HeifBrands = Set("avif", "avis", "heic", "heix", "mif1",
    "msf1", "heif")

  private def avif(b: Array[Byte]): Option[Dims] = {
    val top = Mp4Index.boxes(b, 0, b.length, topLevel = true)
      .getOrElse(return None)
    if (top.isEmpty || top.head.fourcc != "ftyp") return None
    val ft = top.head
    if (ft.payloadEnd - ft.payloadStart < 4) return None
    val brand = new String(b, ft.payloadStart, 4, "ISO-8859-1")
    if (!HeifBrands(brand)) return None
    val fmt = if (brand.startsWith("av")) "avif" else "heif"
    val meta = top.find(_.fourcc == "meta").getOrElse(return None)
    // meta is a FullBox: 4 version/flags bytes before its children
    if (meta.payloadEnd - meta.payloadStart < 4) return None
    val kids = Mp4Index.boxes(b, meta.payloadStart + 4, meta.payloadEnd)
      .getOrElse(return None)
    val iprp = kids.find(_.fourcc == "iprp").getOrElse(return None)
    val iprpKids = Mp4Index.boxes(b, iprp.payloadStart, iprp.payloadEnd)
      .getOrElse(return None)
    val ipco = iprpKids.find(_.fourcc == "ipco").getOrElse(return None)
    val props = Mp4Index.boxes(b, ipco.payloadStart, ipco.payloadEnd)
      .getOrElse(return None)
    def ispeDims(p: Mp4Index.Box): Option[Dims] = {
      if (p.payloadEnd - p.payloadStart < 12) return None
      val w = u32be(b, p.payloadStart + 4)
      val h = u32be(b, p.payloadStart + 8)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
      else Some(Dims(fmt, w.toInt, h.toInt))
    }
    // resolve the PRIMARY item's ispe via pitm + ipma (a HEIF file
    // carries thumbnail/alpha ispe properties too — "first ispe"
    // would return the wrong canvas on real encoder output)
    val primary: Option[Dims] = {
      val viaPitm = kids.find(_.fourcc == "pitm").flatMap { pitm =>
        val len = pitm.payloadEnd - pitm.payloadStart
        if (len < 6) None
        else {
          val pv = b(pitm.payloadStart) & 0xff
          val itemId: Option[Long] =
            if (pv == 0) Some(((b(pitm.payloadStart + 4) & 0xffL) << 8) |
              (b(pitm.payloadStart + 5) & 0xffL))
            else if (len >= 8) Some(u32be(b, pitm.payloadStart + 4))
            else None
          for {
            id <- itemId
            ipma <- iprpKids.find(_.fourcc == "ipma")
            d <- ipmaLookup(b, ipma, id, props, ispeDims)
          } yield d
        }
      }
      viaPitm
    }
    primary.orElse(
      // no pitm/ipma (minimal muxes): the first ispe property
      props.find(_.fourcc == "ispe").flatMap(ispeDims))
  }

  /** Walk ipma (§9.3.2 of 23008-12): find `itemId`'s association
    * list and return the first associated property that yields
    * dimensions. None on malformed entries. */
  private def ipmaLookup(b: Array[Byte], ipma: Mp4Index.Box,
      itemId: Long, props: IndexedSeq[Mp4Index.Box],
      ispeDims: Mp4Index.Box => Option[Dims]): Option[Dims] = {
    val s = ipma.payloadStart
    if (ipma.payloadEnd - s < 8) return None
    val version = b(s) & 0xff
    val wideIdx = (b(s + 3) & 0x01) != 0 // flags bit 0: 15-bit indices
    val n = u32be(b, s + 4)
    var p = s + 8
    var e = 0L
    while (e < n) {
      val idBytes = if (version < 1) 2 else 4
      if (p + idBytes + 1 > ipma.payloadEnd) return None
      val id = if (version < 1)
        ((b(p) & 0xffL) << 8) | (b(p + 1) & 0xffL)
      else u32be(b, p)
      p += idBytes
      val cnt = b(p) & 0xff
      p += 1
      var a = 0
      var found: Option[Dims] = None
      while (a < cnt) {
        val aBytes = if (wideIdx) 2 else 1
        if (p + aBytes > ipma.payloadEnd) return None
        val idx = if (wideIdx)
          (((b(p) & 0x7f) << 8) | (b(p + 1) & 0xff))
        else b(p) & 0x7f
        p += aBytes
        if (id == itemId && found.isEmpty && idx >= 1 &&
            idx <= props.length && props(idx - 1).fourcc == "ispe")
          found = ispeDims(props(idx - 1))
        a += 1
      }
      if (id == itemId) return found
      e += 1
    }
    None
  }

  /** The dimensions, trying each container's strict parse in turn.
    * None when no format's magic + structure matches. */
  def dims(b: Array[Byte]): Option[Dims] =
    if (b == null || b.length < 10) None
    else png(b).orElse(jpeg(b)).orElse(gif(b)).orElse(bmp(b))
      .orElse(webp(b)).orElse(avif(b))

  /** The EXIF orientation (1–8, TIFF tag 0x0112) of a JPEG — 1
    * ("upright") when absent or unparseable. Orientation matters to
    * the perceptual pipeline: aHash/resize of a camera JPEG stored
    * rotated (orientations 3/6/8 are ubiquitous phone output)
    * fingerprints a sideways image unless the pipeline knows to
    * rotate first. Walk: the APP1 `Exif\0\0` segment → TIFF header
    * (II/MM byte order, magic 42) → IFD0 entries → tag 0x0112's
    * SHORT value. Every offset bounds-checked against the segment.
    */
  def jpegOrientation(b: Array[Byte]): Int = {
    if (b == null) return 1
    val app1 = jpegSegs(b).toSeq.flatten.find { case (m, off, len) =>
      m == 0xe1 && len >= 14 &&
        b(off) == 'E' && b(off + 1) == 'x' && b(off + 2) == 'i' &&
        b(off + 3) == 'f' && b(off + 4) == 0 && b(off + 5) == 0
    }
    app1 match {
      case None => 1
      case Some((_, off, len)) =>
        val t = off + 6 // the TIFF header
        val end = off + len
        val le = b(t) == 'I' && b(t + 1) == 'I'
        val be = b(t) == 'M' && b(t + 1) == 'M'
        if (!le && !be) return 1
        def rd16(o: Int): Int =
          if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
          else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
        def rd32(o: Int): Long =
          if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
            ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
          else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
            ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
        if (t + 8 > end || rd16(t + 2) != 42) return 1
        val ifd0 = rd32(t + 4)
        if (ifd0 < 8 || t + ifd0 + 2 > end) return 1
        val e0 = (t + ifd0).toInt
        val n = rd16(e0)
        var k = 0
        while (k < n) {
          val eo = e0 + 2 + 12 * k
          if (eo + 12 > end) return 1
          if (rd16(eo) == 0x0112 && rd16(eo + 2) == 3) {
            val v = rd16(eo + 8) // SHORT rides the value field head
            return if (v >= 1 && v <= 8) v else 1
          }
          k += 1
        }
        1 // IFD0 carries no orientation
    }
  }
}
