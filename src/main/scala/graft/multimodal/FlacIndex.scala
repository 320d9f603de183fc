package graft.multimodal

/** FLAC FRAME INDEXING (RFC 9639 / xiph FLAC format, public spec) —
  * the lossless-audio face of the external-decoder seam beside
  * [[Mp3Frames]], [[AdtsAac]] and [[OggIndex]]: archival audio
  * corpora ship as FLAC, and a 100 TB corpus needs per-frame byte
  * ranges + PCM facts (block sample counts, rate, channels, bit
  * depth) WITHOUT an in-JVM decoder, so stride sampling fetches only
  * chosen ranges and duration analytics are arithmetic over the
  * index.
  *
  * FLAC is the family's hard case: the frame header does NOT carry
  * the frame length (RFC 9639 §9.1 — frames end where the next one
  * begins). The walk exploits the format's own integrity chain
  * instead: each header ends in a CRC-8 (poly 0x07, init 0) over its
  * own bytes (§9.1.8), and each frame ends in a big-endian CRC-16
  * (poly 0x8005, init 0) over the WHOLE frame (§9.3), so a byte
  * position `q` terminates the frame started at `p` iff the running
  * CRC-16 over [p, q) is zero (the append-your-own-CRC fixed point)
  * AND `q` is the stream end or parses as a CRC-8-valid next header.
  * A false boundary needs a zero CRC-16 prefix AND a CRC-8-valid
  * header at the same offset (~2⁻²⁴ per byte pair) — and even then
  * the walk only misplaces one boundary, never fabricates a stream.
  *
  * Strictness (the family's sniff contract): the `fLaC` magic, a
  * STREAMINFO first metadata block (type 0, length 34 — §8.2),
  * well-formed metadata tiling, and ≥1 CRC-valid frame tiling the
  * rest of the stream exactly. Reserved codes (block size 0, rate 15,
  * sample size 3, channel ≥ 11, non-zero mandatory bits) refuse, as
  * the spec demands of a strict reader. Every count is
  * bounds-checked; corrupt bytes yield None, never an exception.
  */
object FlacIndex {

  /** One indexed frame: byte range + the PCM facts a pipeline needs
    * without decoding. */
  final case class FlacSpan(frameIdx: Int, byteStart: Int, byteLen: Int,
      blockSamples: Int, sampleRateHz: Int, channels: Int,
      bitsPerSample: Int)

  /** STREAMINFO facts (§8.2) + where the frames start. */
  final case class StreamInfo(sampleRateHz: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long, framesStart: Int)

  private val Crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i
      var j = 0
      while (j < 8) { r = if ((r & 0x80) != 0) ((r << 1) ^ 0x07) & 0xff else (r << 1) & 0xff; j += 1 }
      t(i) = r; i += 1
    }
    t
  }
  private val Crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 8
      var j = 0
      while (j < 8) { r = if ((r & 0x8000) != 0) ((r << 1) ^ 0x8005) & 0xffff else (r << 1) & 0xffff; j += 1 }
      t(i) = r; i += 1
    }
    t
  }

  private[multimodal] def crc8(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0; var i = off
    while (i < off + len) { c = Crc8Table(c ^ (b(i) & 0xff)); i += 1 }
    c
  }

  // sample-rate codes 1..11 (§9.1.3); 0 = streaminfo, 12-14 in-header,
  // 15 forbidden
  private val Rates = Array(0, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000)
  // sample-size codes (§9.1.5); 0 = streaminfo, 3 reserved
  private val Bits = Array(0, 8, 12, -1, 16, 20, 24, 32)

  /** Parse the stream head: magic + metadata blocks, STREAMINFO
    * first. Returns None unless well-formed. */
  def streamInfo(b: Array[Byte]): Option[StreamInfo] = {
    if (b.length < 4 + 4 + 34) return None
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'))
      return None
    // STREAMINFO must be the first block: type 0, length 34 (§8.2)
    val h0 = b(4) & 0xff
    if ((h0 & 0x7f) != 0) return None
    val l0 = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    if (l0 != 34) return None
    val si = 8
    val sampleRate = ((b(si + 10) & 0xff) << 12) |
      ((b(si + 11) & 0xff) << 4) | ((b(si + 12) & 0xff) >> 4)
    val channels = (((b(si + 12) & 0xff) >> 1) & 0x07) + 1
    val bps = (((b(si + 12) & 0x01) << 4) | ((b(si + 13) & 0xff) >> 4)) + 1
    val total = ((b(si + 13) & 0x0fL) << 32) | ((b(si + 14) & 0xffL) << 24) |
      ((b(si + 15) & 0xffL) << 16) | ((b(si + 16) & 0xffL) << 8) |
      (b(si + 17) & 0xffL)
    if (sampleRate == 0) return None // §8.2: 0 is invalid for audio
    // walk the remaining metadata blocks
    var last = (h0 & 0x80) != 0
    var i = si + 34
    while (!last) {
      if (i + 4 > b.length) return None
      val h = b(i) & 0xff
      if ((h & 0x7f) == 127) return None // forbidden block type (§8.1)
      val len = ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) |
        (b(i + 3) & 0xff)
      last = (h & 0x80) != 0
      if (i + 4L + len > b.length) return None
      i += 4 + len
    }
    Some(StreamInfo(sampleRate, channels, bps, total, i))
  }

  /** Parse one frame header at `i` (§9.1): returns (headerLen,
    * blockSamples, rateHz, channels, bps) with the CRC-8 validated,
    * or None. `si` resolves the from-streaminfo codes.
    */
  private def header(b: Array[Byte], i: Int, si: StreamInfo)
      : Option[(Int, Int, Int, Int, Int)] = {
    if (i + 5 > b.length) return None
    val b0 = b(i) & 0xff; val b1 = b(i + 1) & 0xff
    // 15-bit sync 0b111111111111100 + mandatory-0 bit (§9.1.1-9.1.2):
    // RFC 9639 fixed the second sync byte to 0xF8 | blocking-strategy
    if (b0 != 0xff || (b1 & 0xfe) != 0xf8) return None
    val b2 = b(i + 2) & 0xff
    val bsCode = (b2 >> 4) & 0x0f
    val srCode = b2 & 0x0f
    if (bsCode == 0 || srCode == 15) return None // reserved/forbidden
    val b3 = b(i + 3) & 0xff
    val chCode = (b3 >> 4) & 0x0f
    val bpsCode = (b3 >> 1) & 0x07
    if ((b3 & 0x01) != 0) return None // mandatory 0 (§9.1.6)
    if (chCode > 10 || bpsCode == 3) return None
    val channels = if (chCode <= 7) chCode + 1 else 2
    val bps = if (bpsCode == 0) si.bitsPerSample else Bits(bpsCode)
    // coded number (§9.1.7): UTF-8-style, ≤6 bytes for frame numbers,
    // ≤7 for sample numbers (blocking strategy 1)
    val maxCoded = if ((b1 & 0x01) == 1) 7 else 6
    var p = i + 4
    val lead = b(p) & 0xff
    val extra =
      if ((lead & 0x80) == 0) 0
      else if ((lead & 0xe0) == 0xc0) 1
      else if ((lead & 0xf0) == 0xe0) 2
      else if ((lead & 0xf8) == 0xf0) 3
      else if ((lead & 0xfc) == 0xf8) 4
      else if ((lead & 0xfe) == 0xfc) 5
      else if (lead == 0xfe) 6
      else return None
    if (extra + 1 > maxCoded) return None
    if (p + 1 + extra > b.length) return None
    var k = 0
    while (k < extra) {
      if ((b(p + 1 + k) & 0xc0) != 0x80) return None
      k += 1
    }
    p += 1 + extra
    // uncommon block size / sample rate ride the header end (§9.1.3-4)
    val blockSamples = bsCode match {
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 =>
        if (p + 1 > b.length) return None
        val v = (b(p) & 0xff) + 1; p += 1; v
      case 7 =>
        if (p + 2 > b.length) return None
        val v = (((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)) + 1; p += 2; v
      case c => 256 << (c - 8)
    }
    val rate = srCode match {
      case 0 => si.sampleRateHz
      case 12 =>
        if (p + 1 > b.length) return None
        val v = (b(p) & 0xff) * 1000; p += 1; v
      case 13 =>
        if (p + 2 > b.length) return None
        val v = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff); p += 2; v
      case 14 =>
        if (p + 2 > b.length) return None
        val v = (((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)) * 10; p += 2; v
      case c => Rates(c)
    }
    if (p + 1 > b.length) return None
    if (crc8(b, i, p - i) != (b(p) & 0xff)) return None // §9.1.8
    Some((p + 1 - i, blockSamples, rate, channels, bps))
  }

  /** The frame index. None unless the head parses ([[streamInfo]])
    * and ≥1 CRC-valid frame tiles the remainder exactly. */
  def frameIndex(b: Array[Byte]): Option[IndexedSeq[FlacSpan]] = {
    val si = streamInfo(b).getOrElse(return None)
    val out = scala.collection.mutable.ArrayBuffer.empty[FlacSpan]
    var p = si.framesStart
    while (p < b.length) {
      val (hdrLen, bs, rate, ch, bps) = header(b, p, si)
        .getOrElse(return None)
      // scan for the frame end: running CRC-16 over [p, q) hits the
      // append-your-own-CRC zero exactly at the footer boundary
      var crc = 0
      var q = p
      val minEnd = p + hdrLen + 2 // header + 2-byte footer minimum
      var end = -1
      while (end < 0 && q < b.length) {
        crc = ((crc << 8) ^ Crc16Table(((crc >>> 8) ^ (b(q) & 0xff)) & 0xff)) & 0xffff
        q += 1
        if (q >= minEnd && crc == 0 &&
            (q == b.length || header(b, q, si).isDefined))
          end = q
      }
      if (end < 0) return None
      out += FlacSpan(out.length, p, end - p, bs, rate, ch, bps)
      p = end
    }
    if (out.nonEmpty) Some(out.toIndexedSeq) else None
  }

  /** Synthetic FLAC stream for specs/oracles: a real STREAMINFO (+
    * optional padding block), then one frame per `frames` entry of
    * (blockSamples, payloadLen) — block size coded via the 8/16-bit
    * uncommon path, rate/size/channels from the streaminfo codes,
    * frame numbers as 1-byte coded numbers, CRC-8/CRC-16 computed for
    * real. Payload bytes avoid 0xFF so no false sync can precede a
    * boundary.
    */
  def encodeSynthetic(frames: Seq[(Int, Int)], sampleRate: Int = 44100,
      channels: Int = 2, bps: Int = 16, paddingLen: Int = -1,
      comments: Seq[(String, String)] = Nil): Array[Byte] = {
    require(frames.nonEmpty && frames.size <= 128)
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("ISO-8859-1"))
    val lastHead = if (paddingLen >= 0 || comments.nonEmpty) 0x00 else 0x80
    out.write(lastHead); out.write(0); out.write(0); out.write(34)
    val siBody = new Array[Byte](34)
    siBody(0) = 0x10; siBody(1) = 0 // min block size 4096
    siBody(2) = 0x10; siBody(3) = 0
    siBody(10) = ((sampleRate >> 12) & 0xff).toByte
    siBody(11) = ((sampleRate >> 4) & 0xff).toByte
    siBody(12) = (((sampleRate & 0x0f) << 4) | ((channels - 1) << 1) |
      ((bps - 1) >> 4)).toByte
    siBody(13) = (((bps - 1) & 0x0f) << 4).toByte
    out.write(siBody)
    if (comments.nonEmpty) {
      val cb = new java.io.ByteArrayOutputStream()
      val vendor = "graft synthetic".getBytes("UTF-8")
      def le32(v: Int): Unit =
        (0 until 4).foreach(j => cb.write((v >> (8 * j)) & 0xff))
      le32(vendor.length); cb.write(vendor)
      le32(comments.size)
      comments.foreach { case (k, v) =>
        val kv = s"$k=$v".getBytes("UTF-8")
        le32(kv.length); cb.write(kv)
      }
      val body = cb.toByteArray
      out.write(if (paddingLen >= 0) 0x04 else 0x84)
      out.write((body.length >> 16) & 0xff)
      out.write((body.length >> 8) & 0xff); out.write(body.length & 0xff)
      out.write(body)
    }
    if (paddingLen >= 0) {
      out.write(0x81); out.write((paddingLen >> 16) & 0xff)
      out.write((paddingLen >> 8) & 0xff); out.write(paddingLen & 0xff)
      out.write(new Array[Byte](paddingLen))
    }
    frames.zipWithIndex.foreach { case ((blockSamples, payload), fi) =>
      val hdr = new java.io.ByteArrayOutputStream()
      hdr.write(0xff); hdr.write(0xf8) // fixed blocking strategy
      val wide = blockSamples > 256
      hdr.write(((if (wide) 7 else 6) << 4) | 0x00) // rate from streaminfo
      hdr.write(0x00) // mono-coded? no: channel code 0 = 1ch... use real
      val h = hdr.toByteArray
      // rewrite byte 3: channel code (channels-1 for 1..8), bps code 0
      h(3) = (((channels - 1) << 4) | 0x00).toByte
      val tail = new java.io.ByteArrayOutputStream()
      tail.write(fi) // coded frame number, 1 byte for < 128
      if (wide) {
        tail.write(((blockSamples - 1) >> 8) & 0xff)
        tail.write((blockSamples - 1) & 0xff)
      } else tail.write((blockSamples - 1) & 0xff)
      val head = h ++ tail.toByteArray
      val c8 = crc8(head, 0, head.length)
      val body = new Array[Byte](payload)
      java.util.Arrays.fill(body, ((0x20 + fi) & 0x7f).toByte)
      val noCrc = head ++ Array(c8.toByte) ++ body
      var c16 = 0
      noCrc.foreach { x =>
        c16 = ((c16 << 8) ^ Crc16Table(((c16 >>> 8) ^ (x & 0xff)) & 0xff)) & 0xffff
      }
      out.write(noCrc)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
    }
    out.toByteArray
  }
}
