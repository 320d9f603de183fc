package graft.multimodal

import H264AnnexB.{FrameSpan, Nal}

/** H.264/AVC LENGTH-PREFIXED ("AVCC") stream indexing — the framing
  * real corpora actually carry: MP4/MOV/MKV store H.264 samples as
  * `lengthSizeMinusOne+1`-byte big-endian length prefixes per NAL
  * (no start codes), with the parameter sets out-of-band in an
  * `AVCDecoderConfigurationRecord` (ISO/IEC 14496-15 §5.2.4.1 /
  * §5.3.3.1, public spec). This walks that framing and reuses
  * [[H264AnnexB]]'s access-unit grouping — NAL payloads are EBSPs in
  * BOTH containers (emulation prevention applies to the bytes, not
  * the framing), so the same exp-Golomb `first_mb_in_slice` read
  * applies unchanged.
  *
  * Accepted layout: the avcC configuration record followed by the
  * length-prefixed NAL stream — the natural dump of an `avc1` sample
  * entry plus its samples. Frame spans cover the SAMPLE bytes only
  * (the config is out-of-band by design: a decoder seam needs it for
  * EVERY frame, so it re-reads the record from [[Config.headerLen]]
  * bytes at the asset head rather than having it folded into frame
  * 0's range, unlike Annex-B where SPS/PPS ride inline in the
  * stream).
  *
  * Parsing is STRICT — version byte, reserved-bit layout, in-bounds
  * parameter-set lists, and a NAL walk that terminates EXACTLY at the
  * stream end — because [[Multimodal.sampleH264Frames]] tries this
  * container first: an Annex-B stream (or junk) must fail here
  * loudly-by-None, never half-parse. (The reverse order would be
  * unsafe: a 4-byte length prefix 0x000001xx is byte-identical to an
  * Annex-B start code, so Annex-B sniffing can false-positive on
  * AVCC bytes; strict AVCC sniffing cannot false-positive on Annex-B,
  * whose first byte 0x00 fails the version check.)
  */
object H264Avcc {

  /** Parsed AVCDecoderConfigurationRecord header: NAL length-prefix
    * size in bytes (1/2/4) and the record's total length (= offset of
    * the first length-prefixed NAL). `altHeaderLen` is the OTHER
    * plausible record end when the profile makes the High-profile
    * extension ambiguous: the spec appends chroma/bit-depth/SPS-ext
    * fields for profile_idc 100/110/122/144, but real muxers
    * sometimes omit them — [[frameIndex]] tries `headerLen` first and
    * falls back, letting the exact-walk termination disambiguate.
    */
  final case class Config(lengthSize: Int, headerLen: Int,
      altHeaderLen: Option[Int] = None)

  private val HighProfiles = Set(100, 110, 122, 144)

  /** Strict avcC parse (§5.2.4.1): configurationVersion == 1,
    * lengthSizeMinusOne from the low 2 bits of byte 4, then the SPS
    * and PPS lists (5-bit count + 16-bit-length-prefixed sets), then
    * — for High-family profile_idc — the chroma_format/bit-depth/
    * SPS-ext extension (reserved bits validated). None on any
    * malformed/out-of-bounds structure.
    */
  def parseConfig(bytes: Array[Byte]): Option[Config] = {
    if (bytes.length < 7 || bytes(0) != 1) return None
    val profile = bytes(1) & 0xff
    val lengthSize = (bytes(4) & 0x03) + 1
    if (lengthSize == 3) return None // lengthSizeMinusOne == 2 is reserved
    var off = 5
    def takeSets(count: Int): Boolean = {
      var c = count
      while (c > 0) {
        if (off + 2 > bytes.length) return false
        val l = ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
        off += 2 + l
        if (off > bytes.length || l == 0) return false
        c -= 1
      }
      true
    }
    val numSps = bytes(off) & 0x1f
    off += 1
    if (numSps == 0 || !takeSets(numSps)) return None
    if (off >= bytes.length) return None
    val numPps = bytes(off) & 0xff
    off += 1
    if (numPps == 0 || !takeSets(numPps)) return None
    val afterPps = off
    if (!HighProfiles(profile)) return Some(Config(lengthSize, afterPps))
    // High-family: the spec appends reserved('111111')+chroma_format,
    // reserved('11111')+bit_depth_luma, reserved('11111')+
    // bit_depth_chroma, numOfSequenceParameterSetExt + ext sets.
    // Parse strictly; when absent (lenient muxers), the extension-less
    // end is the primary and no alternative exists.
    val ext: Option[Int] =
      if (afterPps + 4 <= bytes.length &&
          (bytes(afterPps) & 0xfc) == 0xfc &&
          (bytes(afterPps + 1) & 0xf8) == 0xf8 &&
          (bytes(afterPps + 2) & 0xf8) == 0xf8) {
        off = afterPps + 3
        val numExt = bytes(off) & 0xff
        off += 1
        if (numExt == 0 || takeSets(numExt)) Some(off) else None
      } else None
    ext match {
      case Some(e) => Some(Config(lengthSize, e, Some(afterPps)))
      case None => Some(Config(lengthSize, afterPps))
    }
  }

  /** Length-prefixed NAL walk from `start`: each unit is a
    * `lengthSize`-byte big-endian length + payload. None unless the
    * walk covers [start, bytes.length) EXACTLY with ≥1 nonempty NAL —
    * the strictness the container sniff relies on.
    */
  def nalUnits(bytes: Array[Byte], start: Int,
      lengthSize: Int): Option[IndexedSeq[Nal]] = {
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Nal]
    var i = start
    while (i < n) {
      if (i + lengthSize > n) return None
      var len = 0L
      var j = 0
      while (j < lengthSize) {
        len = (len << 8) | (bytes(i + j) & 0xff)
        j += 1
      }
      if (len <= 0 || i + lengthSize + len > n) return None
      val off = i + lengthSize
      out += Nal(off, len.toInt, bytes(off) & 0x1f)
      i = off + len.toInt
    }
    if (out.isEmpty) None else Some(out.toIndexedSeq)
  }

  /** The frame index of an avcC-record + length-prefixed stream:
    * [[H264AnnexB.accessUnitSpans]] over the AVCC NAL walk. Spans
    * partition the sample bytes (config excluded, see object doc).
    * None when the bytes aren't this container or hold no
    * frame-starting slice.
    */
  def frameIndex(bytes: Array[Byte]): Option[IndexedSeq[FrameSpan]] =
    parseConfig(bytes).flatMap { cfg =>
      def walk(headerLen: Int): Option[IndexedSeq[FrameSpan]] =
        nalUnits(bytes, headerLen, cfg.lengthSize).flatMap { nals =>
          H264AnnexB.accessUnitSpans(bytes, nals,
            ni => nals(ni).offset - cfg.lengthSize,
            spanStart = headerLen, spanEnd = bytes.length)
        }
      walk(cfg.headerLen)
        .orElse(cfg.altHeaderLen.flatMap(walk))
    }

  /** Synthetic avcC + length-prefixed stream for specs — the same
    * frame structure [[H264AnnexB.encodeSynthetic]] emits (SPS/PPS in
    * the config record instead of inline), so the two containers'
    * indexes are directly comparable in tests.
    */
  def encodeSynthetic(isIdrPerFrame: Seq[Boolean], extraSlices: Int = 0,
      lengthSize: Int = 4, profile: Int = 0x42): Array[Byte] = {
    require(Set(1, 2, 4)(lengthSize), s"bad lengthSize $lengthSize")
    val out = new java.io.ByteArrayOutputStream()
    val sps = Array[Byte](0x67, 0x42, 0x00, 0x1e)
    val pps = Array[Byte](0x68, 0x3c, 0x70)
    // AVCDecoderConfigurationRecord
    out.write(1)                       // configurationVersion
    out.write(profile); out.write(0x00); out.write(0x1e) // profile/compat/lvl
    out.write(0xfc | (lengthSize - 1)) // reserved ++ lengthSizeMinusOne
    out.write(0xe0 | 1)                // reserved ++ numOfSPS
    out.write(sps.length >> 8); out.write(sps.length & 0xff); out.write(sps)
    out.write(1)                       // numOfPPS
    out.write(pps.length >> 8); out.write(pps.length & 0xff); out.write(pps)
    if (HighProfiles(profile)) {
      // High-family extension: chroma 4:2:0, 8-bit depths, one SPS-ext
      out.write(0xfc | 1)              // reserved ++ chroma_format_idc
      out.write(0xf8 | 0)              // reserved ++ bit_depth_luma - 8
      out.write(0xf8 | 0)              // reserved ++ bit_depth_chroma - 8
      out.write(1)                     // numOfSequenceParameterSetExt
      out.write(0); out.write(2)       // ext length 2
      out.write(0x6d); out.write(0x33) // SPS-ext NAL (type 13) + junk
    }
    def nal(header: Int, payload: Array[Byte]): Unit = {
      val len = 1 + payload.length
      var j = lengthSize - 1
      while (j >= 0) { out.write((len >> (8 * j)) & 0xff); j -= 1 }
      out.write(header)
      out.write(payload)
    }
    isIdrPerFrame.zipWithIndex.foreach { case (idr, fi) =>
      val header = if (idr) 0x65 else 0x41 // ref_idc=3, type 5/1
      // first_mb_in_slice = 0 → ue(0) = '1' → MSB set
      nal(header, Array[Byte](0x80.toByte, (0x10 + fi).toByte))
      // continuation slices: first_mb_in_slice = 1 → ue(1) = '010'
      (0 until extraSlices).foreach { si =>
        nal(header, Array[Byte](0x40, (0x20 + si).toByte))
      }
    }
    out.toByteArray
  }
}
