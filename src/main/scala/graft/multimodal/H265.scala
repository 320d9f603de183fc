package graft.multimodal

import H264AnnexB.{FrameSpan, Nal}

/** HEVC (H.265) frame indexing — ITU-T H.265 (public spec) for the
  * NAL/slice layer, ISO/IEC 14496-15 §8.3.3.1 for the `hvcC`
  * configuration record. Modern video corpora are increasingly HEVC;
  * this gives them the same external-decoder-seam access pattern as
  * the H.264 family: a linear one-pass frame (access-unit) index with
  * seekable-keyframe flags, over BOTH mainstream framings —
  *
  *  - Annex-B byte streams (start codes, parameter sets inline), and
  *  - hvcC-record + length-prefixed samples (the MP4/MKV dump shape,
  *    the HEVC twin of [[H264Avcc]]).
  *
  * HEVC makes AU detection SIMPLER than H.264: the 2-byte NAL header
  * (forbidden_zero(1), nal_unit_type(6), nuh_layer_id(6),
  * nuh_temporal_id_plus1(3), §7.3.1.2) is followed in every VCL NAL
  * by `first_slice_segment_in_pic_flag` as the FIRST slice-header bit
  * (§7.3.6.1) — no exp-Golomb read needed (emulation-prevention bytes
  * cannot precede the first payload bit). A set flag starts a new
  * access unit; non-VCL prefix NALs (VPS/SPS/PPS/AUD/prefix-SEI)
  * attach to the FOLLOWING AU so a frame's span carries the parameter
  * sets a decoder needs to start there; suffix NALs (EOS/EOB/FD/
  * suffix-SEI) stay with the AU they follow. `isIdr` = the AU holds
  * an IRAP NAL (types 16–23: BLA/IDR/CRA — the seekable ones).
  *
  * Sniff contracts (who can impersonate whom): every NAL must carry a
  * valid header — forbidden_zero_bit clear AND temporal_id_plus1
  * nonzero — or the WHOLE stream refuses. An H.264 Annex-B stream
  * fails that wholesale (its slice payloads start 0x80 → tid+1 = 0),
  * and the reverse false-positive cannot happen either (H.265 slice
  * types 0–21 map to even first bytes whose H.264 type field is never
  * 1/5); [[Multimodal.sampleH264Frames]] still tries H.264 walks
  * FIRST so the ordering never depends on payload luck. The hvcC
  * parse validates the record's fixed reserved-bit layout (six
  * distinct positions) and requires the sample walk to tile the
  * remaining bytes EXACTLY — an avcC record or junk refuses here.
  */
object H265 {

  /** IRAP NAL types (§7.4.2.2): BLA 16–18, IDR 19–20, CRA 21, and the
    * reserved IRAP range 22–23 — a decoder can start at any of them. */
  private def isIrap(t: Int): Boolean = t >= 16 && t <= 23
  private def isVcl(t: Int): Boolean = t <= 31
  /** Non-VCL types that PREFIX the next AU (parameter sets, AU
    * delimiter, prefix SEI). */
  private def isPrefix(t: Int): Boolean =
    t == 32 || t == 33 || t == 34 || t == 35 || t == 39

  val Vps = 32
  val Sps = 33
  val Pps = 34

  /** Re-type a NAL walk's units with the HEVC 2-byte header rules.
    * None when ANY unit violates the header layout (forbidden bit set,
    * temporal_id_plus1 zero, or a body too short for the header) —
    * the stream-wide strictness the sniff relies on. */
  private def retype(bytes: Array[Byte],
      nals: IndexedSeq[Nal]): Option[IndexedSeq[Nal]] = {
    val out = new Array[Nal](nals.length)
    var i = 0
    while (i < nals.length) {
      val n = nals(i)
      if (n.len < 2) return None
      val b0 = bytes(n.offset) & 0xff
      val b1 = bytes(n.offset + 1) & 0xff
      if ((b0 & 0x80) != 0 || (b1 & 0x07) == 0) return None
      out(i) = n.copy(nalType = (b0 >> 1) & 0x3f)
      i += 1
    }
    Some(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  }

  /** `first_slice_segment_in_pic_flag` — the first bit after the
    * 2-byte NAL header (§7.3.6.1). */
  private def firstSliceFlag(bytes: Array[Byte], nal: Nal): Boolean =
    nal.len >= 3 && (bytes(nal.offset + 2) & 0x80) != 0

  /** The HEVC access-unit grouping (the [[H264AnnexB.accessUnitSpans]]
    * seam with H.265 rules): a VCL NAL with the first-slice flag set
    * starts an AU; prefix non-VCL NALs seen after the previous AU's
    * slices belong to the NEXT AU; suffix non-VCL NALs stay interior.
    */
  private def accessUnitSpans(bytes: Array[Byte], nals: IndexedSeq[Nal],
      boundaryOf: Int => Int, spanStart: Int,
      spanEnd: Int): Option[IndexedSeq[FrameSpan]] = {
    val auStarts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var seenSlice = false
    var prefixStart = -1
    var i = 0
    while (i < nals.length) {
      val nal = nals(i)
      if (isVcl(nal.nalType)) {
        if (firstSliceFlag(bytes, nal)) {
          auStarts += (if (!seenSlice) -1 // 1st AU owns the stream head
            else if (prefixStart >= 0) prefixStart
            else i)
          seenSlice = true
        }
        prefixStart = -1 // continuation slice: interior, not prefix
      } else if (isPrefix(nal.nalType)) {
        if (seenSlice && prefixStart < 0) prefixStart = i
      } else prefixStart = -1 // suffix NAL: stays with the current AU
      i += 1
    }
    if (auStarts.isEmpty) return None
    Some(auStarts.toIndexedSeq.zipWithIndex.map { case (startNal, fi) =>
      val s = if (fi == 0) spanStart else boundaryOf(startNal)
      val e = if (fi + 1 < auStarts.length) boundaryOf(auStarts(fi + 1))
        else spanEnd
      val endNal = if (fi + 1 < auStarts.length) auStarts(fi + 1)
        else nals.length
      val isIdr = (math.max(0, startNal) until endNal)
        .exists(j => isIrap(nals(j).nalType))
      FrameSpan(fi, s, e - s, isIdr)
    })
  }

  /** Annex-B HEVC frame index: start-code walk (shared with H.264 —
    * emulation prevention is identical), HEVC re-typing, AU grouping.
    * None when the bytes aren't a valid HEVC Annex-B stream.
    */
  def frameIndexAnnexB(bytes: Array[Byte]): Option[IndexedSeq[FrameSpan]] =
    H264AnnexB.nalUnits(bytes).flatMap(retype(bytes, _)).flatMap { nals =>
      def startCodeOf(ni: Int): Int = {
        var s = nals(ni).offset - 3
        if (s > 0 && bytes(s - 1) == 0) s -= 1
        math.max(0, s)
      }
      accessUnitSpans(bytes, nals, startCodeOf, spanStart = 0,
        spanEnd = bytes.length)
    }

  /** Parsed HEVCDecoderConfigurationRecord header: NAL length-prefix
    * size (1/2/4) and the record's total length (= offset of the
    * first length-prefixed sample NAL). */
  final case class Config(lengthSize: Int, headerLen: Int)

  /** Strict hvcC parse (ISO 14496-15 §8.3.3.1.2): 23 fixed bytes with
    * six validated reserved-bit positions, then `numOfArrays`
    * parameter-set arrays (type byte with reserved bit clear, 16-bit
    * count, 16-bit-length-prefixed NALs). None on any malformed or
    * out-of-bounds structure — junk and avcC records refuse here.
    */
  def parseConfig(bytes: Array[Byte]): Option[Config] = {
    if (bytes.length < 23 || bytes(0) != 1) return None
    if ((bytes(13) & 0xf0) != 0xf0) return None // '1111' + min_spatial
    if ((bytes(15) & 0xfc) != 0xfc) return None // '111111' + parallelism
    if ((bytes(16) & 0xfc) != 0xfc) return None // '111111' + chroma
    if ((bytes(17) & 0xf8) != 0xf8) return None // '11111' + depth_luma
    if ((bytes(18) & 0xf8) != 0xf8) return None // '11111' + depth_chroma
    val lengthSize = (bytes(21) & 0x03) + 1
    if (lengthSize == 3) return None // lengthSizeMinusOne == 2 reserved
    val numArrays = bytes(22) & 0xff
    if (numArrays == 0) return None
    var off = 23
    var sawParamSet = false
    var a = 0
    while (a < numArrays) {
      if (off + 3 > bytes.length) return None
      val head = bytes(off) & 0xff
      if ((head & 0x40) != 0) return None // reserved bit must be 0
      val nalType = head & 0x3f
      if (nalType == Vps || nalType == Sps || nalType == Pps)
        sawParamSet = true
      val numNalus = ((bytes(off + 1) & 0xff) << 8) | (bytes(off + 2) & 0xff)
      off += 3
      var i = 0
      while (i < numNalus) {
        if (off + 2 > bytes.length) return None
        val l = ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
        off += 2 + l
        if (l == 0 || off > bytes.length) return None
        i += 1
      }
      a += 1
    }
    if (!sawParamSet) return None // a real hvcC always carries VPS/SPS/PPS
    Some(Config(lengthSize, off))
  }

  /** Frame index of an hvcC-record + length-prefixed sample stream
    * (the HEVC twin of [[H264Avcc.frameIndex]]): the length walk must
    * tile [headerLen, end) exactly, every NAL must carry a valid HEVC
    * header, and spans cover the SAMPLE bytes only (parameter sets
    * are out-of-band in the record, re-read by the decoder seam).
    */
  def frameIndexHvcc(bytes: Array[Byte]): Option[IndexedSeq[FrameSpan]] =
    parseConfig(bytes).flatMap { cfg =>
      H264Avcc.nalUnits(bytes, cfg.headerLen, cfg.lengthSize)
        .flatMap(retype(bytes, _))
        .flatMap { nals =>
          accessUnitSpans(bytes, nals,
            ni => nals(ni).offset - cfg.lengthSize,
            spanStart = cfg.headerLen, spanEnd = bytes.length)
        }
    }

  // ---- synthetic encoders for specs/oracles (structure-exact; the
  // payloads are junk — the index reads only headers + the first
  // slice-header bit, which is exactly what these pin) ----

  private def nalBytes(nalType: Int, payload: Array[Byte]): Array[Byte] =
    Array[Byte](((nalType << 1) & 0x7e).toByte, 0x01.toByte) ++ payload

  /** Synthetic Annex-B HEVC stream: VPS+SPS+PPS (2-byte payloads, 8 B
    * per NAL with the 4-byte start code), then per frame one primary
    * slice (first-slice bit SET) + `extraSlices` continuation slices
    * (bit CLEAR — must not split the frame). IDR frames use
    * IDR_W_RADL (19), others TRAIL_R (1).
    */
  def encodeSynthetic(isIdrPerFrame: Seq[Boolean],
      extraSlices: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def nal(nalType: Int, payload: Array[Byte]): Unit = {
      out.write(Array[Byte](0, 0, 0, 1))
      out.write(nalBytes(nalType, payload))
    }
    nal(Vps, Array[Byte](0x0c, 0x01))
    nal(Sps, Array[Byte](0x42, 0x01))
    nal(Pps, Array[Byte](0x44, 0x01))
    isIdrPerFrame.zipWithIndex.foreach { case (idr, fi) =>
      val t = if (idr) 19 else 1
      nal(t, Array[Byte](0x80.toByte, (0x10 + fi).toByte)) // first-slice bit set
      (0 until extraSlices).foreach { si =>
        nal(t, Array[Byte](0x40, (0x20 + si).toByte)) // continuation
      }
    }
    out.toByteArray
  }

  /** Synthetic hvcC record + length-prefixed stream — same frame
    * structure as [[encodeSynthetic]] with the parameter sets in the
    * record's three arrays (VPS/SPS/PPS, one 4-byte NAL each: the
    * record is exactly 23 + 3×9 = 50 bytes).
    */
  def encodeSyntheticHvcc(isIdrPerFrame: Seq[Boolean],
      extraSlices: Int = 0, lengthSize: Int = 4): Array[Byte] = {
    require(Set(1, 2, 4)(lengthSize), s"bad lengthSize $lengthSize")
    val out = new java.io.ByteArrayOutputStream()
    out.write(1)                          // configurationVersion
    out.write(0x01)                       // space/tier/profile_idc (Main)
    out.write(Array[Byte](0x60, 0, 0, 0)) // profile_compatibility_flags
    out.write(new Array[Byte](6))         // constraint_indicator_flags
    out.write(0x5d)                       // general_level_idc
    out.write(0xf0); out.write(0x00)      // reserved + min_spatial_seg
    out.write(0xfc)                       // reserved + parallelismType
    out.write(0xfc | 1)                   // reserved + chromaFormat 4:2:0
    out.write(0xf8)                       // reserved + bitDepthLumaMinus8
    out.write(0xf8)                       // reserved + bitDepthChromaMinus8
    out.write(0); out.write(0)            // avgFrameRate
    out.write(0x0c | (lengthSize - 1))    // cfr/layers/nested + lenSizeM1
    out.write(3)                          // numOfArrays
    def array(nalType: Int, payload: Array[Byte]): Unit = {
      out.write(0x80 | nalType)           // completeness=1, reserved=0
      out.write(0); out.write(1)          // numNalus = 1
      val nb = nalBytes(nalType, payload)
      out.write(nb.length >> 8); out.write(nb.length & 0xff)
      out.write(nb)
    }
    array(Vps, Array[Byte](0x0c, 0x01))
    array(Sps, Array[Byte](0x42, 0x01))
    array(Pps, Array[Byte](0x44, 0x01))
    def nal(nalType: Int, payload: Array[Byte]): Unit = {
      val nb = nalBytes(nalType, payload)
      var j = lengthSize - 1
      while (j >= 0) { out.write((nb.length >> (8 * j)) & 0xff); j -= 1 }
      out.write(nb)
    }
    isIdrPerFrame.zipWithIndex.foreach { case (idr, fi) =>
      val t = if (idr) 19 else 1
      nal(t, Array[Byte](0x80.toByte, (0x10 + fi).toByte))
      (0 until extraSlices).foreach { si =>
        nal(t, Array[Byte](0x40, (0x20 + si).toByte))
      }
    }
    out.toByteArray
  }
}
