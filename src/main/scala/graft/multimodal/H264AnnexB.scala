package graft.multimodal

/** H.264/AVC Annex-B byte-stream INDEXING (ITU-T H.264 §B.1/§7.3,
  * public spec) — the seek structure of the one mainstream video
  * format this container cannot decode (no JDK H.264 decoder exists;
  * the reference ships no codec either). What a 100 TB video corpus
  * needs from Spark is not in-JVM decoding but the ACCESS PATTERN:
  * which byte ranges are frames, which are IDR (seekable) keyframes,
  * so stride/keyframe sampling fetches only those ranges and hands
  * them to an external decoder behind a UDF seam. This parser
  * provides exactly that — a linear one-pass frame index — plus a
  * synthetic Annex-B encoder so the contract is testable without any
  * codec in the container.
  *
  * Correctness notes:
  *  - Start-code scanning (0x000001 / 0x00000001) is EXACT, not
  *    heuristic: Annex-B emulation prevention (00 00 03 insertion,
  *    §7.4.1.1) guarantees no false start code inside a NAL payload.
  *  - Frame (access-unit) boundaries follow §7.4.1.2.4's primary
  *    rule: a slice NAL (type 1/5) whose `first_mb_in_slice` — the
  *    first exp-Golomb field after the NAL header, read with
  *    emulation-byte removal — is 0 starts a new primary coded
  *    picture. Non-VCL NALs (SPS/PPS/SEI/AUD) attach to the
  *    FOLLOWING frame, so a frame's byte span includes the parameter
  *    sets a decoder needs to start there.
  */
object H264AnnexB {

  val SliceNonIdr = 1
  val SliceIdr = 5
  val Sei = 6
  val Sps = 7
  val Pps = 8
  val Aud = 9

  /** One NAL unit: payload byte range (header byte included) + type. */
  final case class Nal(offset: Int, len: Int, nalType: Int)

  /** One frame (access unit): contiguous byte span covering every NAL
    * of the AU including leading non-VCL units; `isIdr` = contains an
    * IDR slice (a decoder can start here).
    */
  final case class FrameSpan(frameIdx: Int, byteStart: Int, byteLen: Int,
      isIdr: Boolean)

  /** Linear start-code scan → NAL units. Returns None when the bytes
    * carry no start code at all (not an Annex-B stream).
    */
  def nalUnits(bytes: Array[Byte]): Option[IndexedSeq[Nal]] = {
    val n = bytes.length
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int] // payload offsets
    var i = 0
    while (i + 2 < n) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        starts += i + 3
        i += 3
      } else i += 1
    }
    if (starts.isEmpty) return None
    Some(starts.toIndexedSeq.zipWithIndex.map { case (off, j) =>
      // a NAL's payload runs to the next start code (minus its 2-3
      // zero prefix bytes) or the stream end
      val rawEnd = if (j + 1 < starts.length) {
        var e = starts(j + 1) - 3
        if (e > off && bytes(e - 1) == 0) e -= 1 // 4-byte start code
        e
      } else n
      val t = if (off < n) bytes(off) & 0x1f else 0
      Nal(off, math.max(0, rawEnd - off), t)
    }.filter(_.len > 0))
  }

  /** First `ue(v)` exp-Golomb value after the 1-byte NAL header, with
    * Annex-B emulation-prevention bytes (00 00 03 → 00 00) removed —
    * `first_mb_in_slice` for slice NALs. None on malformed bits.
    */
  private[multimodal] def firstUe(bytes: Array[Byte], nal: Nal): Option[Int] = {
    // RBSP-extract up to 8 payload bytes — ue(v) for any sane
    // first_mb_in_slice fits well inside
    val rbsp = new Array[Byte](math.min(8, nal.len - 1))
    var src = nal.offset + 1
    var dst = 0
    var zeros = 0
    val end = nal.offset + nal.len
    while (dst < rbsp.length && src < end) {
      val b = bytes(src)
      if (zeros >= 2 && b == 3) { zeros = 0 } // emulation byte: skip
      else {
        rbsp(dst) = b; dst += 1
        zeros = if (b == 0) zeros + 1 else 0
      }
      src += 1
    }
    if (dst == 0) return None
    def bit(k: Int): Int =
      if (k / 8 >= dst) -1
      else (rbsp(k / 8) >> (7 - (k % 8))) & 1
    var lead = 0
    while (bit(lead) == 0) {
      lead += 1
      if (bit(lead) == -1 || lead > 24) return None
    }
    var v = 0
    var k = lead + 1
    var read = 0
    while (read < lead) {
      val b = bit(k)
      if (b == -1) return None
      v = (v << 1) | b
      k += 1; read += 1
    }
    Some((1 << lead) - 1 + v)
  }

  /** The frame index: byte spans of every access unit, IDR-flagged.
    * None when the bytes aren't an Annex-B stream or carry no
    * frame-starting slice.
    */
  def frameIndex(bytes: Array[Byte]): Option[IndexedSeq[FrameSpan]] =
    nalUnits(bytes).flatMap { nals =>
      def startCodeOf(ni: Int): Int = {
        var s = nals(ni).offset - 3
        if (s > 0 && bytes(s - 1) == 0) s -= 1
        math.max(0, s)
      }
      accessUnitSpans(bytes, nals, startCodeOf, spanStart = 0,
        spanEnd = bytes.length)
    }

  /** Container-independent access-unit grouping (§7.4.1.2.4's primary
    * rule — shared by the Annex-B and AVCC walks): a slice NAL with
    * `first_mb_in_slice == 0` starts an AU; non-VCL NALs (SPS/PPS/
    * SEI/AUD) seen after the previous AU's slices are the NEXT AU's
    * prefix. `boundaryOf(ni)` maps a NAL index to the byte offset
    * where its container framing begins (start code / length prefix);
    * spans partition [spanStart, spanEnd) at the AU starts.
    */
  private[multimodal] def accessUnitSpans(bytes: Array[Byte],
      nals: IndexedSeq[Nal], boundaryOf: Int => Int, spanStart: Int,
      spanEnd: Int): Option[IndexedSeq[FrameSpan]] = {
    val auStarts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var seenSlice = false
    var prefixStart = -1 // first non-VCL NAL after the last slice
    var i = 0
    while (i < nals.length) {
      val nal = nals(i)
      if (inSlice(nal)) {
        if (firstUe(bytes, nal).contains(0)) {
          auStarts += (if (!seenSlice) -1 // 1st AU owns the stream head
            else if (prefixStart >= 0) prefixStart
            else i)
          seenSlice = true
        }
        prefixStart = -1 // continuation slice: interior, not prefix
      } else if (seenSlice && prefixStart < 0) prefixStart = i
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
        .exists(j => nals(j).nalType == SliceIdr)
      FrameSpan(fi, s, e - s, isIdr)
    })
  }

  private def inSlice(nal: Nal): Boolean =
    nal.nalType == SliceNonIdr || nal.nalType == SliceIdr

  /** Synthetic Annex-B stream for specs: SPS + PPS, then one slice NAL
    * per frame (`isIdrPerFrame`), each with `extraSlices` continuation
    * slices (first_mb_in_slice > 0 — must NOT start new frames).
    * Payloads are deterministic junk; only the structure (start codes,
    * NAL headers, the leading exp-Golomb field) is meaningful, which
    * is exactly what the index reads.
    */
  def encodeSynthetic(isIdrPerFrame: Seq[Boolean],
      extraSlices: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def nal(header: Int, payload: Array[Byte]): Unit = {
      out.write(Array[Byte](0, 0, 0, 1))
      out.write(header)
      out.write(payload)
    }
    nal(0x67, Array[Byte](0x42, 0x00, 0x1e)) // SPS (type 7)
    nal(0x68, Array[Byte](0x3c, 0x70))       // PPS (type 8)
    isIdrPerFrame.zipWithIndex.foreach { case (idr, fi) =>
      val header = if (idr) 0x65 else 0x41   // ref_idc=3, type 5/1
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
