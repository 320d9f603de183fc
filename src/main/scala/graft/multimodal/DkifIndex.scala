package graft.multimodal

import H264AnnexB.FrameSpan

/** IVF/DKIF container indexing — the raw VP8/VP9/AV1 capture shape
  * (the public libvpx/libaom "IVF" format, what `ffmpeg -f ivf`
  * emits; named DKIF here after its magic to avoid colliding with
  * the ANN IVF index). Open-video corpora carry VP9/AV1 either in
  * WebM ([[MkvIndex]]) or in these raw .ivf dumps; this completes
  * the family with per-frame byte ranges + keyframe flags from a
  * linear header walk, no decode — the external-decoder seam's
  * access pattern.
  *
  * Layout (public format docs): a 32-byte file header —
  * "DKIF" magic, u16LE version (0), u16LE header size (32), a codec
  * fourcc (VP80/VP90/AV01), u16LE width/height, u32LE timebase
  * den/num, u32LE frame count, u32LE unused — then per frame a
  * 12-byte header (u32LE payload size, u64LE pts) + payload.
  *
  * Keyframe flags come from the CODEC's own cheap signal, each from
  * its public bitstream spec:
  *  - VP8: the frame tag's lowest bit is frame_type, 0 = key
  *    (RFC 6386 §9.1).
  *  - VP9: the uncompressed header's first byte — frame_marker '10',
  *    profile bits, show_existing_frame, then frame_type (0 = KEY);
  *    a show-existing frame is never a keyframe (VP9 spec §6.2).
  *  - AV1: a frame whose OBU stream carries an OBU_SEQUENCE_HEADER
  *    (type 1) — muxers emit the sequence header with every
  *    keyframe so random access works; the OBU walk (header byte +
  *    leb128 size, AV1 spec §5.3) must tile the payload exactly or
  *    the flag falls back to false.
  *
  * Strictness (the family's sniff contract): exact magic, version 0,
  * header size 32, a known codec fourcc, and frame headers that tile
  * the stream EXACTLY to its end (a declared frame count of 0 is
  * tolerated — real muxers often leave it stale — but a nonzero
  * count must match). Anything else is None, never a half-parse.
  */
object DkifIndex {

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private val Codecs = Set("VP80", "VP90", "AV01")

  /** VP8 keyframe: frame-tag bit 0 clear (RFC 6386 §9.1). */
  private def vp8Key(b: Array[Byte], off: Int, len: Int): Boolean =
    len >= 1 && (b(off) & 0x01) == 0

  /** VP9 keyframe: marker '10', then per-profile bit layout to
    * frame_type == 0 with show_existing_frame == 0 (spec §6.2). */
  private def vp9Key(b: Array[Byte], off: Int, len: Int): Boolean = {
    if (len < 1) return false
    val b0 = b(off) & 0xff
    if ((b0 >> 6) != 2) return false // frame_marker must be '10'
    val profile = ((b0 >> 5) & 1) | (((b0 >> 4) & 1) << 1)
    // bit cursor after marker(2) + profile(1 or 2 + reserved for 3)
    var bit = 4
    if (profile == 3) bit += 1
    def f(k: Int): Int = (b0 >> (7 - k)) & 1
    val showExisting = f(bit); bit += 1
    if (showExisting == 1) return false
    f(bit) == 0 // frame_type: 0 = KEY_FRAME
  }

  /** AV1 keyframe signal: the frame's OBU walk (header + leb128
    * size, §5.3) contains an OBU_SEQUENCE_HEADER. With `exact` the
    * walk must tile the payload exactly or no flag; prefix mode
    * (the seekable path, which reads only the frame's leading bytes)
    * accepts an OBU running past the prefix and answers from what it
    * saw — sound because muxers put the sequence header FIRST in a
    * keyframe temporal unit, and the exact path is used whenever the
    * whole payload fits the probe. */
  private def av1Key(b: Array[Byte], off: Int, len: Int,
      exact: Boolean = true): Boolean = {
    var i = off
    val end = off + len
    var sawSeq = false
    while (i < end) {
      val h = b(i) & 0xff
      if ((h & 0x80) != 0) return false // forbidden bit
      val obuType = (h >> 3) & 0x0f
      val hasExt = (h & 0x04) != 0
      val hasSize = (h & 0x02) != 0
      // size-to-end (§5.2 allows it for the LAST OBU): classify it
      // before stopping — an unsized trailing sequence header still
      // marks the keyframe
      if (!hasSize) return sawSeq || obuType == 1
      i += 1 + (if (hasExt) 1 else 0)
      // leb128 (§4.10.5): up to 8 bytes
      var size = 0L
      var shift = 0
      var more = true
      while (more) {
        if (shift > 56) return false // >8-byte leb128: illegal anywhere
        // size bytes truncated at the probe end: the OBU's TYPE is
        // already known — credit a sequence header exactly like the
        // body-overrun branch below does
        if (i >= end) return if (exact) false else sawSeq || obuType == 1
        val v = b(i) & 0xff
        size |= (v & 0x7fL) << shift
        shift += 7
        i += 1
        more = (v & 0x80) != 0
      }
      if (size < 0 || size > end - i)
        return if (exact) false else sawSeq || obuType == 1
      if (obuType == 1) sawSeq = true
      i += size.toInt
    }
    sawSeq
  }

  /** The frame index: per-frame payload byte ranges in stream order,
    * keyframe-flagged per codec. None when the bytes are not a
    * well-formed IVF/DKIF stream with ≥1 frame.
    */
  def frameIndex(b: Array[Byte]): Option[IndexedSeq[FrameSpan]] = {
    if (b.length < 32 + 12) return None
    if (!(b(0) == 'D' && b(1) == 'K' && b(2) == 'I' && b(3) == 'F'))
      return None
    if (u16(b, 4) != 0 || u16(b, 6) != 32) return None
    val codec = new String(b, 8, 4, "ISO-8859-1")
    if (!Codecs(codec)) return None
    val declared = u32(b, 24)
    val spans = scala.collection.mutable.ArrayBuffer.empty[FrameSpan]
    var i = 32
    while (i < b.length) {
      if (i + 12 > b.length) return None
      val size = u32(b, i)
      if (size <= 0 || size > b.length - (i + 12)) return None
      val off = i + 12
      val key = codec match {
        case "VP80" => vp8Key(b, off, size.toInt)
        case "VP90" => vp9Key(b, off, size.toInt)
        case _ => av1Key(b, off, size.toInt)
      }
      spans += FrameSpan(spans.length, off, size.toInt, key)
      i = off + size.toInt
    }
    if (spans.isEmpty) return None
    // a stale count of 0 is common in real muxes; a NONZERO declared
    // count must match the walk (strict-sniff consistency)
    if (declared != 0 && declared != spans.length) return None
    Some(spans.toIndexedSeq)
  }

  /** Seekable IVF/DKIF indexing for >2 GiB raw captures: the 12-byte
    * frame headers are read by seek and payloads are SKIPPED, except
    * for each frame's short keyframe probe — 1 byte for VP8/VP9
    * (their signals live in the first byte) and up to `av1ProbeBytes`
    * for AV1 (the OBU walk runs exactly when the payload fits the
    * probe, else the prefix-tolerant walk answers from the leading
    * OBUs — real muxers put the sequence header first). Same
    * strictness as [[frameIndex]]: magic/version/codec checks, exact
    * tiling to the file end, nonzero declared counts must match.
    * Spans carry 64-bit offsets ([[Mp4Index.LongSpan]]).
    */
  def frameIndexSeekable(r: Mp4Index.RangeReader,
      av1ProbeBytes: Int = 1 << 16): Option[IndexedSeq[Mp4Index.LongSpan]] = {
    val total = r.length
    if (total < 32 + 12 + 1) return None
    val h = r.readFully(0L, 32)
    if (!(h(0) == 'D' && h(1) == 'K' && h(2) == 'I' && h(3) == 'F'))
      return None
    if (u16(h, 4) != 0 || u16(h, 6) != 32) return None
    val codec = new String(h, 8, 4, "ISO-8859-1")
    if (!Codecs(codec)) return None
    val declared = u32(h, 24)
    val spans = scala.collection.mutable.ArrayBuffer.empty[Mp4Index.LongSpan]
    var i = 32L
    while (i < total) {
      if (i + 12 > total) return None
      val fh = r.readFully(i, 12)
      val size = u32(fh, 0)
      if (size <= 0 || size > total - (i + 12)) return None
      val off = i + 12
      val probeLen = codec match {
        case "VP80" | "VP90" => 1
        case _ => math.min(size, av1ProbeBytes.toLong).toInt
      }
      val probe = r.readFully(off, probeLen)
      val key = codec match {
        case "VP80" => vp8Key(probe, 0, probeLen)
        case "VP90" => vp9Key(probe, 0, probeLen)
        case _ => av1Key(probe, 0, probeLen, exact = probeLen == size)
      }
      spans += Mp4Index.LongSpan(spans.length, off, size, key)
      i = off + size
    }
    if (spans.isEmpty) return None
    if (declared != 0 && declared != spans.length) return None
    Some(spans.toIndexedSeq)
  }

  /** Synthetic IVF stream for specs/oracles: 32-byte header + frames
    * with codec-correct keyframe leading bytes. `frames` gives
    * (payload, isKey); payload byte 0 is overwritten with the
    * codec's key/non-key signal byte.
    */
  def encodeSynthetic(codec: String, frames: Seq[(Array[Byte], Boolean)],
      declaredCount: Int = -1): Array[Byte] = {
    require(Codecs(codec), s"unknown codec $codec")
    require(frames.nonEmpty && frames.forall(_._1.length >= 2))
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 until 4).foreach(j =>
      out.write(((v >> (8 * j)) & 0xff).toInt))
    out.write("DKIF".getBytes("ISO-8859-1"))
    w16(0); w16(32)
    out.write(codec.getBytes("ISO-8859-1"))
    w16(64); w16(48)      // width, height
    w32(30L); w32(1L)     // timebase den/num
    w32(if (declaredCount >= 0) declaredCount.toLong else frames.size.toLong)
    w32(0L)
    frames.zipWithIndex.foreach { case ((payload, key), fi) =>
      val p: Array[Byte] = codec match {
        case "VP80" =>
          val c = payload.clone()
          c(0) = (if (key) 0x10 else 0x11).toByte
          c
        case "VP90" =>
          // marker '10', profile 0, show_existing 0, frame_type
          // key→0, show_frame 1: bits 1 0 0 0 0 t 1 0
          val c = payload.clone()
          c(0) = (if (key) 0x82 else 0x86).toByte
          c
        case _ =>
          // AV1: keyframes lead with a sized OBU_SEQUENCE_HEADER
          // (type 1), non-keys with a sized OBU_FRAME (type 6); the
          // remaining payload rides one size-to-end OBU_PADDING (15)
          val lead =
            if (key) Array[Byte](0x0a, 0x02, 0x7f, 0x33) // seq hdr, len 2
            else Array[Byte](0x32, 0x02, 0x7f, 0x33)     // frame, len 2
          lead ++ Array[Byte](0x78) ++ payload.drop(1)   // padding, to end
      }
      w32(p.length.toLong)
      w32(fi.toLong); w32(0L) // pts u64
      out.write(p)
    }
    out.toByteArray
  }
}
