package graft.multimodal

/** MPEG audio (MP3) FRAME INDEXING (ISO/IEC 11172-3 / 13818-3,
  * public spec) — the audio twin of the H.264 byte-range seam: a
  * 100 TB audio corpus needs the SEEK STRUCTURE (which byte ranges
  * are frames, at what bitrate/sample-rate, how many PCM samples
  * each decodes to) without any in-JVM decode, so stride sampling
  * fetches only the chosen ranges and hands them to an external
  * decoder, and stream duration/bitrate profiles come straight from
  * the index arithmetic.
  *
  * Scope: Layer III (the "MP3" of practice) across MPEG-1/2/2.5.
  * Frame length is fully determined by the 4-byte header:
  * `samplesPerFrame/8 · bitrate / sampleRate + padding` (1152
  * samples for MPEG-1, 576 for MPEG-2/2.5). Leading ID3v2 tags
  * (synchsafe-sized, optional footer) are skipped; a trailing ID3v1
  * block (128 bytes, "TAG") may terminate the walk.
  *
  * Strictness (the family's sniff contract): after the optional
  * ID3v2 tag the stream must tile EXACTLY into ≥2 valid Layer-III
  * frames up to its end or the ID3v1 trailer — a 4-byte sync pattern
  * alone is far too weak (0xFFE bytes occur in any binary), but two
  * consecutive arithmetic-consistent frames landing exactly on the
  * stream end cannot happen by accident. "Free-format" bitrate
  * (index 0) has no in-header length and is refused, as is anything
  * reserved. Every count is bounds-checked; corrupt bytes yield
  * None, never an exception.
  *
  * Bit-reservoir note (documented seam contract): Layer III frames
  * may borrow `main_data` bits from up to ~2 PRECEDING frames, so an
  * external decoder seeking to a sampled frame should fetch a couple
  * of preceding ranges too — the index gives it exactly the offsets
  * to do that; the spans themselves are the container truth.
  */
object Mp3Frames {

  /** One indexed frame: byte range + the header facts a pipeline
    * needs without decoding (rate profile, PCM sample count).
    */
  final case class Mp3Span(frameIdx: Int, byteStart: Int, byteLen: Int,
      bitrateKbps: Int, sampleRateHz: Int, samples: Int)

  // Layer III bitrate tables, kbps, index 1..14 (0 = free, 15 = bad)
  private val BitrateV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, -1)
  private val BitrateV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
    96, 112, 128, 144, 160, -1)
  // sample-rate tables by version, index 0..2 (3 = reserved)
  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  /** Parse one frame header at `i`; returns (frameLen, kbps, sr,
    * samples) or None when the 4 bytes are not a valid Layer-III
    * header with a computable length.
    */
  private def header(b: Array[Byte], i: Int): Option[(Int, Int, Int, Int)] = {
    if (i + 4 > b.length) return None
    val h0 = b(i) & 0xff; val h1 = b(i + 1) & 0xff
    val h2 = b(i + 2) & 0xff
    if (h0 != 0xff || (h1 & 0xe0) != 0xe0) return None
    val verBits = (h1 >> 3) & 0x03   // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    val layerBits = (h1 >> 1) & 0x03 // 01 = Layer III
    if (verBits == 1 || layerBits != 1) return None
    val brIdx = (h2 >> 4) & 0x0f
    val srIdx = (h2 >> 2) & 0x03
    val padding = (h2 >> 1) & 0x01
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free/bad
    val v1 = verBits == 3
    val kbps = (if (v1) BitrateV1 else BitrateV2)(brIdx)
    val sr = (verBits match {
      case 3 => SrV1
      case 2 => SrV2
      case _ => SrV25
    })(srIdx)
    val samples = if (v1) 1152 else 576
    val len = samples / 8 * kbps * 1000 / sr + padding
    if (len < 4) None else Some((len, kbps, sr, samples))
  }

  /** Skip a leading ID3v2 tag: "ID3" + version(2) + flags(1) +
    * synchsafe size(4) [+ footer 10 when flag 0x10]. Returns the
    * first post-tag offset, or None on a malformed tag. Shared with
    * [[AdtsAac]] — taggers prepend the same tag to .aac files.
    */
  private[multimodal] def skipId3v2(b: Array[Byte]): Option[Int] = {
    if (b.length < 3 || b(0) != 'I' || b(1) != 'D' || b(2) != '3')
      return Some(0)
    if (b.length < 10) return None
    // synchsafe: 4 × 7 bits, high bit of each byte must be clear
    if (((b(6) | b(7) | b(8) | b(9)) & 0x80) != 0) return None
    val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    val footer = if ((b(5) & 0x10) != 0) 10 else 0
    val end = 10L + size + footer
    if (end > b.length) None else Some(end.toInt)
  }

  /** The frame index: byte spans of every Layer-III frame. None
    * unless ≥2 frames tile the post-ID3v2 stream exactly (to its end
    * or a trailing ID3v1 "TAG" block). The full-end tiling is tried
    * FIRST and the trailer excluded only as a retry: compressed audio
    * bytes spell "TAG" at exactly length−128 by coincidence often
    * enough in a 100 TB corpus (~2⁻²⁴ per file) that sniffing the
    * trailer eagerly would refuse well-formed tag-less files.
    */
  def frameIndex(bytes: Array[Byte]): Option[IndexedSeq[Mp3Span]] = {
    val start = skipId3v2(bytes).getOrElse(return None)
    def walk(end: Int): Option[IndexedSeq[Mp3Span]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Mp3Span]
      var i = start
      while (i < end) {
        header(bytes, i) match {
          case Some((len, kbps, sr, samples)) =>
            if (i + len > end) return None // frame must not cross the end
            out += Mp3Span(out.length, i, len, kbps, sr, samples)
            i += len
          case None => return None
        }
      }
      if (out.length >= 2) Some(out.toIndexedSeq) else None
    }
    val hasTrailer = bytes.length - start >= 128 &&
      bytes(bytes.length - 128) == 'T' &&
      bytes(bytes.length - 127) == 'A' &&
      bytes(bytes.length - 126) == 'G'
    walk(bytes.length).orElse(
      if (hasTrailer) walk(bytes.length - 128) else None)
  }

  /** Synthetic Layer-III stream for specs: valid headers + junk
    * payloads. `frames` gives (bitrateIndex, paddingBit) per frame;
    * `srIdx`/`mpeg1` pick the rate table; `id3v2Size` prepends a tag
    * of that content size; `id3v1` appends the 128-byte trailer.
    */
  def encodeSynthetic(frames: Seq[(Int, Int)], srIdx: Int = 2,
      mpeg1: Boolean = true, id3v2Size: Int = 0,
      id3v1: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3v2Size > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // v2.4, no flags
      out.write((id3v2Size >> 21) & 0x7f); out.write((id3v2Size >> 14) & 0x7f)
      out.write((id3v2Size >> 7) & 0x7f); out.write(id3v2Size & 0x7f)
      out.write(new Array[Byte](id3v2Size))
    }
    frames.zipWithIndex.foreach { case ((brIdx, pad), fi) =>
      val h1 = if (mpeg1) 0xfb else 0xf3 // sync + version + LayerIII
      out.write(0xff); out.write(h1)
      out.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      out.write(0x00) // stereo
      val kbps = (if (mpeg1) BitrateV1 else BitrateV2)(brIdx)
      val sr = (if (mpeg1) SrV1 else SrV2)(srIdx)
      val samples = if (mpeg1) 1152 else 576
      val len = samples / 8 * kbps * 1000 / sr + pad
      val body = new Array[Byte](len - 4)
      java.util.Arrays.fill(body, ((0x20 + fi) & 0x7f).toByte)
      out.write(body)
    }
    if (id3v1) {
      out.write('T'); out.write('A'); out.write('G')
      out.write(new Array[Byte](125))
    }
    out.toByteArray
  }
}
