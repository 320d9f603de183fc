package graft.multimodal

/** ADTS AAC FRAME INDEXING (ISO/IEC 13818-7 §6.2 / 14496-3 §1.A.2,
  * public spec) — the third audio face of the external-decoder seam
  * beside [[Mp3Frames]] and [[OggIndex]]: raw AAC captures
  * (`ffmpeg -f adts`, broadcast feeds, most `.aac` files) are a
  * sequence of self-delimiting ADTS frames, and a 100 TB audio corpus
  * needs the frame byte ranges + rate facts WITHOUT any in-JVM
  * decode, so stride sampling fetches only the chosen ranges and
  * duration/bitrate profiles come straight from the index
  * arithmetic.
  *
  * Unlike MP3, the frame length is carried LITERALLY in the header
  * (`aac_frame_length`, 13 bits, includes the header itself), so the
  * walk is pure field extraction: 7-byte headers when
  * `protection_absent` is set, 9 bytes when a CRC-16 rides after the
  * fixed header. Each frame decodes `1024 × (number_of_raw_data_
  * blocks + 1)` PCM samples at the header's sampling-frequency-index
  * rate.
  *
  * Strictness (the family's sniff contract): the stream must tile
  * EXACTLY into ≥2 valid ADTS frames — a 12-bit sync alone (0xFFF,
  * which also opens every MPEG-audio frame) is far too weak, so each
  * header must additionally have `layer == 0` (the spec's only legal
  * value — this alone separates ADTS from Layer I-III, whose layer
  * bits are nonzero), a non-reserved sampling index (≤ 12), and a
  * frame length that covers at least its own header; and because no
  * real encoder switches rate or channel shape mid-stream, the
  * sampling index and channel configuration must be CONSTANT across
  * frames. Every count is bounds-checked; corrupt bytes yield None,
  * never an exception.
  */
object AdtsAac {

  /** One indexed frame: byte range + the header facts a pipeline
    * needs without decoding (audio-object profile, rate, channels,
    * PCM sample count).
    */
  final case class AacSpan(frameIdx: Int, byteStart: Int, byteLen: Int,
      profile: Int, sampleRateHz: Int, channels: Int, samples: Int,
      crcPresent: Boolean)

  /** sampling_frequency_index → Hz (13818-7 table 35; 13-15 escape/
    * reserved). */
  private[multimodal] val SampleRates = Array(96000, 88200, 64000,
    48000, 44100, 32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** Parse one ADTS header at `i`: (frameLen, profile, srIdx,
    * channelCfg, rawDataBlocks+1, crcPresent) or None when the bytes
    * are not a valid ADTS fixed+variable header.
    */
  private def header(b: Array[Byte], i: Int)
      : Option[(Int, Int, Int, Int, Int, Boolean)] = {
    if (i + 7 > b.length) return None
    val h0 = b(i) & 0xff; val h1 = b(i + 1) & 0xff
    if (h0 != 0xff || (h1 & 0xf0) != 0xf0) return None // 12-bit sync
    if ((h1 & 0x06) != 0) return None                  // layer must be 00
    val crcPresent = (h1 & 0x01) == 0                  // protection_absent
    val h2 = b(i + 2) & 0xff
    val profile = (h2 >> 6) & 0x03
    val srIdx = (h2 >> 2) & 0x0f
    if (srIdx > 12) return None                        // escape/reserved
    val h3 = b(i + 3) & 0xff
    val chanCfg = ((h2 & 0x01) << 2) | ((h3 >> 6) & 0x03)
    val h4 = b(i + 4) & 0xff; val h5 = b(i + 5) & 0xff
    val frameLen = ((h3 & 0x03) << 11) | (h4 << 3) | ((h5 >> 5) & 0x07)
    val rdb = (b(i + 6) & 0x03) + 1
    val hdrLen = if (crcPresent) 9 else 7
    if (frameLen < hdrLen) None
    else Some((frameLen, profile, srIdx, chanCfg, rdb, crcPresent))
  }

  /** The frame index: byte spans of every ADTS frame. None unless
    * ≥2 frames tile the stream exactly (after an optional leading
    * ID3v2 tag — taggers prepend the same tag to .aac files, and
    * [[Mp3Frames.skipId3v2]] is shared for it) with a constant
    * sampling index and channel configuration.
    */
  def frameIndex(bytes: Array[Byte]): Option[IndexedSeq[AacSpan]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AacSpan]
    var srIdx0 = -1
    var chan0 = -1
    var i = Mp3Frames.skipId3v2(bytes).getOrElse(return None)
    while (i < bytes.length) {
      header(bytes, i) match {
        case Some((len, profile, srIdx, chanCfg, rdb, crc)) =>
          if (i + len > bytes.length) return None // no crossing the end
          if (out.isEmpty) { srIdx0 = srIdx; chan0 = chanCfg }
          else if (srIdx != srIdx0 || chanCfg != chan0) return None
          out += AacSpan(out.length, i, len, profile,
            SampleRates(srIdx), chanCfg, 1024 * rdb, crc)
          i += len
        case None => return None
      }
    }
    if (out.length >= 2) Some(out.toIndexedSeq) else None
  }

  /** Synthetic ADTS stream for specs/oracles: `frames` gives the
    * payload size per frame (excluding the header); header facts are
    * computed for real. `crc` adds the 2-byte CRC slot (content
    * zeroed — the index never validates it, only accounts its
    * length); `rdbMinus1` sets number_of_raw_data_blocks_in_frame.
    */
  def encodeSynthetic(frames: Seq[Int], srIdx: Int = 4, chanCfg: Int = 2,
      profile: Int = 1, crc: Boolean = false,
      rdbMinus1: Int = 0): Array[Byte] = {
    require(srIdx <= 12 && chanCfg <= 7 && profile <= 3 && rdbMinus1 <= 3)
    val out = new java.io.ByteArrayOutputStream()
    frames.zipWithIndex.foreach { case (payload, fi) =>
      val hdrLen = if (crc) 9 else 7
      val len = hdrLen + payload
      require(len < (1 << 13), "aac_frame_length is 13 bits")
      out.write(0xff)
      out.write(0xf0 | (if (crc) 0 else 1)) // MPEG-4 ID, layer 00
      out.write((profile << 6) | (srIdx << 2) | ((chanCfg >> 2) & 0x01))
      out.write(((chanCfg & 0x03) << 6) | ((len >> 11) & 0x03))
      out.write((len >> 3) & 0xff)
      out.write(((len & 0x07) << 5) | 0x1f) // buffer fullness high bits
      out.write(0xfc | rdbMinus1)           // fullness low + rdb count
      if (crc) { out.write(0); out.write(0) }
      val body = new Array[Byte](payload)
      java.util.Arrays.fill(body, ((0x20 + fi) & 0x7f).toByte)
      out.write(body)
    }
    out.toByteArray
  }
}
