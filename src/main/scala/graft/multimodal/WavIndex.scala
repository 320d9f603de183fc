package graft.multimodal

/** WAV/RIFF HEADER INDEXING (the RIFF/WAVE format, public — Microsoft
  * multimedia file format + the IBM/MS WAVE spec) — the uncompressed
  * face of the audio seam: WAV corpora (speech datasets ship as PCM
  * WAV more than anything else) need the `fmt ` facts and the `data`
  * byte span WITHOUT reading sample bytes — duration is
  * `dataLen / byteRate` arithmetic, and a slicing pipeline fetches
  * exact PCM ranges (`blockAlign`-multiples) straight from the span.
  * [[Multimodal.decodeAudio]] DECODES WAV via javax.sound; this is
  * the header-only twin for 100 TB-scale profiling where decoding
  * every asset is the bug.
  *
  * Walk: "RIFF" + u32le riffLen + "WAVE", then chunks of
  * [fourcc(4), u32le len, payload, odd-length pad byte]. `fmt `
  * (≥16 B: u16le format code — 1 PCM, 3 float, 6/7 a/µ-law, 0xFFFE
  * extensible — channels, rate, byteRate, blockAlign, bits) must
  * precede `data`. Unknown chunks (LIST, fact, cue) skip by length,
  * as every reader does.
  *
  * Strictness: magic + riffLen covering the walk, chunks tiling to
  * the RIFF end (trailing bytes after the RIFF body are tolerated —
  * real tools append metadata), exactly one fmt before the data
  * chunk, nonzero rate/channels/blockAlign consistent with
  * channels·bits/8. Every length is bounds-checked; corrupt bytes
  * yield None, never an exception.
  */
object WavIndex {

  /** The header facts + data span. `frames` = dataLen / blockAlign —
    * PCM frame count, so duration_s = frames / rate exactly. */
  final case class WavInfo(formatCode: Int, channels: Int,
      sampleRateHz: Int, bitsPerSample: Int, blockAlign: Int,
      byteRate: Int, dataStart: Int, dataLen: Int, frames: Long)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** The header walk. None unless the bytes open a well-formed
    * RIFF/WAVE with an fmt-before-data chunk pair. */
  def info(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
      return None
    val riffLen = u32(b, 4)
    // the RIFF length covers "WAVE" + chunks; cap the walk by it AND
    // the array (trailing metadata beyond the RIFF body is tolerated)
    val end = math.min(8L + riffLen, b.length.toLong).toInt
    if (end < 12) return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int, Int, Int)] = None
    while (i + 8 <= end) {
      val fc = new String(b, i, 4, "ISO-8859-1")
      val len = u32(b, i + 4)
      if (len < 0 || len > end - (i + 8)) return None
      if (fc == "fmt ") {
        if (fmt.isDefined || len < 16) return None
        val code = u16(b, i + 8)
        val ch = u16(b, i + 10)
        val rate = u32(b, i + 12)
        val byteRate = u32(b, i + 16)
        val align = u16(b, i + 20)
        val bits = u16(b, i + 22)
        if (ch < 1 || rate < 1 || rate > Int.MaxValue || align < 1 ||
            byteRate > Int.MaxValue) return None
        // PCM consistency: blockAlign = channels · bits/8 (format
        // code 1/3 only — compressed codecs define their own)
        if ((code == 1 || code == 3) &&
            align != ch * (bits / 8)) return None
        fmt = Some((code, ch, rate.toInt, byteRate.toInt, align, bits))
      } else if (fc == "data") {
        val (code, ch, rate, byteRate, align, bits) =
          fmt.getOrElse(return None) // fmt must PRECEDE data
        return Some(WavInfo(code, ch, rate, bits, align, byteRate,
          i + 8, len.toInt, len / align))
      }
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    None
  }
}
