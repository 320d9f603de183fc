package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[WavIndex]]: header facts must agree with the JDK's OWN WAV
  * writer (javax.sound — a real external encoder, not a hand-rolled
  * fixture) and the strict walk must refuse malformed RIFF bytes.
  */
class WavIndexSpec extends AnyFunSuite {

  private def encode(rate: Float, channels: Int, nFrames: Int,
      bits: Int = 16): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, bits, channels,
      true, false)
    val pcm = new Array[Byte](nFrames * channels * (bits / 8))
    (pcm.indices).foreach(i => pcm(i) = ((i * 37) & 0x7f).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("javax.sound-written WAVs parse to exact header facts and data spans") {
    val b = encode(16000f, 1, 1234)
    val w = WavIndex.info(b).get
    assert(w.formatCode === 1 && w.channels === 1 &&
      w.sampleRateHz === 16000 && w.bitsPerSample === 16)
    assert(w.blockAlign === 2 && w.byteRate === 32000)
    assert(w.dataLen === 1234 * 2 && w.frames === 1234L)
    assert(w.dataStart + w.dataLen === b.length)
    // stereo 44.1k
    val s = WavIndex.info(encode(44100f, 2, 500)).get
    assert(s.channels === 2 && s.sampleRateHz === 44100 &&
      s.frames === 500L && s.blockAlign === 4)
  }

  test("strictness: junk, truncation, data-before-fmt, bad align refuse") {
    assert(WavIndex.info(Array[Byte](9, 9, 9)).isEmpty)
    assert(WavIndex.info(Array.empty[Byte]).isEmpty)
    val b = encode(8000f, 1, 100)
    // truncate inside the data chunk: the length claim overruns
    assert(WavIndex.info(b.dropRight(1)).isEmpty)
    // break the PCM align consistency (blockAlign field at fmt+20)
    val c = b.clone()
    val fmtAt = 12 // javax.sound writes fmt directly after the header
    assert(new String(c, fmtAt, 4, "ISO-8859-1") === "fmt ")
    c(fmtAt + 8 + 12) = 5
    assert(WavIndex.info(c).isEmpty)
    // an AVI is RIFF but not WAVE
    assert(WavIndex.info(b.patch(8, "AVI ".getBytes("ISO-8859-1"), 4))
      .isEmpty)
    // MP3 bytes are not RIFF
    assert(WavIndex.info(
      Mp3Frames.encodeSynthetic(Seq((9, 0), (9, 0)))).isEmpty)
  }
}
