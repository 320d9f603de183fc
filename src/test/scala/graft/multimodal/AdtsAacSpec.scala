package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[AdtsAac]]: the in-header frame length must tile the stream
  * exactly across CRC/no-CRC headers and raw-data-block counts, and
  * the strict sniff must refuse everything that is not ≥2 consistent
  * ADTS frames — including every MPEG-audio Layer I-III stream
  * (nonzero layer bits) and rate/channel switches mid-stream.
  */
class AdtsAacSpec extends AnyFunSuite {

  test("frames tile exactly; header facts ride out") {
    val b = AdtsAac.encodeSynthetic(Seq(100, 250, 37), srIdx = 3,
      chanCfg = 6, profile = 1)
    val s = AdtsAac.frameIndex(b).get
    assert(s.map(_.byteLen) === Seq(107, 257, 44))
    assert(s.map(_.byteStart) === Seq(0, 107, 364))
    assert(s.last.byteStart + s.last.byteLen === b.length)
    assert(s.map(_.sampleRateHz).forall(_ == 48000))
    assert(s.map(_.channels).forall(_ == 6))
    assert(s.map(_.profile).forall(_ == 1))
    assert(s.map(_.samples).forall(_ == 1024))
    assert(s.forall(!_.crcPresent))
  }

  test("CRC headers are 9 bytes; raw-data-block count scales samples") {
    val b = AdtsAac.encodeSynthetic(Seq(64, 64), crc = true, rdbMinus1 = 1)
    val s = AdtsAac.frameIndex(b).get
    assert(s.map(_.byteLen) === Seq(73, 73))
    assert(s.forall(_.crcPresent))
    assert(s.map(_.samples).forall(_ == 2048))
  }

  test("strict sniff: junk, single frame, truncation, layer bits refuse") {
    assert(AdtsAac.frameIndex(Array[Byte](9, 9, 9, 9)).isEmpty)
    assert(AdtsAac.frameIndex(Array.empty[Byte]).isEmpty)
    // one frame only
    assert(AdtsAac.frameIndex(AdtsAac.encodeSynthetic(Seq(50))).isEmpty)
    // last frame truncated by one byte
    val b = AdtsAac.encodeSynthetic(Seq(50, 50))
    assert(AdtsAac.frameIndex(b.dropRight(1)).isEmpty)
    // an MP3 Layer-III stream syncs on 0xFFF too, but its layer bits
    // are 01 — the ADTS walk must refuse it whole
    val mp3 = Mp3Frames.encodeSynthetic(Seq((9, 0), (9, 0)))
    assert(AdtsAac.frameIndex(mp3).isEmpty)
    // and symmetrically the MP3 walk refuses ADTS (layer 00)
    val aac = AdtsAac.encodeSynthetic(Seq(50, 50))
    assert(Mp3Frames.frameIndex(aac).isEmpty)
    // reserved sampling index refuses (patch srIdx to 13 in both frames)
    val r = AdtsAac.encodeSynthetic(Seq(50, 50))
    r(2) = ((r(2) & 0xc1) | (13 << 2)).toByte
    assert(AdtsAac.frameIndex(r).isEmpty)
  }

  test("a leading ID3v2 tag is skipped, like the MP3 walk does") {
    val stream = AdtsAac.encodeSynthetic(Seq(50, 60))
    val id3 = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("ID3".getBytes("ISO-8859-1"))
      out.write(4); out.write(0); out.write(0)
      out.write(0); out.write(0); out.write(0); out.write(20)
      out.write(new Array[Byte](20))
      out.toByteArray
    }
    val spans = AdtsAac.frameIndex(id3 ++ stream).get
    assert(spans.map(s => (s.byteStart, s.byteLen)) ===
      Seq((30, 57), (87, 67)))
    // a malformed tag (truncated) refuses rather than mis-syncing
    assert(AdtsAac.frameIndex(id3.take(12) ++ stream).isEmpty)
  }

  test("mid-stream rate or channel switches refuse (no real encoder emits them)") {
    val a = AdtsAac.encodeSynthetic(Seq(50), srIdx = 3)
    val b = AdtsAac.encodeSynthetic(Seq(50), srIdx = 4)
    assert(AdtsAac.frameIndex(a ++ b).isEmpty)
    val c = AdtsAac.encodeSynthetic(Seq(50), chanCfg = 1)
    val d = AdtsAac.encodeSynthetic(Seq(50), chanCfg = 2)
    assert(AdtsAac.frameIndex(c ++ d).isEmpty)
  }

  test("frame length below its own header size refuses") {
    // hand-build a 7-byte-header frame claiming length 6
    val b = AdtsAac.encodeSynthetic(Seq(50, 50))
    // frame 2 starts at 57; rewrite its length field to 6
    val at = 57
    b(at + 3) = (b(at + 3) & 0xfc).toByte
    b(at + 4) = 0
    b(at + 5) = ((6 << 5) | (b(at + 5) & 0x1f)).toByte
    assert(AdtsAac.frameIndex(b).isEmpty)
  }
}
