package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[Mp3Frames]]: header-arithmetic frame walks must tile the stream
  * exactly across bitrate/padding/version variants and tags, and the
  * strict sniff must refuse everything that is not ≥2 consistent
  * Layer-III frames.
  */
class Mp3FramesSpec extends AnyFunSuite {

  test("frames tile exactly across VBR bitrates and padding, MPEG-1 and MPEG-2") {
    // MPEG-1 at 44100 Hz: 144*128000/44100 = 417 floor, +1 when padded
    val v1 = Mp3Frames.encodeSynthetic(
      Seq((9, 0), (9, 1), (14, 0)), srIdx = 0)
    val s1 = Mp3Frames.frameIndex(v1).get
    assert(s1.map(_.byteLen) === Seq(417, 418, 1044))
    assert(s1.map(_.bitrateKbps) === Seq(128, 128, 320))
    assert(s1.map(_.sampleRateHz).forall(_ == 44100))
    assert(s1.map(_.samples).forall(_ == 1152))
    assert(s1.head.byteStart === 0)
    s1.sliding(2).foreach { case Seq(a, b) =>
      assert(a.byteStart + a.byteLen === b.byteStart)
    }
    assert(s1.last.byteStart + s1.last.byteLen === v1.length)
    // MPEG-2 at 16 kHz: 576 samples/frame, 72*64000/16000 = 288
    val v2 = Mp3Frames.encodeSynthetic(
      Seq((8, 0), (8, 0)), srIdx = 2, mpeg1 = false)
    val s2 = Mp3Frames.frameIndex(v2).get
    assert(s2.map(_.samples).forall(_ == 576))
    assert(s2.map(_.bitrateKbps).forall(_ == 64))
    assert(s2.map(_.byteLen) === Seq(288, 288))
  }

  test("ID3v2 prefix is skipped; ID3v1 trailer terminates the walk") {
    val b = Mp3Frames.encodeSynthetic(Seq((9, 0), (9, 0)), srIdx = 2,
      id3v2Size = 100, id3v1 = true)
    val spans = Mp3Frames.frameIndex(b).get
    assert(spans.head.byteStart === 110) // 10-byte header + 100 content
    assert(spans.length === 2)
    assert(spans.last.byteStart + spans.last.byteLen === b.length - 128)
  }

  test("coincidental 'TAG' bytes in audio payload do not break a tag-less file") {
    // compressed audio spells T,A,G at exactly length-128 by chance
    // (~2^-24 per file — expected hits in a 100 TB corpus); the full
    // tiling must win and only fall back to trailer exclusion when
    // the full walk fails (a REAL trailer)
    val b = Mp3Frames.encodeSynthetic(Seq((9, 0), (9, 0))) // 2×576 B
    assert(b.length === 1152)
    b(1024) = 'T'; b(1025) = 'A'; b(1026) = 'G' // inside frame 2's body
    val spans = Mp3Frames.frameIndex(b).get
    assert(spans.length === 2)
    assert(spans.last.byteStart + spans.last.byteLen === b.length,
      "full-end tiling must win over the coincidental trailer sniff")
  }

  test("strict sniff: junk, single frame, truncation, free bitrate all refuse") {
    assert(Mp3Frames.frameIndex(Array[Byte](9, 9, 9, 9)).isEmpty)
    assert(Mp3Frames.frameIndex(Array.empty[Byte]).isEmpty)
    // a single valid frame is not enough evidence
    assert(Mp3Frames.frameIndex(
      Mp3Frames.encodeSynthetic(Seq((9, 0)))).isEmpty)
    val good = Mp3Frames.encodeSynthetic(Seq((9, 0), (9, 0), (9, 0)))
    for (cut <- Seq(3, good.length - 1, good.length - 100)) {
      assert(Mp3Frames.frameIndex(good.take(cut)).isEmpty, s"cut=$cut")
    }
    // free-format bitrate (index 0) has no in-header length: refuse
    val free = good.clone()
    free(2) = ((0 << 4) | (2 << 2)).toByte
    assert(Mp3Frames.frameIndex(free).isEmpty)
    // Layer II (layer bits 10) is out of scope: refuse
    val l2 = good.clone()
    l2(1) = 0xfd.toByte
    assert(Mp3Frames.frameIndex(l2).isEmpty)
    // the other walkers must not claim MP3 bytes either
    assert(Mp4Index.frameIndex(good).isEmpty)
    assert(H264Avcc.frameIndex(good).isEmpty)
  }
}
