package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[FlacIndex]]: boundary detection has no in-header length to lean
  * on — the CRC-8/CRC-16 chain must place every frame end exactly,
  * and the strict sniff must refuse corrupt CRCs, reserved codes and
  * non-FLAC bytes.
  */
class FlacIndexSpec extends AnyFunSuite {

  test("streaminfo facts parse; frames tile exactly via the CRC-16 fixed point") {
    val b = FlacIndex.encodeSynthetic(
      Seq((4096, 100), (4096, 250), (1000, 37)),
      sampleRate = 44100, channels = 2, bps = 16)
    val si = FlacIndex.streamInfo(b).get
    assert(si.sampleRateHz === 44100 && si.channels === 2 &&
      si.bitsPerSample === 16)
    assert(si.framesStart === 42) // fLaC + 4 hdr + 34 body
    val s = FlacIndex.frameIndex(b).get
    assert(s.length === 3)
    assert(s.head.byteStart === 42)
    s.sliding(2).foreach { case Seq(x, y) =>
      assert(x.byteStart + x.byteLen === y.byteStart)
    }
    assert(s.last.byteStart + s.last.byteLen === b.length)
    // header(6) + crc8(1) + payload + crc16(2) for wide block sizes
    // = 5 fixed + 1 coded + 2 bs = 8 +1... byteLen = hdr + payload + 2
    assert(s.map(_.blockSamples) === Seq(4096, 4096, 1000))
    assert(s.map(_.sampleRateHz).forall(_ == 44100))
    assert(s.map(_.channels).forall(_ == 2))
    assert(s.map(_.bitsPerSample).forall(_ == 16))
  }

  test("metadata blocks after STREAMINFO are walked; padding shifts frame 0") {
    val b = FlacIndex.encodeSynthetic(Seq((256, 40), (256, 50)),
      paddingLen = 64)
    val si = FlacIndex.streamInfo(b).get
    assert(si.framesStart === 42 + 4 + 64)
    val s = FlacIndex.frameIndex(b).get
    assert(s.length === 2 && s.head.byteStart === si.framesStart)
  }

  test("8-bit vs 16-bit uncommon block sizes produce different header lengths") {
    val small = FlacIndex.encodeSynthetic(Seq((256, 10), (256, 10)))
    val wide = FlacIndex.encodeSynthetic(Seq((257, 10), (257, 10)))
    val ss = FlacIndex.frameIndex(small).get
    val sw = FlacIndex.frameIndex(wide).get
    assert(sw.head.byteLen === ss.head.byteLen + 1)
    assert(ss.map(_.blockSamples).forall(_ == 256))
    assert(sw.map(_.blockSamples).forall(_ == 257))
  }

  test("strict sniff: junk, truncation, corrupt CRCs, bad codes refuse") {
    assert(FlacIndex.frameIndex(Array[Byte](9, 9, 9, 9)).isEmpty)
    assert(FlacIndex.frameIndex(Array.empty[Byte]).isEmpty)
    val b = FlacIndex.encodeSynthetic(Seq((256, 40), (256, 50)))
    // truncate mid-final-frame: the tiling fails
    assert(FlacIndex.frameIndex(b.dropRight(1)).isEmpty)
    // flip a payload byte of frame 1: its CRC-16 never zeroes at a
    // valid boundary again
    val c = b.clone; c(b.length - 5) = (c(b.length - 5) ^ 0x01).toByte
    assert(FlacIndex.frameIndex(c).isEmpty)
    // corrupt the header CRC-8 of frame 0 (header is 6 bytes for the
    // 8-bit block-size path: 4 fixed + 1 coded number + 1 size byte)
    val si = FlacIndex.streamInfo(b).get
    val d = b.clone
    d(si.framesStart + 6) = (d(si.framesStart + 6) ^ 0x40).toByte
    assert(FlacIndex.frameIndex(d).isEmpty)
    // a non-FLAC audio stream refuses at the magic
    assert(FlacIndex.frameIndex(
      Mp3Frames.encodeSynthetic(Seq((9, 0), (9, 0)))).isEmpty)
    // STREAMINFO must be first: retag block type to PADDING
    val e = b.clone; e(4) = (e(4) | 0x01).toByte
    assert(FlacIndex.frameIndex(e).isEmpty)
  }
}
