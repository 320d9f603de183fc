package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[ExternalFixtures]]: the real-muxer-layout fixtures must index at
  * the documented offsets AND the spans' bytes must equal the planted
  * payloads — the content check that makes the hand-derived oracle
  * numbers trustworthy.
  */
class ExternalFixturesSpec extends AnyFunSuite {

  private def spans(b: Array[Byte]) =
    Mp4Index.frameIndex(b)
      .orElse(MkvIndex.frameIndex(b))
      .orElse(H264Avcc.frameIndex(b))

  test("ffmpeg-style MP4: full moov with extra sibling boxes indexes at 48/57/70") {
    val b = ExternalFixtures.ffmpegStyleMp4
    val got = Mp4Index.frameIndex(b).get
    assert(got.map(s => (s.byteStart, s.byteLen, s.isIdr)) ===
      Seq((48, 9, true), (57, 13, false), (70, 11, false)))
    got.zipWithIndex.foreach { case (sp, i) =>
      assert(b.slice(sp.byteStart, sp.byteStart + sp.byteLen)
        .sameElements(ExternalFixtures.sample(sp.byteLen, i)), s"frame $i")
    }
    // the High-profile avcC (with extension) is exposed and parses to
    // its exact length
    val t = Mp4Index.sampleTable(b).get
    val (a0, a1) = t.avcC.get
    assert(b.slice(a0, a1).sameElements(ExternalFixtures.avccRecordHigh))
  }

  test("ffmpeg-style fMP4: tfdt + per-sample-everything trun indexes at 794/800/808") {
    val b = ExternalFixtures.ffmpegStyleFmp4
    val got = Mp4Index.frameIndex(b).get
    assert(got.map(s => (s.byteStart, s.byteLen, s.isIdr)) ===
      Seq((794, 6, true), (800, 8, false), (808, 7, false)))
    got.zipWithIndex.foreach { case (sp, i) =>
      assert(b.slice(sp.byteStart, sp.byteStart + sp.byteLen)
        .sameElements(ExternalFixtures.sample(sp.byteLen, i)), s"frame $i")
    }
  }

  test("lame-style MP3: ID3v2.3+TSSE, Info frame, padded VBR, ID3v1 index at 34/322/898") {
    val b = ExternalFixtures.lameStyleMp3
    val got = Mp3Frames.frameIndex(b).get
    assert(got.map(s => (s.byteStart, s.byteLen, s.bitrateKbps)) ===
      Seq((34, 288, 64), (322, 576, 128), (898, 577, 128)))
    assert(got.forall(s => s.sampleRateHz == 32000 && s.samples == 1152))
    // the Info magic sits inside frame 0's range, like real files
    assert(new String(b.slice(34 + 36, 34 + 40), "ISO-8859-1") === "Info")
  }

  test("x264-shaped High-profile AVCC: 47 B record, frames at 47/72/89") {
    val b = ExternalFixtures.avccHighStream
    val cfg = H264Avcc.parseConfig(b).get
    assert(cfg.headerLen === 47 && cfg.lengthSize === 4)
    val got = H264Avcc.frameIndex(b).get
    assert(got.map(s => (s.byteStart, s.byteLen, s.isIdr)) ===
      Seq((47, 25, true), (72, 17, false), (89, 17, false)))
  }

  test("ffmpeg-style WebM: full EBML header, unknown-size Segment, Void — frames at 201/213/228") {
    val b = ExternalFixtures.ffmpegStyleWebm
    val got = MkvIndex.frameIndex(b).get
    assert(got.map(s => (s.byteStart, s.byteLen, s.isIdr)) ===
      Seq((201, 6, true), (213, 9, false), (228, 5, true)))
    got.zipWithIndex.foreach { case (sp, i) =>
      assert(b.slice(sp.byteStart, sp.byteStart + sp.byteLen)
        .sameElements(ExternalFixtures.sample(sp.byteLen, i)), s"frame $i")
    }
    val vt = MkvIndex.videoTrack(b).get
    assert(vt.trackNumber === 1L && vt.codecId === "V_VP9")
  }

  test("ffmpeg-style ADTS: 0x7FF-fullness 7-byte headers index at 0/30/68") {
    val b = ExternalFixtures.ffmpegStyleAdts
    val got = AdtsAac.frameIndex(b).get
    assert(got.map(s => (s.byteStart, s.byteLen)) ===
      Seq((0, 30), (30, 38), (68, 24)))
    assert(got.forall(s => s.sampleRateHz == 48000 && s.channels == 2 &&
      s.profile == 1 && s.samples == 1024 && !s.crcPresent))
    got.zipWithIndex.foreach { case (sp, i) =>
      assert(b.slice(sp.byteStart + 7, sp.byteStart + sp.byteLen)
        .sameElements(ExternalFixtures.sample(sp.byteLen - 7, i)), s"frame $i")
    }
    // an MP3 walk must refuse it (layer bits 00 are not Layer III)
    assert(Mp3Frames.frameIndex(b).isEmpty)
  }

  test("libFLAC-style FLAC: vorbis-comment+padding metadata, common-code frames at 110/143") {
    val b = ExternalFixtures.libflacStyleFlac
    val si = FlacIndex.streamInfo(b).get
    assert(si.sampleRateHz === 44100 && si.channels === 2 &&
      si.bitsPerSample === 16 && si.framesStart === 110)
    val got = FlacIndex.frameIndex(b).get
    assert(got.map(s => (s.byteStart, s.byteLen)) === Seq((110, 33), (143, 39)))
    assert(got.forall(s => s.blockSamples == 4096 &&
      s.sampleRateHz == 44100 && s.channels == 2 && s.bitsPerSample == 16))
    got.zipWithIndex.foreach { case (sp, i) =>
      assert(b.slice(sp.byteStart + 6, sp.byteStart + sp.byteLen - 2)
        .sameElements(ExternalFixtures.sample(sp.byteLen - 8, i)), s"frame $i")
    }
    // the vendor string rides inside the VORBIS_COMMENT block
    assert(new String(b.slice(50, 82), "ISO-8859-1")
      .startsWith("reference libFLAC"))
  }

  test("fixtures route through the sniff chain to their own walker") {
    assert(Mp4Index.frameIndex(ExternalFixtures.ffmpegStyleMp4).isDefined)
    assert(MkvIndex.frameIndex(ExternalFixtures.ffmpegStyleMp4).isEmpty)
    assert(H264Avcc.frameIndex(ExternalFixtures.avccHighStream).isDefined)
    assert(Mp4Index.frameIndex(ExternalFixtures.avccHighStream).isEmpty)
    assert(MkvIndex.frameIndex(ExternalFixtures.ffmpegStyleWebm).isDefined)
    assert(Mp4Index.frameIndex(ExternalFixtures.ffmpegStyleWebm).isEmpty)
  }
}
