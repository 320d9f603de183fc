package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[H264AnnexB]]: exact NAL scanning, exp-Golomb slice-header reads,
  * access-unit grouping with non-VCL prefixes, IDR flags, and the
  * Spark-side byte-range sampler.
  */
class H264AnnexBSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic stream indexes to exact frame spans; continuation slices don't split") {
    val s = H264AnnexB.encodeSynthetic(
      Seq(true, false, false, true, false), extraSlices = 1)
    // layout: SPS 8 + PPS 7 = 15; each frame = 2 slices x 7 = 14
    val idx = H264AnnexB.frameIndex(s).get
    assert(idx.size === 5)
    assert(idx(0) === H264AnnexB.FrameSpan(0, 0, 29, isIdr = true))
    assert(idx(1) === H264AnnexB.FrameSpan(1, 29, 14, isIdr = false))
    assert(idx(3) === H264AnnexB.FrameSpan(3, 57, 14, isIdr = true))
    assert(idx(4) === H264AnnexB.FrameSpan(4, 71, 14, isIdr = false))
    // spans partition the stream
    assert(idx.map(_.byteLen).sum === s.length)
  }

  test("3-byte start codes, garbage, and no-slice streams") {
    // handcrafted 3-byte start codes: SPS then one IDR slice
    val three = Array[Byte](0, 0, 1, 0x67, 0x42, 0, 0, 1, 0x65,
      0x80.toByte, 0x11)
    val idx = H264AnnexB.frameIndex(three).get
    assert(idx.size === 1 && idx(0).isIdr)
    assert(idx(0).byteStart === 0 && idx(0).byteLen === three.length)
    assert(H264AnnexB.frameIndex(Array[Byte](9, 9, 9)) === None)
    // start codes but no frame-starting slice (SPS/PPS only)
    val noSlice = Array[Byte](0, 0, 0, 1, 0x67, 0x42, 0, 0, 0, 1, 0x68, 0x3c)
    assert(H264AnnexB.frameIndex(noSlice) === None)
  }

  test("exp-Golomb first_mb_in_slice with emulation-prevention bytes") {
    val s = H264AnnexB.encodeSynthetic(Seq(true))
    val nals = H264AnnexB.nalUnits(s).get
    val slice = nals.find(_.nalType == H264AnnexB.SliceIdr).get
    assert(H264AnnexB.firstUe(s, slice) === Some(0))
    // a continuation slice whose payload opens with 00 00 03 (emulation
    // byte) must neither crash nor read first_mb 0
    val emu = Array[Byte](0, 0, 0, 1, 0x67, 0x42, // SPS
      0, 0, 0, 1, 0x65, 0x80.toByte, 0x11,        // frame 0 (first_mb 0)
      0, 0, 0, 1, 0x41, 0x00, 0x00, 0x03, 0x40, 0x22) // emu-prefixed slice
    val idx = H264AnnexB.frameIndex(emu).get
    assert(idx.size === 1, s"emulation bytes split the frame: $idx")
  }

  test("sampleH264Frames: stride, keyframes-only, and the flagged fallback") {
    implicit val s = spark
    val stream = H264AnnexB.encodeSynthetic(
      Seq(true, false, false, true, false), extraSlices = 1)
    val assets = Multimodal.toMediaAssets(
      Seq((1L, "mem://a.h264", stream),
        (2L, "mem://junk.h264", Array[Byte](1, 2))).toDF("id", "uri", "b"),
      "id", "uri", "b")
    val sampled = Multimodal.sampleH264Frames(assets, stride = 2,
      maxFrames = 10).collect().sortBy(a => (a.asset_id, a.frame_idx))
    assert(sampled.map(f => (f.asset_id, f.frame_idx, f.indexed)).toSeq ===
      Seq((1L, 0, true), (1L, 2, true), (1L, 4, true), (2L, -1, false)))
    val keys = Multimodal.sampleH264Frames(assets, stride = 1,
      maxFrames = 10, keyframesOnly = true).collect()
      .filter(_.asset_id == 1L).map(_.frame_idx).sorted.toSeq
    assert(keys === Seq(0, 3), s"keyframe sampling picked $keys")
  }
}
