package graft.multimodal

import graft.SparkSpec

/** [[H265]]: HEVC access-unit indexing over both framings must group
  * continuation slices, flag IRAP frames, cover prefix parameter
  * sets, and sniff strictly enough that H.264 streams (and junk) can
  * never be claimed — in either direction.
  */
class H265Spec extends SparkSpec {

  test("Annex-B: AU spans partition the stream, IRAP flagged, prefix NALs attach forward") {
    val idrs = Seq(true, false, false, true, false)
    val s = H265.encodeSynthetic(idrs, extraSlices = 1)
    val spans = H265.frameIndexAnnexB(s).get
    assert(spans.length === 5)
    // VPS+SPS+PPS (3×8) ride with frame 0; every frame is a primary +
    // one continuation slice at 8 B per NAL
    assert(spans.map(_.byteStart) === Seq(0, 40, 56, 72, 88))
    assert(spans.map(_.byteLen) === Seq(40, 16, 16, 16, 16))
    assert(spans.map(_.isIdr) === idrs)
    // spans tile the stream exactly
    assert(spans.map(_.byteLen).sum === s.length)
  }

  test("hvcC: record is 50 B, spans cover sample bytes only, lengthSize variants agree") {
    val idrs = Seq(true, false, true)
    for (ls <- Seq(1, 2, 4)) {
      val s = H265.encodeSyntheticHvcc(idrs, extraSlices = 1, lengthSize = ls)
      val cfg = H265.parseConfig(s).get
      assert(cfg.headerLen === 50 && cfg.lengthSize === ls, s"ls=$ls")
      val spans = H265.frameIndexHvcc(s).get
      assert(spans.length === 3, s"ls=$ls")
      assert(spans.head.byteStart === 50, s"ls=$ls")
      assert(spans.map(_.isIdr) === idrs, s"ls=$ls")
      assert(spans.map(_.byteLen).sum === s.length - 50, s"ls=$ls")
    }
  }

  test("cross-codec sniff: H.264 streams refuse as HEVC and vice versa, both framings") {
    val h264b = H264AnnexB.encodeSynthetic(Seq(true, false), extraSlices = 1)
    val h264c = H264Avcc.encodeSynthetic(Seq(true, false))
    val h265b = H265.encodeSynthetic(Seq(true, false))
    val h265c = H265.encodeSyntheticHvcc(Seq(true, false))
    // H.264 bytes must not index as HEVC (slice payload 0x80 →
    // temporal_id_plus1 == 0 fails the whole-stream header check)
    assert(H265.frameIndexAnnexB(h264b).isEmpty)
    assert(H265.frameIndexHvcc(h264c).isEmpty)
    // HEVC bytes must not index as H.264 (no NAL aliases slice 1/5)
    assert(H264AnnexB.frameIndex(h265b).isEmpty)
    assert(H264Avcc.frameIndex(h265c).isEmpty)
    // and junk refuses everywhere
    for (junk <- Seq(Array[Byte](9, 9, 9, 9), Array.empty[Byte])) {
      assert(H265.frameIndexAnnexB(junk).isEmpty)
      assert(H265.frameIndexHvcc(junk).isEmpty)
    }
  }

  test("strictness: truncations, reserved-bit damage, and paramset-less records refuse") {
    val good = H265.encodeSyntheticHvcc(Seq(true, false, false))
    for (cut <- Seq(10, 22, 49, good.length - 1, good.length - 5)) {
      assert(H265.frameIndexHvcc(good.take(cut)).isEmpty, s"cut=$cut")
    }
    // flip each validated reserved-bit position: the parse must refuse
    for (pos <- Seq(13, 15, 16, 17, 18)) {
      val bad = good.clone()
      bad(pos) = (bad(pos) & 0x0f).toByte
      assert(H265.parseConfig(bad).isEmpty, s"pos=$pos")
    }
    // zero arrays (no parameter sets) is not a real hvcC
    val noArrays = good.clone()
    noArrays(22) = 0
    assert(H265.parseConfig(noArrays).isEmpty)
    // Annex-B truncation mid-NAL still refuses or stays exact — the
    // final AU's span must never exceed the bytes
    val ab = H265.encodeSynthetic(Seq(true, false))
    val cutAb = H265.frameIndexAnnexB(ab.take(ab.length - 3))
    assert(cutAb.forall(sp => sp.map(_.byteLen).sum <= ab.length - 3))
  }

  test("sampler integration: the five-way sniff routes each framing correctly") {
    import spark.implicits._
    val idrs = Seq(true, false, true)
    val assets = Seq(
      (1L, "mem://a.h265", H265.encodeSynthetic(idrs)),
      (2L, "mem://b.hevc", H265.encodeSyntheticHvcc(idrs)),
      (3L, "mem://c.h264", H264AnnexB.encodeSynthetic(idrs)),
      (4L, "mem://d.264", H264Avcc.encodeSynthetic(idrs))
    ).toDF("id", "uri", "bytes")
    val out = Multimodal.sampleH264Frames(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(spark),
        stride = 1, maxFrames = 10)(spark)
      .collect().groupBy(_.asset_id)
    // every asset indexes (no fallback rows), three frames each, with
    // the same IRAP pattern — the framings agree on the logical index
    (1L to 4L).foreach { id =>
      val rows = out(id).sortBy(_.frame_idx)
      assert(rows.forall(_.indexed), s"asset $id")
      assert(rows.map(_.is_idr).toSeq === idrs, s"asset $id")
    }
  }
}
