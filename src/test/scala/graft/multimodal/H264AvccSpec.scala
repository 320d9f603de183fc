package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[H264Avcc]]: the length-prefixed walk must index the SAME frame
  * structure as the Annex-B walk on the same logical stream, parse
  * strictly (the sniff-order safety contract), and honor every legal
  * lengthSize.
  */
class H264AvccSpec extends AnyFunSuite {

  test("frame structure matches Annex-B on the same logical stream") {
    val idrs = Seq(true, false, true, false, false)
    val avcc = H264Avcc.encodeSynthetic(idrs, extraSlices = 2)
    val spans = H264Avcc.frameIndex(avcc).get
    assert(spans.map(_.frameIdx) === (0 until 5))
    assert(spans.map(_.isIdr) === idrs)
    // spans tile the sample bytes exactly: config excluded, no gaps
    val cfg = H264Avcc.parseConfig(avcc).get
    assert(spans.head.byteStart === cfg.headerLen)
    spans.sliding(2).foreach { case Seq(a, b) =>
      assert(a.byteStart + a.byteLen === b.byteStart)
    }
    assert(spans.last.byteStart + spans.last.byteLen === avcc.length)
    // same AU count and IDR pattern as the Annex-B twin
    val annexb = H264AnnexB.frameIndex(
      H264AnnexB.encodeSynthetic(idrs, extraSlices = 2)).get
    assert(annexb.map(_.isIdr) === spans.map(_.isIdr))
    assert(annexb.length === spans.length)
  }

  test("every legal lengthSize walks; reserved size 3 is rejected") {
    for (ls <- Seq(1, 2, 4)) {
      val b = H264Avcc.encodeSynthetic(Seq(true, false), lengthSize = ls)
      val spans = H264Avcc.frameIndex(b).get
      assert(spans.length === 2, s"lengthSize $ls")
      assert(spans.map(_.byteLen).forall(_ === ls + 3), s"lengthSize $ls")
    }
    // a record claiming the reserved lengthSizeMinusOne == 2 must not parse
    val bad = H264Avcc.encodeSynthetic(Seq(true), lengthSize = 4).clone()
    bad(4) = (0xfc | 2).toByte
    assert(H264Avcc.frameIndex(bad).isEmpty)
  }

  test("strict parse: Annex-B bytes, junk, and truncations all None") {
    val annexb = H264AnnexB.encodeSynthetic(Seq(true, false))
    assert(H264Avcc.frameIndex(annexb).isEmpty,
      "Annex-B stream must fail the AVCC sniff (version byte)")
    assert(H264Avcc.frameIndex(Array[Byte](9, 9, 9, 9)).isEmpty)
    assert(H264Avcc.frameIndex(Array.empty[Byte]).isEmpty)
    val good = H264Avcc.encodeSynthetic(Seq(true, false, true))
    // truncating anywhere inside the NAL stream breaks the exact-walk
    // termination; truncating the config breaks the record parse
    for (cut <- Seq(3, 10, good.length - 1, good.length - 3)) {
      assert(H264Avcc.frameIndex(good.take(cut)).isEmpty, s"cut=$cut")
    }
  }

  test("High-profile avcC: extension bytes consumed; lenient omission still indexes") {
    // ISO 14496-15 appends chroma/bit-depth/SPS-ext fields for
    // profile_idc 100/110/122/144 — the most common real-world H.264
    // profile. Treating the extension as NAL bytes would fail the
    // exact walk and silently drop exactly the corpora this feature
    // targets.
    val withExt = H264Avcc.encodeSynthetic(Seq(true, false), profile = 100)
    val cfg = H264Avcc.parseConfig(withExt).get
    assert(cfg.altHeaderLen.isDefined &&
      cfg.headerLen > cfg.altHeaderLen.get,
      "High-profile record must consume the extension as primary")
    val spans = H264Avcc.frameIndex(withExt).get
    assert(spans.map(_.isIdr) === Seq(true, false))
    // lenient muxers omit the extension even for High profiles: the
    // record must still parse (extension-less end as primary)
    val lenient = H264Avcc.encodeSynthetic(Seq(true, false)).clone()
    lenient(1) = 100.toByte
    assert(H264Avcc.frameIndex(lenient).get.map(_.isIdr)
      === Seq(true, false))
  }

  test("a length prefix that impersonates a start code stays AVCC-parsed") {
    // 4-byte length 0x000001XX is byte-identical to an Annex-B start
    // code — the reason the sampler sniffs AVCC FIRST. Build a clip
    // with one 258-byte slice NAL (length prefix 00 00 01 02).
    val idr = H264Avcc.encodeSynthetic(Seq(true), lengthSize = 4)
    val cfg = H264Avcc.parseConfig(idr).get
    val out = new java.io.ByteArrayOutputStream()
    out.write(idr, 0, cfg.headerLen)
    out.write(Array[Byte](0, 0, 1, 2)) // length 258
    out.write(0x65)                    // IDR slice header
    out.write(0x80)                    // first_mb_in_slice = 0
    out.write(new Array[Byte](256))    // payload padding
    val bytes = out.toByteArray
    val spans = H264Avcc.frameIndex(bytes).get
    assert(spans.length === 1)
    assert(spans.head.byteStart === cfg.headerLen)
    assert(spans.head.byteLen === 4 + 258)
    assert(spans.head.isIdr)
  }
}
