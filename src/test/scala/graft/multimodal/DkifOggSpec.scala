package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[DkifIndex]] + [[OggIndex]]: the IVF frame walk and the Ogg page
  * walk must emit exact byte ranges, read each codec's keyframe
  * signal per its public spec, validate CRCs, and refuse junk and the
  * other containers in both directions.
  */
class DkifOggSpec extends AnyFunSuite {

  private def fr(n: Int, i: Int): Array[Byte] =
    Array.tabulate[Byte](n)(j => ((i * 37 + j + 1) & 0x7f).toByte)

  test("DKIF: per-codec keyframe flags and exact spans") {
    val frames = Seq((fr(5, 0), true), (fr(7, 1), false), (fr(6, 2), true))
    for (codec <- Seq("VP80", "VP90", "AV01")) {
      val b = DkifIndex.encodeSynthetic(codec, frames)
      val got = DkifIndex.frameIndex(b).get
      assert(got.length === 3, codec)
      assert(got.map(_.isIdr) === Seq(true, false, true), codec)
      // spans tile [32, end) exactly with 12-byte headers between
      assert(got.head.byteStart === 44, codec)
      assert(got.map(_.byteLen).sum + 32 + 3 * 12 === b.length, codec)
      got.foreach { sp =>
        assert(sp.byteStart + sp.byteLen <= b.length, codec)
      }
    }
  }

  test("DKIF strictness: counts, truncations, junk, cross-container") {
    val frames = Seq((fr(5, 0), true), (fr(7, 1), false))
    val good = DkifIndex.encodeSynthetic("VP90", frames)
    // stale declared count 0 tolerated; a wrong nonzero count refuses
    assert(DkifIndex.frameIndex(
      DkifIndex.encodeSynthetic("VP90", frames, declaredCount = 0)).isDefined)
    assert(DkifIndex.frameIndex(
      DkifIndex.encodeSynthetic("VP90", frames, declaredCount = 5)).isEmpty)
    for (cut <- Seq(10, 33, good.length - 1, good.length - 6)) {
      assert(DkifIndex.frameIndex(good.take(cut)).isEmpty, s"cut=$cut")
    }
    assert(DkifIndex.frameIndex(Array[Byte](9, 9, 9, 9)).isEmpty)
    assert(DkifIndex.frameIndex(
      Mp4Index.encodeSynthetic(Seq(fr(4, 0)), Seq(1))).isEmpty)
    assert(DkifIndex.frameIndex(
      MkvIndex.encodeSynthetic(Seq((fr(4, 0), true)))).isEmpty)
    // and DKIF bytes are not claimed by the other walkers
    assert(Mp4Index.frameIndex(good).isEmpty)
    assert(MkvIndex.frameIndex(good).isEmpty)
    assert(H264Avcc.frameIndex(good).isEmpty)
  }

  test("AV1: an UNSIZED trailing sequence-header OBU still flags the keyframe") {
    // spec 5.2 allows obu_has_size_field=0 for the last OBU; a
    // keyframe laid out [sized OBU_FRAME][unsized OBU_SEQUENCE_HEADER]
    // must not be misflagged non-key
    val payload = Array[Byte](
      0x32, 0x02, 0x7f, 0x33, // sized OBU_FRAME (type 6), len 2
      0x08, 0x55, 0x66)       // UNSIZED OBU_SEQUENCE_HEADER (type 1)
    val b = {
      // hand-wrap in the IVF shell: reuse encodeSynthetic's header by
      // encoding a placeholder frame, then substituting the payload
      val shell = DkifIndex.encodeSynthetic("AV01", Seq((fr(7, 0), false)))
      // placeholder AV1 payload is 7+4=11 B; ours is 7 B — rebuild
      // the frame header (12 B at offset 32) + payload by hand
      val out = new java.io.ByteArrayOutputStream()
      out.write(shell, 0, 32)
      out.write(Array[Byte](7, 0, 0, 0)) // u32LE size
      out.write(new Array[Byte](8))      // pts
      out.write(payload)
      out.toByteArray
    }
    val got = DkifIndex.frameIndex(b).get
    assert(got.length === 1 && got.head.isIdr)
  }

  test("Ogg: page spans, granules, packet counts, 255-multiple lacing") {
    val pages = Seq(
      (Seq(fr(19, 0)), 0L, true, false),          // BOS (OpusHead shape)
      (Seq(fr(10, 1), fr(300, 2)), 960L, false, false),
      (Seq(fr(5, 3)), 1920L, false, true))        // EOS
    val b = OggIndex.encodeSynthetic(pages)
    val got = OggIndex.pageIndex(b).get
    assert(got.length === 3)
    // page lengths: 27+1+19=47; 27+3+310=340 (300 laces as 255+45);
    // 27+1+5=33
    assert(got.map(p => (p.byteStart, p.byteLen)) ===
      Seq((0, 47), (47, 340), (387, 33)))
    assert(got.map(_.granule) === Seq(0L, 960L, 1920L))
    assert(got.map(_.packetsCompleted) === Seq(1, 2, 1))
    assert(got.map(_.isBos) === Seq(true, false, false))
    assert(got.map(_.isEos) === Seq(false, false, true))
    // a packet of EXACTLY 255 bytes laces as [255, 0]: still 1 packet
    val exact = OggIndex.encodeSynthetic(
      Seq((Seq(fr(255, 0)), 0L, true, true)))
    val g2 = OggIndex.pageIndex(exact).get
    assert(g2.head.packetsCompleted === 1)
    assert(g2.head.byteLen === 27 + 2 + 255)
  }

  test("Ogg strictness: CRC damage, non-BOS start, truncation, junk all refuse") {
    val good = OggIndex.encodeSynthetic(
      Seq((Seq(fr(19, 0)), 0L, true, false), (Seq(fr(8, 1)), 960L, false, true)))
    assert(OggIndex.pageIndex(good).isDefined)
    // flip one data byte: the page CRC must catch it
    val bad = good.clone()
    bad(40) = (bad(40) ^ 0x01).toByte
    assert(OggIndex.pageIndex(bad).isEmpty)
    // a stream not starting with a BOS page refuses
    val noBos = OggIndex.encodeSynthetic(
      Seq((Seq(fr(19, 0)), 0L, false, false)))
    assert(OggIndex.pageIndex(noBos).isEmpty)
    for (cut <- Seq(4, 26, good.length - 1)) {
      assert(OggIndex.pageIndex(good.take(cut)).isEmpty, s"cut=$cut")
    }
    assert(OggIndex.pageIndex(Array[Byte](9, 9, 9)).isEmpty)
    assert(OggIndex.pageIndex(
      Mp3Frames.encodeSynthetic(Seq((9, 0), (9, 0)))).isEmpty)
    // duplicate page sequence numbers refuse (per-serial ordering):
    // two concatenated copies repeat seq 0 for the same serial
    assert(OggIndex.pageIndex(good ++ good).isEmpty)
  }

  private def withTempFile[A](bytes: Array[Byte])(
      f: Mp4Index.RangeReader => A): A = {
    val t = java.io.File.createTempFile("graft-seek", ".bin")
    try {
      java.nio.file.Files.write(t.toPath, bytes)
      val r = new Mp4Index.FileRangeReader(t.getPath)
      try f(r) finally r.close()
    } finally t.delete()
  }

  test("seekable DKIF agrees with the in-memory walk across codecs") {
    for (codec <- Seq("VP80", "VP90", "AV01")) {
      val b = DkifIndex.encodeSynthetic(codec,
        Seq((fr(50, 0), true), (fr(70, 1), false), (fr(60, 2), true)))
      val mem = DkifIndex.frameIndex(b).get
      val seek = withTempFile(b)(DkifIndex.frameIndexSeekable(_)).get
      assert(seek.map(s => (s.byteStart, s.byteLen, s.isIdr)) ===
        mem.map(s => (s.byteStart.toLong, s.byteLen.toLong, s.isIdr)),
        codec)
    }
    // junk refuses through the reader too
    assert(withTempFile(Array[Byte](9, 9, 9, 9))(
      DkifIndex.frameIndexSeekable(_)).isEmpty)
  }

  test("seekable DKIF: a sparse >2GiB VP9 capture indexes from headers + 1-byte probes") {
    val small = DkifIndex.encodeSynthetic("VP90", Seq((fr(50, 0), true)))
    val hdr = small.take(32)
    hdr(24) = 2 // declared frame count = 2
    val bigLen = 2300000000L
    val f = java.io.File.createTempFile("graft-bigivf", ".ivf")
    try {
      val raf = new java.io.RandomAccessFile(f, "rw")
      raf.write(hdr)
      // frame 0: u32LE size = bigLen, u64LE pts, then 1 signal byte +
      // a sparse hole
      (0 until 4).foreach(j => raf.write(((bigLen >> (8 * j)) & 0xff).toInt))
      raf.write(new Array[Byte](8))
      val data0 = raf.getFilePointer
      raf.write(0x82) // VP9 keyframe signal byte
      raf.setLength(data0 + bigLen) // sparse payload
      // frame 1: a small non-key frame after the hole
      raf.seek(data0 + bigLen)
      (0 until 4).foreach(j => raf.write((40L >> (8 * j) & 0xff).toInt))
      raf.write(new Array[Byte](8))
      val data1 = raf.getFilePointer
      raf.write(0x86) // non-key
      raf.write(new Array[Byte](39))
      raf.close()
      assert(f.length > Int.MaxValue.toLong)
      var bytesRead = 0L
      val inner = new Mp4Index.FileRangeReader(f.getPath)
      val counting = new Mp4Index.RangeReader {
        def length: Long = inner.length
        def readFully(at: Long, len: Int): Array[Byte] = {
          bytesRead += len; inner.readFully(at, len)
        }
        def close(): Unit = inner.close()
      }
      val spans = try DkifIndex.frameIndexSeekable(counting).get
        finally counting.close()
      assert(spans.map(s => (s.byteStart, s.byteLen, s.isIdr)) ===
        Seq((data0, bigLen, true), (data1, 40L, false)))
      assert(bytesRead < 100L, s"read $bytesRead bytes")
    } finally f.delete()
  }

  test("seekable AV1: a probe ending inside the seq-header OBU still flags the keyframe") {
    // keyframes lead with a SIZED OBU_SEQUENCE_HEADER (0x0a); with a
    // 1-byte probe the leb128 size byte lies past the prefix — the
    // OBU type is already known and must keep its keyframe credit
    val b = DkifIndex.encodeSynthetic("AV01",
      Seq((fr(50, 0), true), (fr(50, 1), false)))
    for (probe <- Seq(1, 2, 4, 1 << 16)) {
      val got = withTempFile(b)(
        DkifIndex.frameIndexSeekable(_, av1ProbeBytes = probe)).get
      assert(got.map(_.isIdr) === Seq(true, false), s"probe=$probe")
    }
  }

  test("seekable Ogg agrees with the in-memory walk; CRC damage caught when validating") {
    val b = OggIndex.encodeSynthetic(Seq(
      (Seq(fr(19, 0)), 0L, true, false),
      (Seq(fr(10, 1), fr(300, 2)), 960L, false, false),
      (Seq(fr(5, 3)), 1920L, false, true)))
    val mem = OggIndex.pageIndex(b).get
    for (crc <- Seq(true, false)) {
      val seek = withTempFile(b)(OggIndex.pageIndexSeekable(_, crc)).get
      assert(seek.map(p => (p.byteStart, p.byteLen, p.granule,
          p.packetsCompleted, p.isBos, p.isEos)) ===
        mem.map(p => (p.byteStart.toLong, p.byteLen.toLong, p.granule,
          p.packetsCompleted, p.isBos, p.isEos)), s"crc=$crc")
    }
    val bad = b.clone(); bad(40) = (bad(40) ^ 0x01).toByte
    assert(withTempFile(bad)(OggIndex.pageIndexSeekable(_)).isEmpty)
    // structural checks still hold without CRC: the flip is in DATA,
    // so the no-CRC walk accepts it (documented trusted-corpus path)
    assert(withTempFile(bad)(
      OggIndex.pageIndexSeekable(_, validateCrc = false)).isDefined)
    assert(withTempFile(Array[Byte](9, 9, 9))(
      OggIndex.pageIndexSeekable(_)).isEmpty)
  }

  test("seekable Ogg: a sparse >2GiB capture indexes header-only when not validating") {
    // max-size pages: 255 lacing entries of 255 → 65307 B per page
    val pageLen = 27 + 255 + 255 * 255
    val nPages = (Int.MaxValue.toLong + 1) / pageLen + 2
    val f = java.io.File.createTempFile("graft-bigogg", ".opus")
    try {
      val raf = new java.io.RandomAccessFile(f, "rw")
      raf.setLength(nPages * pageLen) // holes for all payloads
      val hdr = new Array[Byte](27 + 255)
      "OggS".getBytes("ISO-8859-1").copyToArray(hdr, 0)
      java.util.Arrays.fill(hdr, 27, 27 + 255, 0xff.toByte)
      hdr(26) = 0xff.toByte
      var p = 0
      while (p < nPages) {
        hdr(5) = (if (p == 0) 0x02 else if (p == nPages - 1) 0x04
          else 0x01).toByte
        (0 until 8).foreach(j =>
          hdr(6 + j) = (((p * 960L) >> (8 * j)) & 0xff).toByte)
        hdr(14) = 0x34; hdr(15) = 0x12 // serial
        (0 until 4).foreach(j => hdr(18 + j) = ((p >> (8 * j)) & 0xff).toByte)
        raf.seek(p.toLong * pageLen)
        raf.write(hdr)
        p += 1
      }
      raf.close()
      assert(f.length > Int.MaxValue.toLong)
      var bytesRead = 0L
      val inner = new Mp4Index.FileRangeReader(f.getPath)
      val counting = new Mp4Index.RangeReader {
        def length: Long = inner.length
        def readFully(at: Long, len: Int): Array[Byte] = {
          bytesRead += len; inner.readFully(at, len)
        }
        def close(): Unit = inner.close()
      }
      val pages = try OggIndex.pageIndexSeekable(counting,
        validateCrc = false).get finally counting.close()
      assert(pages.length === nPages)
      assert(pages.head.isBos && pages.last.isEos)
      assert(pages.last.byteStart + pages.last.byteLen === f.length)
      assert(pages(1).isContinued && pages(1).packetsCompleted === 0)
      // header+lacing only: 282 B per page, zero payload bytes
      assert(bytesRead === nPages * 282L, s"read $bytesRead bytes")
    } finally f.delete()
  }
}
