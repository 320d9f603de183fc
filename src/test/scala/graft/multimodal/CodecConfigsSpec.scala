package graft.multimodal

import graft.SparkSpec

/** Codec-config extraction ([[CodecConfigs]] + the stsd/CodecPrivate
  * routing): AV1/VP9 records parse with the right profile/level/
  * bit-depth, spans slice back to the exact record bytes, malformed
  * records are visible-but-flagged, and the Spark operator unifies
  * MP4 and Matroska carriage.
  */
class CodecConfigsSpec extends SparkSpec {
  implicit private def s = spark
  import spark.implicits._

  test("av1C records parse profile/level/bit-depth; malformed refuse") {
    val r = CodecConfigs.encodeAv1CRecord(2, 8, highBitdepth = true)
    val f = CodecConfigs.parseAv1C(r, 0, r.length).get
    assert(f === CodecConfigs.ConfigFields("av1C", 2, 8, 10))
    val r12 = CodecConfigs.encodeAv1CRecord(2, 13, highBitdepth = true,
      twelveBit = true)
    assert(CodecConfigs.parseAv1C(r12, 0, r12.length).get.bitDepth === 12)
    val r8 = CodecConfigs.encodeAv1CRecord(0, 0)
    assert(CodecConfigs.parseAv1C(r8, 0, r8.length).get.bitDepth === 8)
    // bad marker/version byte
    val bad0 = r.clone(); bad0(0) = 0x01
    assert(CodecConfigs.parseAv1C(bad0, 0, bad0.length).isEmpty)
    // reserved bits in byte 3
    val bad3 = r.clone(); bad3(3) = 0x20
    assert(CodecConfigs.parseAv1C(bad3, 0, bad3.length).isEmpty)
    // twelve_bit without high_bitdepth is malformed
    val badTw = r.clone(); badTw(2) = 0x2c
    assert(CodecConfigs.parseAv1C(badTw, 0, badTw.length).isEmpty)
    // configOBUs must tile: truncate mid-OBU / trailing junk refuse
    assert(CodecConfigs.parseAv1C(r, 0, r.length - 3).isEmpty)
    assert(CodecConfigs.parseAv1C(r ++ Array[Byte](0x7f), 0,
      r.length + 1).isEmpty)
    // an empty configOBUs section is legal
    assert(CodecConfigs.parseAv1C(r.take(4), 0, 4).isDefined)
  }

  test("vpcC records parse; wrong version/init-size/bit-depth refuse") {
    val r = CodecConfigs.encodeVpcCRecord(2, 41, 10)
    assert(CodecConfigs.parseVpcC(r, 0, r.length).get ===
      CodecConfigs.ConfigFields("vpcC", 2, 41, 10))
    val v0 = r.clone(); v0(0) = 0
    assert(CodecConfigs.parseVpcC(v0, 0, v0.length).isEmpty)
    // nonzero codecInitializationDataSize is not VP8/VP9
    val init = r.clone(); init(11) = 2
    assert(CodecConfigs.parseVpcC(init, 0, init.length).isEmpty)
    // bitDepth outside {8,10,12}
    val bd = r.clone(); bd(6) = (0x9 << 4).toByte
    assert(CodecConfigs.parseVpcC(bd, 0, bd.length).isEmpty)
    // record longer than 12 with zero init size does not tile
    assert(CodecConfigs.parseVpcC(r ++ Array[Byte](0), 0,
      r.length + 1).isEmpty)
  }

  test("VP9 WebM CodecPrivate (feature triples) parses; malformed refuses") {
    val r = CodecConfigs.encodeVp9Private(2, 41, 10)
    assert(CodecConfigs.parseVp9Private(r, 0, r.length).get ===
      CodecConfigs.ConfigFields("vp9cp", 2, 41, 10))
    // unknown ids are skipped (forward-compatible)
    val withUnknown = r ++ Array[Byte](9, 2, 0x11, 0x22)
    assert(CodecConfigs.parseVp9Private(withUnknown, 0,
      withUnknown.length).get.profile === 2)
    // absent features report -1
    val levelOnly = Array[Byte](2, 1, 30)
    assert(CodecConfigs.parseVp9Private(levelOnly, 0, 3).get ===
      CodecConfigs.ConfigFields("vp9cp", -1, 30, -1))
    // a DEFINED id with the wrong length refuses
    val badLen = Array[Byte](1, 2, 0, 0)
    assert(CodecConfigs.parseVp9Private(badLen, 0, 4).isEmpty)
    // broken tiling refuses
    assert(CodecConfigs.parseVp9Private(r, 0, r.length - 1).isEmpty)
    // a bit depth outside {8,10,12} refuses
    val badBd = CodecConfigs.encodeVp9Private(0, 10, 9)
    assert(CodecConfigs.parseVp9Private(badBd, 0, badBd.length).isEmpty)
  }

  test("esds descriptors parse to the AudioSpecificConfig; malformed refuse") {
    val r = CodecConfigs.encodeEsdsRecord(freqIdx = 4, channels = 2)
    assert(CodecConfigs.parseEsds(r, 0, r.length).get ===
      CodecConfigs.AudioConfig("esds", 0x40, 44100, 2))
    // every table rate round-trips
    for ((rate, idx) <- Seq((96000, 0), (48000, 3), (8000, 11))) {
      val rr = CodecConfigs.encodeEsdsRecord(idx, 1)
      assert(CodecConfigs.parseEsds(rr, 0, rr.length).get.sampleRateHz
        === rate, s"idx $idx")
    }
    // HE-AAC object type (aot 5) carries through
    val he = CodecConfigs.encodeEsdsRecord(7, 2, aot = 5)
    assert(CodecConfigs.parseEsds(he, 0, he.length).get ===
      CodecConfigs.AudioConfig("esds", 0x40, 22050, 2))
    // multi-byte expandable lengths parse (0x80-continued)
    val twoByte = Array[Byte](0, 0, 0, 0,
      0x03, 0x80.toByte, 22, 0, 1, 0,
      0x04, 17, 0x40, 0x15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0x05, 2, 0x12, 0x10)
    assert(CodecConfigs.parseEsds(twoByte, 0, twoByte.length).get ===
      CodecConfigs.AudioConfig("esds", 0x40, 44100, 2))
    // bad version, truncation, reserved freq index, escaped AOT refuse
    val v1 = r.clone(); v1(0) = 1
    assert(CodecConfigs.parseEsds(v1, 0, v1.length).isEmpty)
    assert(CodecConfigs.parseEsds(r, 0, r.length - 1).isEmpty)
    val badFreq = r.clone()
    // ASC bytes are the last 2: aot 2, freqIdx 13 (reserved)
    badFreq(r.length - 2) = ((2 << 3) | (13 >> 1)).toByte
    badFreq(r.length - 1) = (((13 & 1) << 7) | (2 << 3)).toByte
    assert(CodecConfigs.parseEsds(badFreq, 0, badFreq.length).isEmpty)
    val aot31 = r.clone()
    aot31(r.length - 2) = ((31 << 3) | (4 >> 1)).toByte
    assert(CodecConfigs.parseEsds(aot31, 0, aot31.length).isEmpty)
    // 24-bit explicit frequency (freqIdx 0xf) parses
    val explicit = Array[Byte](0, 0, 0, 0,
      0x03, 25, 0, 1, 0,
      0x04, 20, 0x40, 0x15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0x05, 5,
      // aot=2(00010) freqIdx=15(1111) freq=44100(24b) chan=2(0100)
      ((2 << 3) | (15 >> 1)).toByte,
      (((15 & 1) << 7) | ((44100 >> 17) & 0x7f)).toByte,
      ((44100 >> 9) & 0xff).toByte,
      ((44100 >> 1) & 0xff).toByte,
      (((44100 & 1) << 7) | (2 << 3)).toByte)
    assert(CodecConfigs.parseEsds(explicit, 0, explicit.length).get ===
      CodecConfigs.AudioConfig("esds", 0x40, 44100, 2))
  }

  test("spec-valid edge shapes are not lumped with corrupt records") {
    // DecoderSpecificInfo is OPTIONAL: MP3-in-mp4a (OTI 0x6B) carries
    // none — the OTI must still be reported
    val noDsi = Array[Byte](0, 0, 0, 0,
      0x03, 18, 0, 1, 0,
      0x04, 13, 0x6b, 0x15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    assert(CodecConfigs.parseEsds(noDsi, 0, noDsi.length).get ===
      CodecConfigs.AudioConfig("esds", 0x6b, -1, -1))
    // dOps InputSampleRate 0 = "unspecified" per RFC 7845, not corrupt
    val r0 = CodecConfigs.encodeDOpsRecord(2, 0)
    assert(CodecConfigs.parseDOps(r0, 0, r0.length).get ===
      CodecConfigs.AudioConfig("dOps", -1, 0, 2))
    // an audio entry TRUNCATED below the fixed fields still names its
    // codec (the video twin's posture), not a flagged asset
    import Mp4Index.{box, full, u32a}
    val shortEntry = box("mp4a", new Array[Byte](4))
    val m4a = box("ftyp", "M4A ".getBytes("ISO-8859-1") ++
      new Array[Byte](4)) ++
      box("moov", box("trak", box("mdia",
        full("hdlr", u32a(Seq(0L)) ++ "soun".getBytes("ISO-8859-1") ++
          new Array[Byte](13)) ++
        box("minf", box("stbl",
          full("stsd", u32a(Seq(1L)) ++ shortEntry))))))
    assert(Mp4Index.audioCodecInfo(m4a) === Some(("mp4a", -1, -1, None)))
  }

  test("dOps records parse; family tiling and bad version refuse") {
    val r = CodecConfigs.encodeDOpsRecord(2, 48000)
    assert(CodecConfigs.parseDOps(r, 0, r.length).get ===
      CodecConfigs.AudioConfig("dOps", -1, 48000, 2))
    val v1 = r.clone(); v1(0) = 1
    assert(CodecConfigs.parseDOps(v1, 0, v1.length).isEmpty)
    // family-0 record with trailing junk does not tile
    assert(CodecConfigs.parseDOps(r ++ Array[Byte](0), 0,
      r.length + 1).isEmpty)
    // family 1 requires the mapping table (2 + channels bytes)
    val fam1 = r.clone(); fam1(10) = 1
    assert(CodecConfigs.parseDOps(fam1, 0, fam1.length).isEmpty)
    val fam1ok = fam1 ++ Array[Byte](1, 1, 0, 1)
    assert(CodecConfigs.parseDOps(fam1ok, 0, fam1ok.length).get
      .channels === 2)
  }

  test("avcC/hvcC field extraction matches the hand-built records") {
    val avcc = Array[Byte](1, 66, 0, 30, 0xff.toByte, 0xe1.toByte,
      0, 4, 0x67, 0x42, 0, 30, 1, 0, 3, 0x68, 0x01, 0x02)
    assert(CodecConfigs.parseAvcC(avcc, 0, avcc.length).get ===
      CodecConfigs.ConfigFields("avcC", 66, 30, 8))
    val hvcc = hvccRecord(bitDepthLuma = 10)
    assert(CodecConfigs.parseHvcC(hvcc, 0, hvcc.length).get ===
      CodecConfigs.ConfigFields("hvcC", 1, 93, 10))
  }

  private def hvccRecord(bitDepthLuma: Int): Array[Byte] =
    Array[Byte](1, 0x01, 0x60, 0, 0, 0, 0, 0, 0, 0, 0, 0, 93,
      0xf0.toByte, 0, 0xfc.toByte, 0xfd.toByte,
      (0xf8 | (bitDepthLuma - 8)).toByte, 0xf8.toByte, 0, 0, 0x03, 0)

  test("MP4 stsd routes av01->av1C and vp09->vpcC; spans slice exactly") {
    val ss = Seq(7, 3).map(n => Array.tabulate[Byte](n)(_.toByte))
    val av1c = CodecConfigs.encodeAv1CRecord(0, 8, highBitdepth = true)
    val mp4Av1 = Mp4Index.encodeSynthetic(ss, syncSamples = Seq(1),
      videoEntry = Some(Mp4Index.videoSampleEntry("av01",
        Some(("av1C", av1c)))))
    val t = Mp4Index.sampleTable(mp4Av1).get
    assert(t.codec === "av01")
    val (s0, e0) = t.avcC.get
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(mp4Av1, s0, e0), av1c))
    val vpcc = CodecConfigs.encodeVpcCRecord(2, 41, 10)
    val mp4Vp9 = Mp4Index.encodeSynthetic(ss, syncSamples = Seq(1),
      videoEntry = Some(Mp4Index.videoSampleEntry("vp09",
        Some(("vpcC", vpcc)))))
    val t2 = Mp4Index.sampleTable(mp4Vp9).get
    assert(t2.codec === "vp09")
    val (s1, e1) = t2.avcC.get
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(mp4Vp9, s1, e1), vpcc))
    // frame indexing is unchanged by the entry swap
    assert(Mp4Index.frameIndex(mp4Av1).get.map(_.byteLen).toSeq
      === Seq(7L, 3L))
  }

  test("videoCodecInfo works without a sample table (CMAF init segment)") {
    import Mp4Index.{box, full, u32a}
    val av1c = CodecConfigs.encodeAv1CRecord(1, 5)
    val stsd = full("stsd", u32a(Seq(1L)) ++
      Mp4Index.videoSampleEntry("av01", Some(("av1C", av1c))))
    val hdlr = full("hdlr", u32a(Seq(0L)) ++
      "vide".getBytes("ISO-8859-1") ++ new Array[Byte](13))
    val init = box("ftyp", "cmfc".getBytes("ISO-8859-1") ++
      new Array[Byte](4)) ++
      box("moov", box("trak", box("mdia", hdlr ++
        box("minf", box("stbl", stsd)))))
    val (fmt, cfg) = Mp4Index.videoCodecInfo(init).get
    assert(fmt === "av01")
    val (cs, ce) = cfg.get
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(init, cs, ce), av1c))
    // junk and non-video-moov refuse
    assert(Mp4Index.videoCodecInfo(Array[Byte](9, 9, 9)).isEmpty)
  }

  test("videoCodecInfo selects the VIDEO trak when audio is declared first") {
    // the audio-first layout real muxers emit: an indexer without the
    // hdlr filter would report the mp4a entry as the codec
    val ss = Seq(Array.tabulate[Byte](6)(_.toByte))
    val mp4 = Mp4Index.encodeSynthetic(ss, syncSamples = Seq(1),
      audioTrakFirst = true)
    val (fmt, cfg) = Mp4Index.videoCodecInfo(mp4).get
    assert(fmt === "avc1" && cfg.isDefined)
    val parsed = CodecConfigs.parse("avcC", mp4, cfg.get._1, cfg.get._2)
    assert(parsed.isDefined && parsed.get.kind === "avcC")
  }

  test("codec-config fields round-trip across the encoder parameter space") {
    for (p <- 0 to 7; lvl <- Seq(0, 9, 19, 31)) {
      val r = CodecConfigs.encodeAv1CRecord(p, lvl)
      assert(CodecConfigs.parseAv1C(r, 0, r.length).get ===
        CodecConfigs.ConfigFields("av1C", p, lvl, 8), s"av1C p=$p l=$lvl")
    }
    for (p <- 0 to 3; lvl <- Seq(10, 41, 62); bd <- Seq(8, 10, 12)) {
      val r = CodecConfigs.encodeVpcCRecord(p, lvl, bd)
      assert(CodecConfigs.parseVpcC(r, 0, r.length).get ===
        CodecConfigs.ConfigFields("vpcC", p, lvl, bd),
        s"vpcC p=$p l=$lvl bd=$bd")
    }
  }

  test("Matroska AV1 CodecPrivate is the av1C record; VP9 has none") {
    val av1c = CodecConfigs.encodeAv1CRecord(0, 12)
    val webm = MkvIndex.encodeSynthetic(
      Seq((Array.tabulate[Byte](5)(_.toByte), true)),
      codecPrivate = Some(av1c), codecId = "V_AV1")
    val vt = MkvIndex.videoTrack(webm).get
    assert(vt.codecId === "V_AV1")
    val (cs, ce) = vt.codecPrivate.get
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(webm, cs, ce), av1c))
    assert(CodecConfigs.kindForMkvCodec("V_AV1") === Some("av1C"))
    // V_VP9's CodecPrivate kind exists but is OPTIONAL (absence is
    // in-band config, not an anomaly); V_VP8 has none at all
    assert(CodecConfigs.kindForMkvCodec("V_VP9") === Some("vp9cp"))
    assert(!CodecConfigs.mkvPrivateRequired("V_VP9"))
    assert(CodecConfigs.mkvPrivateRequired("V_AV1"))
    assert(CodecConfigs.kindForMkvCodec("V_VP8") === None)
    // the frame walk is codec-agnostic — same spans as AVC carriage
    assert(MkvIndex.frameIndex(webm).get.map(_.byteLen).toSeq === Seq(5))
  }

  test("videoCodecConfigs unifies MP4 + Matroska with flagged fallbacks") {
    val frames = Seq(Array.tabulate[Byte](6)(_.toByte))
    val ss = Seq(frames.head)
    val av1cGood = CodecConfigs.encodeAv1CRecord(2, 8, highBitdepth = true)
    val av1cBad = av1cGood.clone(); av1cBad(3) = 0x20 // reserved bits
    val assets = Seq(
      (1L, Mp4Index.encodeSynthetic(ss, Seq(1),
        videoEntry = Some(Mp4Index.videoSampleEntry("av01",
          Some(("av1C", av1cGood)))))),
      (2L, Mp4Index.encodeSynthetic(ss, Seq(1),
        videoEntry = Some(Mp4Index.videoSampleEntry("vp09",
          Some(("vpcC", CodecConfigs.encodeVpcCRecord(0, 21))))))),
      (3L, MkvIndex.encodeSynthetic(frames.map((_, true)),
        codecPrivate = Some(CodecConfigs.encodeAv1CRecord(0, 12)),
        codecId = "V_AV1")),
      (4L, MkvIndex.encodeSynthetic(frames.map((_, true)),
        codecId = "V_VP9")),
      (5L, Array[Byte](9, 9, 9, 9)),
      (6L, Mp4Index.encodeSynthetic(ss, Seq(1),
        videoEntry = Some(Mp4Index.videoSampleEntry("av01",
          Some(("av1C", av1cBad)))))),
      // a codec that REQUIRES a record but carries none: declared
      // kind with -1 span, NOT "none" (reserved for in-band codecs)
      (7L, Mp4Index.encodeSynthetic(ss, Seq(1),
        videoEntry = Some(Mp4Index.videoSampleEntry("avc1", None))))
    ).toDF("id", "bytes")
    val rows = Multimodal.videoCodecConfigs(assets, "id", "bytes")
      .collect().sortBy(_.asset_id).toSeq
    assert(rows.map(r => (r.asset_id, r.container, r.codec, r.kind)) === Seq(
      (1L, "mp4", "av01", "av1C"), (2L, "mp4", "vp09", "vpcC"),
      (3L, "mkv", "V_AV1", "av1C"), (4L, "mkv", "V_VP9", "none"),
      (5L, "", "", ""), (6L, "mp4", "av01", "av1C"),
      (7L, "mp4", "avc1", "avcC")))
    assert(rows.map(r => (r.profile, r.level, r.bit_depth)) === Seq(
      (2, 8, 10), (0, 21, 8), (0, 12, 8), (-1, -1, -1), (-1, -1, -1),
      (-1, -1, -1), (-1, -1, -1)))
    assert(rows.map(_.indexed) ===
      Seq(true, true, true, true, false, true, true))
    // the malformed record's span is still reported (anomaly visible)
    assert(rows(5).config_len === av1cBad.length.toLong)
    assert(rows(3).config_len === -1L)
    assert(rows(6).config_len === -1L)
    // VP9 with its OPTIONAL private present parses as vp9cp
    val vp9 = Multimodal.videoCodecConfigs(
      Seq((1L, MkvIndex.encodeSynthetic(frames.map((_, true)),
        codecPrivate = Some(CodecConfigs.encodeVp9Private(2, 41, 10)),
        codecId = "V_VP9"))).toDF("id", "bytes"),
      "id", "bytes").collect().head
    assert((vp9.kind, vp9.profile, vp9.level, vp9.bit_depth) ===
      ("vp9cp", 2, 41, 10))
  }

  test("videoCodecConfigsByPath matches the byte-column operator (incl file://)") {
    val frames = Seq(Array.tabulate[Byte](6)(_.toByte))
    val mp4 = Mp4Index.encodeSynthetic(frames, Seq(1),
      videoEntry = Some(Mp4Index.videoSampleEntry("av01",
        Some(("av1C", CodecConfigs.encodeAv1CRecord(2, 8,
          highBitdepth = true))))))
    val webmAv1 = MkvIndex.encodeSynthetic(frames.map((_, true)),
      codecPrivate = Some(CodecConfigs.encodeAv1CRecord(0, 12)),
      codecId = "V_AV1")
    val webmVp9 = MkvIndex.encodeSynthetic(frames.map((_, true)),
      codecPrivate = Some(CodecConfigs.encodeVp9Private(0, 21)),
      codecId = "V_VP9")
    val f1 = java.io.File.createTempFile("graft-ccp", ".mp4")
    val f2 = java.io.File.createTempFile("graft-ccp", ".webm")
    val f3 = java.io.File.createTempFile("graft-ccp", ".webm")
    try {
      java.nio.file.Files.write(f1.toPath, mp4)
      java.nio.file.Files.write(f2.toPath, webmAv1)
      java.nio.file.Files.write(f3.toPath, webmVp9)
      val byPath = Multimodal.videoCodecConfigsByPath(
        Seq((1L, f1.getPath), (2L, "file://" + f2.getPath),
          (3L, f3.getPath), (4L, "/nonexistent/clip.mp4"))
          .toDF("id", "path"),
        "id", "path").collect().sortBy(_.asset_id)
      val byBytes = Multimodal.videoCodecConfigs(
        Seq((1L, mp4), (2L, webmAv1), (3L, webmVp9),
          (4L, Array[Byte](9))).toDF("id", "bytes"),
        "id", "bytes").collect().sortBy(_.asset_id)
      // identical rows modulo config_start (detached on the path route)
      assert(byPath.map(r => (r.asset_id, r.container, r.codec, r.kind,
        r.profile, r.level, r.bit_depth, r.config_len, r.indexed)).toSeq
        === byBytes.map(r => (r.asset_id, r.container, r.codec, r.kind,
        r.profile, r.level, r.bit_depth, r.config_len, r.indexed)).toSeq)
      assert(byPath.forall(_.config_start === -1L))
    } finally { f1.delete(); f2.delete(); f3.delete() }
  }

  test("seekable codec info reads headers only on a sparse >2GiB file") {
    // ftyp + a sparse >2GiB mdat + moov(co64): videoCodecInfoSeekable
    // must index the codec config from box headers + moov alone
    val moov = Mp4Index.encodeMoovCo64(
      offsets = Seq(40L, (1L << 31) + 1000L),
      sizes = Seq(100L, 100L), syncSamples = Seq(1))
    val ftyp = {
      val b = java.nio.ByteBuffer.allocate(16)
      b.putInt(16).put("ftyp".getBytes("ISO-8859-1"))
        .put("isom".getBytes("ISO-8859-1")).putInt(0)
      b.array()
    }
    val mdatLen = (1L << 31) + 4096L
    val f = java.io.File.createTempFile("graft-bigcc", ".mp4")
    try {
      val raf = new java.io.RandomAccessFile(f, "rw")
      raf.write(ftyp)
      // mdat header with 64-bit size (size==1 + largesize)
      val hdr = java.nio.ByteBuffer.allocate(16)
      hdr.putInt(1).put("mdat".getBytes("ISO-8859-1")).putLong(mdatLen)
      raf.write(hdr.array())
      raf.setLength(16 + mdatLen) // sparse payload
      raf.seek(16 + mdatLen)
      raf.write(moov)
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
      val (fmt, rec) =
        try Mp4Index.videoCodecInfoSeekable(counting).get
        finally counting.close()
      assert(fmt === "avc1" && rec.isDefined)
      assert(CodecConfigs.parseAvcC(rec.get, 0, rec.get.length).isDefined)
      assert(bytesRead < 10000L, s"read $bytesRead bytes")
    } finally f.delete()
  }
}
