package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit private def s = spark

  private def assets = Seq(
    (1L, "s3://bucket/cat.jpg", Array[Byte](1, 2, 3, 4)),
    (2L, "s3://bucket/dog.PNG", Array[Byte](5, 6)),
    (3L, "s3://bucket/song.mp3", Array[Byte](7)),
    (4L, "s3://bucket/clip.mp4", Array[Byte](8, 9)),
    (5L, "s3://bucket/readme.txt", Array[Byte](10))
  ).toDF("id", "uri", "bytes")

  test("toMediaAssets derives kind from suffix and length from bytes") {
    val media = Multimodal.toMediaAssets(assets, "id", "uri", "bytes")
    val kinds = media.collect().map(a => a.asset_id -> a.kind).toMap
    assert(kinds === Map(1L -> "image", 2L -> "image", 3L -> "audio",
      4L -> "video", 5L -> "unknown"))
    assert(media.filter(_.asset_id == 1L).head().content_length === 4L)
  }

  test("extractImageFeatures processes only images, deterministically") {
    val media = Multimodal.toMediaAssets(assets, "id", "uri", "bytes")
    val feats = Multimodal.extractImageFeatures(media).collect()
      .sortBy(_.asset_id)
    assert(feats.map(_.asset_id).toSeq === Seq(1L, 2L))
    val again = Multimodal.extractImageFeatures(media).collect()
      .sortBy(_.asset_id)
    assert(feats.toSeq === again.toSeq) // stub is deterministic
    // fake bytes are undecodable -> flagged stub fallback
    assert(feats.forall(f => !f.decoded && f.width >= 64 && f.height >= 64 &&
      f.channels >= 1 && f.mean_luma >= 0.0 && f.mean_luma <= 1.0))
  }

  private def pngBytes(w: Int, h: Int, rgb: Int, format: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("real PNG/JPEG bytes decode via the JDK codec with exact dimensions and luma") {
    val media = Multimodal.toMediaAssets(Seq(
      (10L, "s3://b/white.png", pngBytes(3, 2, 0xFFFFFF)),
      (11L, "s3://b/black.png", pngBytes(5, 4, 0x000000)),
      (12L, "s3://b/grey.jpg", pngBytes(8, 8, 0x808080, "jpg")),
      (13L, "s3://b/junk.png", Array[Byte](1, 2, 3))
    ).toDF("id", "uri", "bytes"), "id", "uri", "bytes")
    val f = Multimodal.extractImageFeatures(media).collect()
      .map(x => x.asset_id -> x).toMap
    assert(f(10L).decoded && f(10L).width === 3 && f(10L).height === 2 &&
      f(10L).channels === 3 && math.abs(f(10L).mean_luma - 1.0) < 1e-9)
    assert(f(11L).decoded && f(11L).width === 5 && f(11L).height === 4 &&
      f(11L).mean_luma === 0.0)
    // jpeg is lossy: grey comes back near 0x80
    assert(f(12L).decoded && f(12L).width === 8 &&
      math.abs(f(12L).mean_luma - 128.0 / 255.0) < 0.05)
    // junk bytes: flagged fallback, not a crash or a dropped row
    assert(!f(13L).decoded)
  }

  private def wavBytes(rate: Float, nFrames: Int, amplitude: Short): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, 1, true, false) // 16-bit mono PCM LE
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s: Short = if (i % 2 == 0) amplitude else (-amplitude).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV bytes decode via the JDK codec with exact format and RMS") {
    val media = Multimodal.toMediaAssets(Seq(
      (20L, "s3://b/square.wav", wavBytes(8000f, 800, 16384)),
      (21L, "s3://b/junk.wav", Array[Byte](1, 2, 3, 4))
    ).toDF("id", "uri", "bytes"), "id", "uri", "bytes")
    val f = Multimodal.extractAudioFeatures(media).collect()
      .map(x => x.asset_id -> x).toMap
    val sq = f(20L)
    assert(sq.decoded && sq.sample_rate === 8000.0 && sq.channels === 1 &&
      sq.n_frames === 800L)
    assert(math.abs(sq.duration_sec - 0.1) < 1e-9)
    // square wave at 16384/32768 -> rms exactly 0.5
    assert(math.abs(sq.rms - 0.5) < 1e-12, sq.rms.toString)
    assert(!f(21L).decoded)
  }

  test("resizeImages produces decodable images at the target shape; junk passes through") {
    val media = Multimodal.toMediaAssets(Seq(
      (30L, "s3://b/big.png", pngBytes(64, 48, 0x00FF00)),
      (31L, "s3://b/junk.png", Array[Byte](5, 5))
    ).toDF("id", "uri", "bytes"), "id", "uri", "bytes")
    val out = Multimodal.resizeImages(media, 8, 8).collect()
      .map(r => r.asset_id -> r).toMap
    assert(out(30L).decoded && out(30L).width === 8 && out(30L).height === 8)
    // the re-encoded bytes are a real 8x8 PNG; solid green survives resampling
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(30L).content))
    assert(back.getWidth === 8 && back.getHeight === 8)
    assert((back.getRGB(4, 4) & 0xFFFFFF) === 0x00FF00)
    // junk passes through unchanged, flagged
    assert(!out(31L).decoded && out(31L).content.toSeq === Seq[Byte](5, 5))
  }

  test("sampleFrameIndexes fans out stride-spaced frames per video") {
    val media = Multimodal.toMediaAssets(assets, "id", "uri", "bytes")
    val frames = Multimodal.sampleFrameIndexes(media, stride = 10, maxFrames = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(frames.toSeq === Seq((4L, 0), (4L, 10), (4L, 20), (4L, 30)))
  }

  test("repartitionForMedia sizes partitions by bytes") {
    val media = Multimodal.toMediaAssets(assets, "id", "uri", "bytes")
    val repart = Multimodal.repartitionForMedia(media,
      targetBytesPerPartition = 4L)
    assert(repart.rdd.getNumPartitions === 2) // 10 bytes / 4 per part
    assert(repart.count() === 5)
  }

  private def patternImage(w: Int, h: Int)(
      f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    img
  }

  test("imageAHash64 is resolution-independent and order-of-magnitude separated") {
    // same checkerboard rendered at 16x16 and 64x64: every pixel of a
    // grid cell carries the same color, so the 8x8 cell means — and
    // the hash — must be bit-identical across resolutions
    def checker(px: Int): java.awt.image.BufferedImage =
      patternImage(px, px) { (x, y) =>
        val c = px / 8
        if (((x / c) + (y / c)) % 2 == 0) 0xFFFFFF else 0x000000
      }
    val h16 = Multimodal.imageAHash64(checker(16))
    val h64 = Multimodal.imageAHash64(checker(64))
    assert(h16 === h64)
    // the inverse board must flip every bit
    val inv = patternImage(16, 16) { (x, y) =>
      if (((x / 2) + (y / 2)) % 2 == 0) 0x000000 else 0xFFFFFF
    }
    assert(java.lang.Long.bitCount(h16 ^ Multimodal.imageAHash64(inv)) === 64)
    // one flipped 2x2 block = exactly one bit of distance
    val oneOff = patternImage(16, 16) { (x, y) =>
      val base = ((x / 2) + (y / 2)) % 2 == 0
      val white = if (x < 2 && y < 2) !base else base
      if (white) 0xFFFFFF else 0x000000
    }
    assert(java.lang.Long.bitCount(h16 ^ Multimodal.imageAHash64(oneOff)) === 1)
  }

  private def wavEnv(loud: Int => Boolean, samplesPerSeg: Int,
      amp: Short = 16384): Array[Byte] = {
    import javax.sound.sampled._
    val nFrames = 64 * samplesPerSeg
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s: Short =
        if (!loud(i / samplesPerSeg)) 0
        else if (i % 2 == 0) amp else (-amp).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioAHash64 is duration-independent and separates envelopes") {
    // same alternating envelope at 100 and 400 samples/segment: every
    // sample of a segment carries the same RMS, so the 64-segment
    // envelope — and the hash — must be bit-identical across durations
    val alt = (seg: Int) => seg % 2 == 0
    val h100 = Multimodal.audioAHash64(wavEnv(alt, 100)).get
    val h400 = Multimodal.audioAHash64(wavEnv(alt, 400)).get
    assert(h100 === h400)
    // muting one loud segment = exactly one bit of distance
    val mute1 = Multimodal.audioAHash64(
      wavEnv(seg => seg % 2 == 0 && seg != 4, 100)).get
    assert(java.lang.Long.bitCount(h100 ^ mute1) === 1)
    // the inverted envelope flips every bit
    val inv = Multimodal.audioAHash64(wavEnv(seg => seg % 2 == 1, 100)).get
    assert(java.lang.Long.bitCount(h100 ^ inv) === 64)
    // constant loudness has no above-mean segment: hash 0
    assert(Multimodal.audioAHash64(wavEnv(_ => true, 100)).get === 0L)
    // junk bytes and sub-64-sample clips refuse, not garbage
    assert(Multimodal.audioAHash64(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("extractVideoHashes takes the per-bit majority across sampled frames") {
    import graft.multimodal.AviMjpeg
    // half-black/half-white frames: JPEG-exact (the step edge rides the
    // 8-pixel block boundary), aHash = the right-half cell mask
    val base = patternImage(16, 16)((x, _) =>
      if (x >= 8) 0xFFFFFF else 0x000000)
    val inv = patternImage(16, 16)((x, _) =>
      if (x >= 8) 0x000000 else 0xFFFFFF)
    val media = Multimodal.toMediaAssets(Seq(
      (1L, "mem://steady.avi", AviMjpeg.encode(Seq(base, base, base), fps = 5)),
      (2L, "mem://outlier.avi", AviMjpeg.encode(Seq(base, inv, base), fps = 5)),
      (3L, "mem://flipped.avi", AviMjpeg.encode(Seq(inv, inv, base), fps = 5)),
      (4L, "mem://junk.avi", Array[Byte](9, 9, 9))
    ).toDF("id", "uri", "bytes"), "id", "uri", "bytes")
    val got = Multimodal.extractVideoHashes(media, stride = 1, maxFrames = 3)
      .collect().map(v => v.asset_id -> v).toMap
    assert(got(1).decoded && got(1).n_frames_hashed === 3)
    // one outlier frame of three loses every majority vote
    assert(got(2).vhash === got(1).vhash)
    // two of three flipped frames carry the vote: all 64 bits invert
    assert(java.lang.Long.bitCount(got(1).vhash ^ got(3).vhash) === 64)
    assert(!got(4).decoded && got(4).n_frames_hashed === 0)
  }

  test("sampleVideoFramesByPath indexes by path with the flagged fallback for bad paths") {
    import spark.implicits._
    val ss = Seq(7, 14, 3).map(n => Array.tabulate[Byte](n)(_.toByte))
    val mp4 = Mp4Index.encodeSynthetic(ss, syncSamples = Seq(1, 3))
    val f = java.io.File.createTempFile("graft-path", ".mp4")
    try {
      java.nio.file.Files.write(f.toPath, mp4)
      val df = Seq((1L, f.getPath), (2L, "/nonexistent/clip.mp4"))
        .toDF("id", "path")
      val rows = Multimodal.sampleVideoFramesByPath(df, "id", "path",
        stride = 2, maxFrames = 5).collect().sortBy(r => (r.asset_id, r.frame_idx))
      val good = rows.filter(_.asset_id == 1L)
      assert(good.map(_.frame_idx).toSeq === Seq(0, 2))
      assert(good.map(_.byte_len).toSeq === Seq(7L, 3L))
      assert(good.forall(_.indexed))
      val bad = rows.filter(_.asset_id == 2L)
      assert(bad.length === 1 && !bad.head.indexed && bad.head.frame_idx === -1)
      // the same path route serves Matroska/WebM via the seekable
      // EBML walk
      val webm = MkvIndex.encodeSynthetic(Seq(
        (Array.tabulate[Byte](5)(_.toByte), true),
        (Array.tabulate[Byte](7)(_.toByte), false)))
      java.nio.file.Files.write(f.toPath, webm)
      val wrows = Multimodal.sampleVideoFramesByPath(
        Seq((3L, f.getPath)).toDF("id", "path"), "id", "path",
        stride = 1, maxFrames = 5).collect().sortBy(_.frame_idx)
      assert(wrows.map(_.byte_len).toSeq === Seq(5L, 7L))
      assert(wrows.map(_.is_idr).toSeq === Seq(true, false))
    } finally f.delete()
  }

  test("extractMkvAudioTracksByPath matches the byte-column operator") {
    import spark.implicits._
    val webm = MkvIndex.encodeSyntheticAudio(Seq(
      ("A_OPUS", 2, 48000.0, Some(MkvIndex.encodeOpusHead(2, 48000)))),
      durationTicks = Some(1500.0))
    val f = java.io.File.createTempFile("graft-mkvaud", ".webm")
    try {
      java.nio.file.Files.write(f.toPath, webm)
      val byPath = Multimodal.extractMkvAudioTracksByPath(
        Seq((1L, "file://" + f.getPath), (2L, "/nonexistent/a.webm"))
          .toDF("id", "path"), "id", "path")
        .collect().sortBy(r => (r.asset_id, r.track_idx))
      val byBytes = Multimodal.extractMkvAudioTracks(
        Seq((1L, webm), (2L, Array[Byte](9))).toDF("id", "bytes"),
        "id", "bytes").collect().sortBy(r => (r.asset_id, r.track_idx))
      assert(byPath.toSeq === byBytes.toSeq)
      assert(byPath.head.duration_s === 1.5 &&
        byPath.head.private_kind === "opus")
      assert(!byPath(1).indexed)
    } finally f.delete()
  }

  test("extractMkvAttachmentsByPath matches the byte-column operator") {
    import spark.implicits._
    // a real ImageIO PNG as the cover: the byPath dims probe (one
    // bounded ranged read) must agree with the byte-column slice
    val png = {
      val img = new java.awt.image.BufferedImage(12, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "png", out))
      out.toByteArray
    }
    val mkv = MkvIndex.encodeSyntheticAttachments(Seq(
      ("cover.png", "image/png", 7L, png),
      ("font.ttf", "font/ttf", -1L, Array.fill[Byte](30)(0x42))))
    val f = java.io.File.createTempFile("graft-mkvatt", ".mkv")
    try {
      java.nio.file.Files.write(f.toPath, mkv)
      val byPath = Multimodal.extractMkvAttachmentsByPath(
        Seq((1L, "file://" + f.getPath), (2L, "/nonexistent/a.mkv"))
          .toDF("id", "path"), "id", "path")
        .collect().sortBy(r => (r.asset_id, r.att_idx))
      val byBytes = Multimodal.extractMkvAttachments(
        Seq((1L, mkv), (2L, Array[Byte](9))).toDF("id", "bytes"),
        "id", "bytes").collect().sortBy(r => (r.asset_id, r.att_idx))
      assert(byPath.toSeq === byBytes.toSeq)
      assert(byPath.head.img_format === "png" &&
        byPath.head.width === 12 && byPath.head.height === 8)
      assert(byPath(1).img_format === "" && byPath(1).file_uid === -1L)
      assert(!byPath(2).indexed)
    } finally f.delete()
  }

  test("sampleOggPagesByPath and sampleTsUnitsByPath index by path with flagged fallbacks") {
    import spark.implicits._
    def fr(n: Int, i: Int): Array[Byte] =
      Array.tabulate[Byte](n)(j => ((i * 37 + j + 1) & 0x7f).toByte)
    val ogg = OggIndex.encodeSynthetic(Seq(
      (Seq(fr(19, 0)), 0L, true, false),
      (Seq(fr(8, 1)), 960L, false, true)))
    val f = java.io.File.createTempFile("graft-path", ".opus")
    try {
      java.nio.file.Files.write(f.toPath, ogg)
      val rows = Multimodal.sampleOggPagesByPath(
        Seq((1L, f.getPath), (2L, "/nonexistent/a.opus")).toDF("id", "path"),
        "id", "path", stride = 1, maxPages = 5)
        .collect().sortBy(r => (r.asset_id, r.page_idx))
      val good = rows.filter(_.asset_id == 1L)
      assert(good.map(_.byte_len).toSeq === Seq(47L, 36L))
      assert(good.map(_.granule).toSeq === Seq(0L, 960L))
      assert(good.forall(_.indexed))
      val bad = rows.filter(_.asset_id == 2L)
      assert(bad.length === 1 && !bad.head.indexed)

      val ts = MpegTs.encodeSynthetic(Seq(
        MpegTs.SynthUnit(0x100, fr(100, 0), pts = 3003L,
          randomAccess = true),
        MpegTs.SynthUnit(0x100, fr(100, 1), pts = 6006L,
          randomAccess = false)))
      java.nio.file.Files.write(f.toPath, ts)
      val trows = Multimodal.sampleTsUnitsByPath(
        Seq((3L, f.getPath), (4L, "/nonexistent/b.ts")).toDF("id", "path"),
        "id", "path", stride = 1, maxUnits = 5)
        .collect().sortBy(r => (r.asset_id, r.unit_idx))
      val tgood = trows.filter(_.asset_id == 3L)
      assert(tgood.map(_.byte_start).toSeq === Seq(376L, 564L))
      assert(tgood.map(_.pts).toSeq === Seq(3003L, 6006L))
      assert(tgood.forall(_.indexed))
      assert(trows.count(r => r.asset_id == 4L && !r.indexed) === 1)
    } finally f.delete()
  }

  test("content sniff routes extensionless/misnamed assets; extension keeps priority") {
    import spark.implicits._
    val mp4 = Mp4Index.encodeSynthetic(
      Seq(4, 4).map(n => Array.tabulate[Byte](n)(_.toByte)), Seq(1))
    val webm = MkvIndex.encodeSynthetic(
      Seq((Array.tabulate[Byte](5)(_.toByte), true)))
    val pngB = pngBytes(3, 2, 0xFFFFFF)
    val annexB = H264AnnexB.encodeSynthetic(Seq(true))
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 0)
    val df = Seq(
      (1L, "blob-no-extension", mp4),           // sniff: ftyp -> video
      (2L, "data.bin", webm),                   // sniff: EBML -> video
      (3L, "asset", pngB),                      // sniff: PNG -> image
      (4L, "raw-stream", annexB),               // sniff: start code -> video
      (5L, "tagged", id3),                      // sniff: ID3 -> audio
      (6L, "noise.bin", Array[Byte](9, 9, 9)),  // junk stays unknown
      (7L, "named.png", mp4)                    // extension wins over bytes
    ).toDF("id", "uri", "bytes")
    val kinds = Multimodal.toMediaAssets(df, "id", "uri", "bytes")
      .collect().map(a => a.asset_id -> a.kind).toMap
    assert(kinds === Map(1L -> "video", 2L -> "video", 3L -> "image",
      4L -> "video", 5L -> "audio", 6L -> "unknown", 7L -> "image"))
    // end-to-end: the extensionless MP4 lands in the video pipeline
    // and indexes via the sample table
    val spans = Multimodal.sampleH264Frames(
      Multimodal.toMediaAssets(df.filter($"id" === 1L), "id", "uri",
        "bytes"), stride = 1, maxFrames = 5).collect()
    assert(spans.length === 2 && spans.forall(_.indexed))
  }
}
