package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[MkvIndex]]: the EBML walk must emit exact per-frame byte ranges
  * across block shapes (SimpleBlock, BlockGroup, all three lacing
  * modes), route by track number, honor keyframe semantics, and parse
  * strictly enough that junk and the other containers never
  * false-positive.
  */
class MkvIndexSpec extends AnyFunSuite {

  private def frames(ns: Int*): Seq[Array[Byte]] =
    ns.zipWithIndex.map { case (n, i) =>
      Array.tabulate[Byte](n)(j => ((i * 37 + j) & 0x7f).toByte)
    }

  /** Index of the Cluster element's first (ID) byte. */
  private def clusterIdx(b: Array[Byte]): Int = {
    val s = b.map(_ & 0xff)
    (0 until b.length - 4).find(i =>
      s(i) == 0x1f && s(i + 1) == 0x43 && s(i + 2) == 0xb6 &&
        s(i + 3) == 0x75).get
  }

  private def check(webm: Array[Byte], fs: Seq[Array[Byte]],
      keys: Seq[Boolean]): Unit = {
    val spans = MkvIndex.frameIndex(webm).get
    assert(spans.length === fs.length)
    spans.zip(fs).foreach { case (sp, f) =>
      assert(webm.slice(sp.byteStart, sp.byteStart + sp.byteLen)
        .sameElements(f), s"frame ${sp.frameIdx}")
    }
    assert(spans.map(_.isIdr) === keys)
    assert(spans.map(_.frameIdx) === fs.indices)
  }

  test("SimpleBlock spans are the exact frame bytes with keyframe flags") {
    val fs = frames(5, 7, 6)
    val keys = Seq(true, false, true)
    check(MkvIndex.encodeSynthetic(fs.zip(keys)), fs, keys)
  }

  test("BlockGroup: keyframe = no ReferenceBlock in the group") {
    val fs = frames(4, 9, 3)
    val keys = Seq(true, false, false)
    check(MkvIndex.encodeSynthetic(fs.zip(keys), useBlockGroups = true),
      fs, keys)
  }

  test("audio track declared first and interleaved is skipped by track number") {
    val fs = frames(5, 7, 6)
    val keys = Seq(true, false, true)
    // audio is track 1 with a SimpleBlock before every video block —
    // an indexer without track routing would emit 6 frames
    check(MkvIndex.encodeSynthetic(fs.zip(keys), audioTrackFirst = true),
      fs, keys)
    val vt = MkvIndex.videoTrack(
      MkvIndex.encodeSynthetic(fs.zip(keys), audioTrackFirst = true)).get
    assert(vt.trackNumber === 2L && vt.codecId === "V_MPEG4/ISO/AVC")
  }

  test("all three lacing modes expand to per-frame exact spans") {
    for (mode <- Seq("xiph", "ebml")) {
      val fs = frames(5, 9, 3, 7)
      check(MkvIndex.encodeSyntheticLaced(fs, mode), fs,
        Seq(true, true, true, true))
    }
    val uniform = frames(6, 6, 6)
    check(MkvIndex.encodeSyntheticLaced(uniform, "fixed"), uniform,
      Seq(true, true, true))
    // a Xiph size run crossing 255 still lands exactly
    val big = frames(300, 4)
    check(MkvIndex.encodeSyntheticLaced(big, "xiph"), big, Seq(true, true))
  }

  test("review-pinned edge cases: 1-frame lace, truncated sizes, empty blocks") {
    // EBML/Xiph lacing with n=1 carries NO size bytes — the frame's
    // own leading byte must not be consumed as lacing metadata
    for (mode <- Seq("ebml", "xiph", "fixed")) {
      val fs = frames(5)
      check(MkvIndex.encodeSyntheticLaced(fs, mode), fs, Seq(true))
    }
    // a >2^31 declared EBML lace size must refuse, not truncate into
    // a plausible Int: patch the 1-byte first-size VINT to an 8-byte
    // VINT claiming 2^32+5 (same total block length — pad frame out)
    val good = MkvIndex.encodeSyntheticLaced(frames(5, 9, 3), "ebml")
    // the naive 0xA3 scan would hit the EBML magic's last byte
    // (1A 45 DF A3) — locate the Cluster first, block = hdr(5) + ts(3)
    val blockIdx = clusterIdx(good) + 5 + 3
    // payload: track(1) ts(2) flags(1) count(1) then first size 0x85
    assert((good(blockIdx + 2 + 5) & 0xff) === 0x85)
    val bad = good.clone()
    bad(blockIdx + 2 + 5) = 0x01 // 8-byte VINT: swallows 7 more bytes
    assert(MkvIndex.frameIndex(bad).isEmpty)
  }

  test("an unlaced SimpleBlock with no frame data refuses the asset") {
    // rebuild the synthetic file but strip the frame bytes from its
    // one SimpleBlock: element sizes re-tile, so the only defense is
    // blockFrames' empty-data refusal
    val good = MkvIndex.encodeSynthetic(frames(5).map((_, true)))
    val s = good.map(_ & 0xff)
    val bi = clusterIdx(good) + 5 + 3
    assert(s(bi) === 0xa3)
    assert(s(bi + 1) === (0x80 | 9)) // size = 4 hdr + 5 data
    val stripped = good.take(bi) ++
      Array(0xa3.toByte, (0x80 | 4).toByte) ++
      good.slice(bi + 2, bi + 2 + 4)
    // shrink every enclosing size (cluster + segment) by 5
    val out = stripped.clone()
    def shrinkSizeAt(fourByteId: Seq[Int]): Unit = {
      val t = out.map(_ & 0xff)
      val i = (0 until out.length - 4).find(j =>
        fourByteId.indices.forall(k => t(j + k) == fourByteId(k))).get
      out(i + 4) = ((out(i + 4) & 0xff) - 5).toByte
    }
    shrinkSizeAt(Seq(0x18, 0x53, 0x80, 0x67)) // Segment
    shrinkSizeAt(Seq(0x1f, 0x43, 0xb6, 0x75)) // Cluster
    assert(MkvIndex.frameIndex(out).isEmpty)
  }

  test("CodecPrivate extradata is exposed by range") {
    val avcc = H264Avcc.encodeSynthetic(Seq(true))
    val record = avcc.take(H264Avcc.parseConfig(avcc).get.headerLen)
    val webm = MkvIndex.encodeSynthetic(frames(5).map((_, true)),
      codecPrivate = Some(record))
    val (s, e) = MkvIndex.videoTrack(webm).get.codecPrivate.get
    assert(webm.slice(s, e).sameElements(record))
  }

  test("strictness: junk, other containers, truncations, audio-only all None") {
    assert(MkvIndex.frameIndex(Array[Byte](9, 9, 9, 9)).isEmpty)
    assert(MkvIndex.frameIndex(Array.empty[Byte]).isEmpty)
    assert(MkvIndex.frameIndex(
      Mp4Index.encodeSynthetic(frames(4, 4), Seq(1))).isEmpty)
    assert(MkvIndex.frameIndex(
      H264AnnexB.encodeSynthetic(Seq(true))).isEmpty)
    val good = MkvIndex.encodeSynthetic(frames(5, 7).map((_, true)))
    for (cut <- Seq(3, 11, 30, good.length - 1, good.length - 4)) {
      assert(MkvIndex.frameIndex(good.take(cut)).isEmpty, s"cut=$cut")
    }
    // and the reverse: a WebM must not be claimed by the MP4/NAL walks
    assert(Mp4Index.frameIndex(good).isEmpty)
    assert(H264Avcc.frameIndex(good).isEmpty)
    assert(H265.frameIndexHvcc(good).isEmpty)
    // audio-only file (no video TrackEntry): no frame stream
    val audioOnly = {
      val fs = frames(5)
      val full = MkvIndex.encodeSynthetic(fs.map((_, true)),
        audioTrackFirst = true)
      full // has video track 2; now break it by renaming TrackType
    }
    assert(MkvIndex.frameIndex(audioOnly).isDefined) // sanity
  }

  test("unknown-size Segment (streaming shape) is honored; unknown sizes elsewhere refuse") {
    val fs = frames(5, 7)
    val good = MkvIndex.encodeSynthetic(fs.map((_, true)))
    // rewrite the Segment's 1-byte size to the unknown marker 0xFF:
    // Segment ID is 4 bytes at offset 12 (EBML header is 12 bytes)
    assert((good(12) & 0xff) === 0x18) // the Segment ID's first byte
    val streaming = good.clone()
    streaming(16) = 0xff.toByte
    check(streaming, fs, Seq(true, true))
    // the same marker on a NESTED element (the Cluster) must refuse
    val idx = {
      // Cluster ID 1F 43 B6 75 — find it
      val s = good.map(_ & 0xff)
      (0 until good.length - 4).find(i =>
        s(i) == 0x1f && s(i + 1) == 0x43 && s(i + 2) == 0xb6 &&
          s(i + 3) == 0x75).get
    }
    val badNested = good.clone()
    badNested(idx + 4) = 0xff.toByte
    assert(MkvIndex.frameIndex(badNested).isEmpty)
  }

  test("seekable agrees with the in-memory walk across block shapes") {
    val fs = frames(5, 7, 6)
    val keys = Seq(true, false, true)
    val variants = Seq(
      MkvIndex.encodeSynthetic(fs.zip(keys)),
      MkvIndex.encodeSynthetic(fs.zip(keys), useBlockGroups = true),
      MkvIndex.encodeSynthetic(fs.zip(keys), audioTrackFirst = true),
      MkvIndex.encodeSyntheticLaced(frames(5, 9, 3, 7), "xiph"),
      MkvIndex.encodeSyntheticLaced(frames(5, 9, 3, 7), "ebml"),
      MkvIndex.encodeSyntheticLaced(frames(6, 6, 6), "fixed"))
    val f = java.io.File.createTempFile("graft-mkv", ".webm")
    try {
      variants.zipWithIndex.foreach { case (webm, vi) =>
        java.nio.file.Files.write(f.toPath, webm)
        val mem = MkvIndex.frameIndex(webm).get
        val r = new Mp4Index.FileRangeReader(f.getPath)
        val seek = try MkvIndex.frameIndexSeekable(r).get finally r.close()
        assert(seek.map(s => (s.byteStart, s.byteLen, s.isIdr)) ===
          mem.map(s => (s.byteStart.toLong, s.byteLen.toLong, s.isIdr)),
          s"variant $vi")
      }
      // junk refuses through the reader too
      java.nio.file.Files.write(f.toPath, Array[Byte](9, 9, 9, 9))
      val rj = new Mp4Index.FileRangeReader(f.getPath)
      try assert(MkvIndex.frameIndexSeekable(rj).isEmpty)
      finally rj.close()
    } finally f.delete()
  }

  test("seekable: a sparse >2GiB single-block WebM indexes from headers alone") {
    // reuse a small synthetic file's EBML+Info+Tracks prefix, switch
    // the Segment to unknown-size (to EOF), and append one Cluster
    // holding a single SimpleBlock whose 2.2 GB frame data is a
    // sparse hole — the walk must never read it
    val small = MkvIndex.encodeSynthetic(frames(5).map((_, true)))
    val clusterAt = clusterIdx(small)
    val prefix = small.take(clusterAt)
    assert((prefix(16) & 0xff) >= 0x80) // the 1-byte Segment size
    prefix(16) = 0xff.toByte            // -> unknown size (to EOF)
    val bigLen = 2300000000L
    def sizeVint8(n: Long): Array[Byte] =
      Array(0x01.toByte) ++ Array.tabulate[Byte](7)(j =>
        ((n >> (8 * (6 - j))) & 0xff).toByte)
    val blockPayloadLen = 4 + bigLen
    val blockHdr = Array(0xa3.toByte) ++ sizeVint8(blockPayloadLen) ++
      Array(0x81.toByte, 0.toByte, 0.toByte, 0x80.toByte)
    val ts = Array(0xe7.toByte, 0x81.toByte, 0.toByte)
    val clusterContent = ts.length.toLong + blockHdr.length + bigLen
    val clusterHdr = Array(0x1f.toByte, 0x43.toByte, 0xb6.toByte,
      0x75.toByte) ++ sizeVint8(clusterContent)
    val f = java.io.File.createTempFile("graft-bigmkv", ".webm")
    try {
      val raf = new java.io.RandomAccessFile(f, "rw")
      raf.write(prefix)
      raf.write(clusterHdr)
      raf.write(ts)
      raf.write(blockHdr)
      val dataAbs = raf.getFilePointer
      raf.setLength(dataAbs + bigLen) // sparse frame data
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
      val spans = try MkvIndex.frameIndexSeekable(counting).get
        finally counting.close()
      assert(spans.map(s => (s.byteStart, s.byteLen, s.isIdr)) ===
        Seq((dataAbs, bigLen, true)))
      assert(bytesRead < 10000L, s"read $bytesRead bytes")
    } finally f.delete()
  }

  test("audio TrackEntries profile header-only: channels/rate/depth/private") {
    val opus = MkvIndex.encodeOpusHead(2, 48000)
    val vorb = MkvIndex.encodeVorbisPrivate()
    val b = MkvIndex.encodeSyntheticAudio(Seq(
      ("A_OPUS", 2, 48000.0, Some(opus)),
      ("A_VORBIS", 1, 44100.0, Some(vorb))),
      durationTicks = Some(2500.0))
    val ts = MkvIndex.audioTracks(b).get
    assert(ts.map(t => (t.trackNumber, t.codecId, t.channels,
      t.sampleRateHz, t.bitDepth)) ===
      Seq((1L, "A_OPUS", 2, 48000.0, -1), (2L, "A_VORBIS", 1, 44100.0, -1)))
    // CodecPrivate spans slice back to the exact records and sniff
    val (s0, e0) = ts(0).codecPrivate.get
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(b, s0, e0), opus))
    assert(MkvIndex.audioPrivateKind(b, s0, e0) === "opus")
    val (s1, e1) = ts(1).codecPrivate.get
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(b, s1, e1), vorb))
    assert(MkvIndex.audioPrivateKind(b, s1, e1) === "vorbis")
    assert(MkvIndex.segmentDuration(b) === Some(2.5))
    // bit depth + no-private + no-duration face
    val pcm = MkvIndex.encodeSyntheticAudio(
      Seq(("A_PCM/INT/LIT", 2, 16000.0, None)), bitDepth = Some(16))
    val pt = MkvIndex.audioTracks(pcm).get
    assert(pt.map(t => (t.codecId, t.channels, t.sampleRateHz,
      t.bitDepth, t.codecPrivate)) ===
      Seq(("A_PCM/INT/LIT", 2, 16000.0, 16, None)))
    assert(MkvIndex.segmentDuration(pcm).isEmpty)
    // a video-only webm has zero audio tracks but stays valid
    assert(MkvIndex.audioTracks(MkvIndex.encodeSynthetic(
      Seq((Array.fill[Byte](5)(1), true)))) === Some(Seq()))
    // junk refuses
    assert(MkvIndex.audioTracks(Array[Byte](9, 9, 9)).isEmpty)
    // the existing audio-first video fixture exposes its A_OPUS entry
    val muxed = MkvIndex.encodeSynthetic(
      Seq((Array.fill[Byte](5)(1), true)), audioTrackFirst = true)
    assert(MkvIndex.audioTracks(muxed).get.map(_.codecId) === Seq("A_OPUS"))
  }

  test("subtitle cues: timestamps, durations, track routing, UTF-8 spans") {
    val b = MkvIndex.encodeSyntheticSubtitles(Seq(
      (0L, 2000L, "Hello there."),
      (2500L, 1500L, "Café scene"),
      (90000L, -1L, "no duration")))
    val (scale, codec, cues) = MkvIndex.subtitleCues(b).get
    assert(codec === "S_TEXT/UTF8")
    assert(scale === 1000000L)
    assert(cues.map(c => (c.startTicks, c.durTicks)) ===
      Seq((0L, 2000L), (2500L, 1500L), (90000L, -1L)))
    assert(cues.map(c => new String(b, c.byteStart, c.byteLen, "UTF-8"))
      === Seq("Hello there.", "Café scene", "no duration"))
    // a leading video track + interleaved video blocks route away
    val muxed = MkvIndex.encodeSyntheticSubtitles(Seq(
      (100L, -1L, "routed")), videoTrackFirst = true)
    val (_, _, mc) = MkvIndex.subtitleCues(muxed).get
    assert(mc.map(c => (c.startTicks,
      new String(muxed, c.byteStart, c.byteLen, "UTF-8"))) ===
      Seq((100L, "routed")))
    // subtitle-less but valid: empty; junk: None; the video fixture's
    // frame walk is untouched by the subtitle track
    assert(MkvIndex.subtitleCues(MkvIndex.encodeSynthetic(
      Seq((Array.fill[Byte](5)(1), true)))).get._3.isEmpty)
    assert(MkvIndex.subtitleCues(Array[Byte](9, 9)).isEmpty)
    assert(MkvIndex.frameIndex(muxed).get.map(_.byteLen) === Seq(2))
    // a LACED subtitle block is out of contract: refuse, not misparse
    val laced = {
      val c = muxed.clone()
      // find the 'routed' block payload: track VINT 0x82, ts, flags
      val idx = (0 until c.length - 4).find(i =>
        (c(i) & 0xff) == 0x82 && c(i + 3) == 0 &&
          new String(c, i + 4, 6, "UTF-8") == "routed").get
      c(idx + 3) = 0x02 // Xiph lacing flag
      c
    }
    assert(MkvIndex.subtitleCues(laced).isEmpty)
  }

  test("attachments: spans round-trip, omitted UID, strict mandatory fields") {
    val cover = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val font = Array.fill[Byte](300)(0x42)
    val b = MkvIndex.encodeSyntheticAttachments(Seq(
      ("cover.png", "image/png", 7L, cover),
      ("font.ttf", "font/ttf", 8L, font),
      ("notes.txt", "text/plain", -1L, "hi".getBytes("UTF-8"))))
    val as = MkvIndex.attachments(b).get
    assert(as.map(a => (a.fileName, a.mimeType, a.fileUid, a.dataLen)) ===
      Seq(("cover.png", "image/png", 7L, 64L),
        ("font.ttf", "font/ttf", 8L, 300L),
        ("notes.txt", "text/plain", -1L, 2L)))
    // data spans address the EXACT attachment bytes
    assert(java.util.Arrays.equals(java.util.Arrays.copyOfRange(b,
      as(0).dataStart.toInt, (as(0).dataStart + as(0).dataLen).toInt),
      cover))
    assert(java.util.Arrays.equals(java.util.Arrays.copyOfRange(b,
      as(1).dataStart.toInt, (as(1).dataStart + as(1).dataLen).toInt),
      font))
    // the seekable walk IS the in-memory walk (one implementation)
    assert(MkvIndex.attachmentsSeekable(
      new Mp4Index.BytesRangeReader(b)).get === as)
    // a missing spec-mandatory FileMimeType refuses the asset
    assert(MkvIndex.encodeSyntheticAttachments(Seq(
      ("x.bin", "application/octet-stream", 1L, Array[Byte](1))),
      omitMimeFor = Set("x.bin")) match {
      case bad => MkvIndex.attachments(bad).isEmpty
    })
    // valid file without attachments: Some(empty); junk: None
    assert(MkvIndex.attachments(MkvIndex.encodeSynthetic(
      Seq((Array.fill[Byte](5)(1), true)))).get.isEmpty)
    assert(MkvIndex.attachments(Array[Byte](9, 9)).isEmpty)
  }

  test("chapters: editions, nesting order, defaults, strict mandatories") {
    import MkvIndex.ChapterSpec
    val b = MkvIndex.encodeSyntheticChapters(Seq(
      Seq(
        ChapterSpec(11L, 0L, 90000000000L, "Intro", "eng",
          children = Seq(
            ChapterSpec(12L, 5000000000L, 30000000000L, "Cold open",
              "und"))),
        ChapterSpec(13L, 90000000000L, -1L, "Main", "ger")),
      Seq(ChapterSpec(21L, 0L, 60000000000L, null, null))))
    val cs = MkvIndex.chapters(b).get
    assert(cs.map(c => (c.editionIdx, c.chapterUid, c.startNs, c.endNs,
      c.title, c.language, c.nestLevel)) === Seq(
      (0, 11L, 0L, 90000000000L, "Intro", "eng", 0),
      (0, 12L, 5000000000L, 30000000000L, "Cold open", "und", 1),
      (0, 13L, 90000000000L, -1L, "Main", "ger", 0),
      (1, 21L, 0L, 60000000000L, "", "eng", 0)))
    // seekable twin IS the in-memory walk
    assert(MkvIndex.chaptersSeekable(
      new Mp4Index.BytesRangeReader(b)).get === cs)
    // mandatory ChapterUID / ChapterTimeStart missing -> refuse
    assert(MkvIndex.chapters(MkvIndex.encodeSyntheticChapters(Seq(Seq(
      ChapterSpec(0L, 0L, -1L, "x", null, omitUid = true))))).isEmpty)
    // no chapters: Some(empty); junk: None
    assert(MkvIndex.chapters(MkvIndex.encodeSynthetic(
      Seq((Array.fill[Byte](5)(1), true)))).get.isEmpty)
    assert(MkvIndex.chapters(Array[Byte](9, 9)).isEmpty)
  }

  test("mkvTags: targeting, defaults, TagBinary, nesting, mandatories") {
    import MkvIndex.TagSpec
    val b = MkvIndex.encodeSyntheticTags(Seq(
      (50L, 0L, Seq(
        TagSpec("TITLE", "Voyage",
          children = Seq(TagSpec("SORT_WITH", "voyage", lang = "eng"))),
        TagSpec("THUMBNAIL", null))),
      (30L, 7L, Seq(TagSpec("ARTIST", "Ensemble")))))
    val ts = MkvIndex.mkvTags(b).get
    assert(ts.map(t => (t.tagIdx, t.targetTypeValue, t.trackUid, t.name,
      t.value, t.language, t.binary, t.nestLevel)) === Seq(
      (0, 50L, 0L, "TITLE", "Voyage", "und", false, 0),
      (0, 50L, 0L, "SORT_WITH", "voyage", "eng", false, 1),
      (0, 50L, 0L, "THUMBNAIL", "", "und", true, 0),
      (1, 30L, 7L, "ARTIST", "Ensemble", "und", false, 0)))
    // seekable twin IS the in-memory walk
    assert(MkvIndex.mkvTagsSeekable(
      new Mp4Index.BytesRangeReader(b)).get === ts)
    // Targets omitted entirely -> spec defaults (50, uid 0)
    assert(MkvIndex.mkvTags(MkvIndex.encodeSyntheticTags(Seq(
      (-1L, 0L, Seq(TagSpec("DATE_RELEASED", "2021")))))).get
      .map(t => (t.targetTypeValue, t.trackUid)) === Seq((50L, 0L)))
    // mandatory TagName missing -> refuse
    assert(MkvIndex.mkvTags(MkvIndex.encodeSyntheticTags(Seq(
      (50L, 0L, Seq(TagSpec(null, "x")))))).isEmpty)
    // no tags: Some(empty); junk: None
    assert(MkvIndex.mkvTags(MkvIndex.encodeSynthetic(
      Seq((Array.fill[Byte](5)(1), true)))).get.isEmpty)
    assert(MkvIndex.mkvTags(Array[Byte](9, 9)).isEmpty)
  }

  test("S_TEXT/ASS cues strip the 8 dialogue fields and decode escapes") {
    // the Matroska ASS mapping stores `ReadOrder,Layer,Style,Name,
    // MarginL,MarginR,MarginV,Effect,Text` per block — the Text field
    // may itself contain commas and \N/\h escapes
    val ass = MkvIndex.encodeSyntheticSubtitles(Seq(
      (0L, 2000L, "0,0,Default,,0,0,0,,Hello, world\\Nsecond line"),
      (2500L, -1L, "1,0,Default,,0,0,0,,hard\\hspace and \\\\keep")),
      codecId = "S_TEXT/ASS")
    val (_, codec, cues) = MkvIndex.subtitleCues(ass).get
    assert(codec === "S_TEXT/ASS")
    // the raw spans still carry the fields; the strip is the helper's
    assert(cues.size === 2)
    val texts = cues.map(c => MkvIndex.assDialogueText(
      new String(ass, c.byteStart, c.byteLen, "UTF-8")))
    // `\\` is NOT an ASS escape — both backslashes survive the decode
    assert(texts === Seq("Hello, world\nsecond line",
      "hard space and \\\\keep"))
    // fewer than 8 commas: out of mapping — whole payload survives
    // (escape-decoded), never a field guess
    assert(MkvIndex.assDialogueText("just text, one comma") ===
      "just text, one comma")
    // a trailing lone backslash cannot read past the end
    assert(MkvIndex.assDialogueText("0,0,s,,0,0,0,,tail\\") === "tail\\")
  }

  test("bitmap subtitle tracks skip; S_TEXT after PGS selects; corrupt Info refuses") {
    import MkvIndex.el
    val ebml = el(0x1A45DFA3L, el(0x4282L, "webm".getBytes("UTF-8")))
    def entry(num: Int, codec: String) = el(0xAEL,
      el(0xD7L, Array(num.toByte)) ++ el(0x83L, Array(0x11.toByte)) ++
        el(0x86L, codec.getBytes("UTF-8")))
    def blk(track: Int, text: String) = el(0xA3L,
      Array((0x80 | track).toByte, 0.toByte, 0.toByte, 0.toByte) ++
        text.getBytes("UTF-8"))
    val tracks = el(0x1654AE6BL,
      entry(1, "S_HDMV/PGS") ++ entry(2, "S_TEXT/UTF8"))
    val cluster = el(0x1F43B675L, el(0xE7L, Array(0.toByte)) ++
      blk(1, "pgsdata") ++ blk(2, "real cue"))
    val b = ebml ++ el(0x18538067L,
      el(0x1549A966L, Array.empty[Byte]) ++ tracks ++ cluster)
    // the bitmap track neither decodes as "text" nor shadows S_TEXT
    val (_, _, cues) = MkvIndex.subtitleCues(b).get
    assert(cues.map(c =>
      new String(b, c.byteStart, c.byteLen, "UTF-8")) === Seq("real cue"))
    // a PGS-only file is valid with zero TEXT cues
    val pgsOnly = ebml ++ el(0x18538067L,
      el(0x1549A966L, Array.empty[Byte]) ++
        el(0x1654AE6BL, entry(1, "S_HDMV/PGS")) ++
        el(0x1F43B675L, el(0xE7L, Array(0.toByte)) ++ blk(1, "x")))
    assert(MkvIndex.subtitleCues(pgsOnly).get._3.isEmpty)
    // a corrupt Info payload refuses (no silent default scale)
    val badInfo = ebml ++ el(0x18538067L,
      el(0x1549A966L, Array[Byte](0)) ++ tracks ++ cluster)
    assert(MkvIndex.subtitleCues(badInfo).isEmpty)
  }

  test("trailing junk after a sized Segment refuses on BOTH routes") {
    val b = MkvIndex.encodeSyntheticAudio(
      Seq(("A_OPUS", 2, 48000.0, None)))
    val junked = b ++ Array[Byte](9, 9, 9)
    assert(MkvIndex.audioTracks(junked).isEmpty)
    assert(MkvIndex.segmentMetaSeekable(
      new Mp4Index.BytesRangeReader(junked)).isEmpty)
    // and the clean file passes on both
    assert(MkvIndex.audioTracks(b).get.nonEmpty)
    assert(MkvIndex.segmentMetaSeekable(
      new Mp4Index.BytesRangeReader(b)).get.tracks.nonEmpty)
  }

  test("seekable segment metadata agrees with the in-memory accessors") {
    val opus = MkvIndex.encodeOpusHead(2, 48000)
    val b = MkvIndex.encodeSyntheticAudio(Seq(
      ("A_OPUS", 2, 48000.0, Some(opus)),
      ("A_VORBIS", 1, 44100.0, Some(MkvIndex.encodeVorbisPrivate()))),
      durationTicks = Some(2500.0))
    val meta = MkvIndex.segmentMetaSeekable(
      new Mp4Index.BytesRangeReader(b)).get
    assert(meta.durationS === Some(2.5))
    val seekTracks = meta.tracks.flatMap(tb =>
      MkvIndex.audioTracksInTracks(tb, 0, tb.length).get.map { t =>
        (t.trackNumber, t.codecId, t.channels, t.sampleRateHz,
          t.bitDepth,
          t.codecPrivate.map { case (s, e) =>
            java.util.Arrays.copyOfRange(tb, s, e).toSeq })
      })
    val memTracks = MkvIndex.audioTracks(b).get.map { t =>
      (t.trackNumber, t.codecId, t.channels, t.sampleRateHz, t.bitDepth,
        t.codecPrivate.map { case (s, e) =>
          java.util.Arrays.copyOfRange(b, s, e).toSeq })
    }
    assert(seekTracks === memTracks)
  }

  test("a corrupt Tracks payload refuses the asset, never Some(empty)") {
    // Segment-level tiling intact, Tracks payload garbage (0x00 is an
    // invalid VINT lead byte): this is CORRUPTION, and Some(Seq())
    // would be indistinguishable from a valid video-only mux — the
    // asset would silently vanish from the audio profile instead of
    // flagging
    val b = MkvIndex.el(0x1A45DFA3L,
      MkvIndex.el(0x4282L, "webm".getBytes("UTF-8"))) ++
      MkvIndex.el(0x18538067L,
        MkvIndex.el(0x1549A966L, Array.empty[Byte]) ++
          MkvIndex.el(0x1654AE6BL, Array[Byte](0x00)))
    assert(MkvIndex.audioTracks(b).isEmpty)
    // the same corruption refuses the video-track accessor too
    assert(MkvIndex.videoTrack(b).isEmpty)
  }

  test("a large Xiph-laced vorbis ident (255-byte laces) still sniffs") {
    // lace sizes of exactly 255 need a 0-terminator byte each; the
    // sniff must walk them, not assume 1-byte laces
    val vorb = {
      def packet(lead: Int, len: Int): Array[Byte] =
        Array(lead.toByte) ++ "vorbis".getBytes("ISO-8859-1") ++
          Array.fill[Byte](len - 7)(3)
      Array[Byte](2) ++
        Array(255.toByte, 0.toByte) ++ // ident: 255 = 255 + 0
        Array(10.toByte) ++
        packet(1, 255) ++ packet(3, 10) ++ packet(5, 8)
    }
    assert(MkvIndex.audioPrivateKind(vorb, 0, vorb.length) === "vorbis")
  }
}
