package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[Mp4Index]]: the stbl walk must reconstruct exact per-sample byte
  * ranges across chunk layouts, honor stss, expose the avcC
  * extradata, and parse strictly enough that the other two H.264
  * framings (and junk) can never false-positive.
  */
class Mp4IndexSpec extends AnyFunSuite {

  private def samples(ns: Int*): Seq[Array[Byte]] =
    ns.zipWithIndex.map { case (n, i) =>
      Array.tabulate[Byte](n)(j => ((i * 31 + j) & 0x7f).toByte)
    }

  test("sample ranges tile mdat exactly across chunk layouts") {
    for (spc <- Seq(1, 2, 3, 5)) {
      val ss = samples(7, 14, 3, 21, 9)
      val mp4 = Mp4Index.encodeSynthetic(ss, syncSamples = Seq(1, 4),
        samplesPerChunk = spc)
      val spans = Mp4Index.frameIndex(mp4).get
      assert(spans.length === 5, s"spc=$spc")
      assert(spans.map(_.byteLen) === Seq(7, 14, 3, 21, 9), s"spc=$spc")
      // every span's bytes are exactly the sample's bytes
      spans.zip(ss).foreach { case (sp, s) =>
        assert(mp4.slice(sp.byteStart, sp.byteStart + sp.byteLen)
          .sameElements(s), s"spc=$spc frame ${sp.frameIdx}")
      }
      assert(spans.map(_.isIdr) === Seq(true, false, false, true, false))
    }
  }

  test("no stss means every sample is sync; avcC extradata is exposed") {
    val ss = samples(4, 4)
    val mp4 = Mp4Index.encodeSynthetic(ss, syncSamples = Seq(1, 2))
    val t = Mp4Index.sampleTable(mp4).get
    assert(t.codec === "avc1")
    val (a0, a1) = t.avcC.get
    // the exposed range is a parseable AVCDecoderConfigurationRecord
    val rec = mp4.slice(a0, a1)
    assert(H264Avcc.parseConfig(rec).exists(_.headerLen === rec.length))
  }

  test("strict parse: junk, Annex-B, raw AVCC, truncations all None") {
    assert(Mp4Index.frameIndex(Array[Byte](9, 9, 9, 9)).isEmpty)
    assert(Mp4Index.frameIndex(Array.empty[Byte]).isEmpty)
    assert(Mp4Index.frameIndex(
      H264AnnexB.encodeSynthetic(Seq(true, false))).isEmpty)
    assert(Mp4Index.frameIndex(
      H264Avcc.encodeSynthetic(Seq(true, false))).isEmpty)
    val good = Mp4Index.encodeSynthetic(samples(5, 5, 5), Seq(1))
    for (cut <- Seq(4, 20, good.length - 1, good.length - 10)) {
      assert(Mp4Index.frameIndex(good.take(cut)).isEmpty, s"cut=$cut")
    }
    // an inconsistent table (stsz count exceeding what chunks hold)
    // must refuse rather than emit out-of-bounds ranges: truncate the
    // chunk-offset count to 1 while keeping 3 samples at 2/chunk
    val idx = {
      // locate stco payload: encodeSynthetic layout is deterministic
      val s = new String(good, "ISO-8859-1")
      s.indexOf("stco")
    }
    val bad = good.clone()
    bad(idx + 4 + 4 + 3) = 0 // entry_count -> 0
    assert(Mp4Index.frameIndex(bad).isEmpty)
  }

  test("adversarial counts refuse with None, never an exception") {
    // counts are attacker-controllable: a bit-31 entry_count must not
    // become a negative array size or out-of-bounds read that kills a
    // Spark task — the contract is None (one flagged row downstream)
    val good = Mp4Index.encodeSynthetic(samples(5, 5), Seq(1))
    def patched(four: String, rel: Int, v: Byte): Array[Byte] = {
      val idx = new String(good, "ISO-8859-1").indexOf(four)
      assert(idx > 0, four)
      val b = good.clone(); b(idx + rel) = v; b
    }
    // entry_count / sample_count high bit set → negative .toInt
    for (four <- Seq("stco", "stss", "stsc")) {
      assert(Mp4Index.frameIndex(
        patched(four, 8, 0x80.toByte)).isEmpty, four)
    }
    // stsz sample_count (at vf+sample_size = +12 from fourcc)
    assert(Mp4Index.frameIndex(patched("stsz", 12, 0x80.toByte)).isEmpty)
    // absurd-but-positive counts (more entries than bytes) also refuse
    assert(Mp4Index.frameIndex(patched("stco", 9, 0x7f.toByte)).isEmpty)
  }

  test("Long-overflow offsets refuse: huge co64 / base-data-offset cannot wrap past the bounds check") {
    // co64 offset near Long.MaxValue: `off + size` wraps negative and
    // would slip a sum-side check, emitting a garbage span
    val good = Mp4Index.encodeSynthetic(samples(5, 5), Seq(1))
    val s = new String(good, "ISO-8859-1")
    val stcoIdx = s.indexOf("stco")
    // rewrite the stco box into a co64-shaped attack is complex; patch
    // the FIRST stco offset to a huge u32 instead (beyond asset end)
    val bad1 = good.clone()
    bad1(stcoIdx + 12) = 0x7f.toByte // first chunk offset ≈ 2.1 GB
    assert(Mp4Index.frameIndex(bad1).isEmpty)
    // fragmented: tfhd base-data-offset near Long.MaxValue
    val frag = Mp4Index.encodeSyntheticFragmented(
      Seq(samples(5, 5)), explicitBase = true)
    val fs = new String(frag, "ISO-8859-1")
    val tfhdIdx = fs.indexOf("tfhd")
    // base-data-offset u64 starts at tfhd fourcc + 4 (vf) + 4 (track)
    val bad2 = frag.clone()
    bad2(tfhdIdx + 12) = 0x7f.toByte
    java.util.Arrays.fill(bad2, tfhdIdx + 13, tfhdIdx + 20, 0xff.toByte)
    assert(Mp4Index.frameIndex(bad2).isEmpty)
  }

  test("fragmented MP4: trun-addressed spans tile each mdat; sync per fragment head") {
    val frags = Seq(samples(5, 9), samples(7))
    val f = Mp4Index.encodeSyntheticFragmented(frags)
    val spans = Mp4Index.frameIndex(f).get
    assert(spans.length === 3)
    assert(spans.map(_.byteLen) === Seq(5, 9, 7))
    // each span's bytes are exactly the sample's bytes
    spans.zip(frags.flatten).foreach { case (sp, s) =>
      assert(f.slice(sp.byteStart, sp.byteStart + sp.byteLen)
        .sameElements(s), s"frame ${sp.frameIdx}")
    }
    // CMAF shape: fragment heads sync, continuations non-sync
    assert(spans.map(_.isIdr) === Seq(true, false, true))
    // frame indexes continue across fragments
    assert(spans.map(_.frameIdx) === (0 until 3))
  }

  test("fragmented variants: tfhd default-sample-size and explicit base-data-offset") {
    val frags = Seq(samples(6, 6, 6), samples(6))
    val viaTrun = Mp4Index.frameIndex(
      Mp4Index.encodeSyntheticFragmented(frags)).get
    val viaDefault = Mp4Index.frameIndex(
      Mp4Index.encodeSyntheticFragmented(frags, perSampleSizes = false)).get
    val viaBase = Mp4Index.frameIndex(
      Mp4Index.encodeSyntheticFragmented(frags, explicitBase = true)).get
    // same logical index regardless of addressing/size encoding
    // (absolute offsets differ only through box-length differences, so
    // compare shape + content)
    def shape(ss: Seq[H264AnnexB.FrameSpan]) =
      ss.map(s => (s.frameIdx, s.byteLen, s.isIdr))
    assert(shape(viaDefault) === shape(viaTrun))
    assert(shape(viaBase) === shape(viaTrun))
  }

  test("fragmented strictness: truncations and missing data_offset refuse") {
    val good = Mp4Index.encodeSyntheticFragmented(Seq(samples(5, 5)))
    for (cut <- Seq(20, good.length - 1, good.length - 6)) {
      assert(Mp4Index.frameIndex(good.take(cut)).isEmpty, s"cut=$cut")
    }
    // a plain (non-fragmented) MP4 never reaches the fragment path
    // with a half-answer: it indexes via the sample table
    val plain = Mp4Index.encodeSynthetic(samples(4, 4), Seq(1))
    assert(Mp4Index.fragmentIndex(plain).isEmpty)
    assert(Mp4Index.frameIndex(plain).isDefined)
  }

  test("audio trak first: the VIDEO trak is indexed, not track 1's audio table") {
    val ss = samples(7, 14, 3, 21, 9)
    val mp4 = Mp4Index.encodeSynthetic(ss, syncSamples = Seq(1, 4),
      samplesPerChunk = 2, audioTrakFirst = true)
    // the leading audio trak has a complete 1-sample table — an
    // indexer without the hdlr filter returns THAT (1 bogus "frame")
    val spans = Mp4Index.frameIndex(mp4).get
    assert(spans.length === 5)
    assert(spans.map(_.byteLen) === Seq(7, 14, 3, 21, 9))
    spans.zip(ss).foreach { case (sp, s) =>
      assert(mp4.slice(sp.byteStart, sp.byteStart + sp.byteLen)
        .sameElements(s), s"frame ${sp.frameIdx}")
    }
    assert(Mp4Index.sampleTable(mp4).get.codec === "avc1")
  }

  test("hdlr governs trak eligibility; stsd fourcc is the fallback when absent") {
    val mp4 = Mp4Index.encodeSynthetic(samples(4, 4), Seq(1))
    def renamed(from: String, to: String): Array[Byte] = {
      val idx = new String(mp4, "ISO-8859-1").indexOf(from)
      assert(idx > 0, from)
      val b = mp4.clone()
      to.getBytes("ISO-8859-1").zipWithIndex.foreach { case (c, i) =>
        b(idx + i) = c
      }
      b
    }
    // no hdlr box at all (legacy minimal mux): the avc1 stsd fourcc
    // vouches for video-ness
    assert(Mp4Index.frameIndex(renamed("hdlr", "zzzz")).isDefined)
    // a declared NON-video handler excludes the trak outright
    assert(Mp4Index.frameIndex(renamed("vide", "soun")).isEmpty)
    // avc3 (in-band parameter sets) is still a video fourcc and still
    // exposes its config record
    val avc3 = Mp4Index.sampleTable(renamed("avc1", "avc3")).get
    assert(avc3.codec === "avc3" && avc3.avcC.isDefined)
  }

  test("size==0 is last-top-level-box only: legal on moov, refused nested") {
    val mp4 = Mp4Index.encodeSynthetic(samples(4, 4), Seq(1))
    val s = new String(mp4, "ISO-8859-1")
    def zeroSize(fourccIdx: Int): Array[Byte] = {
      val b = mp4.clone()
      java.util.Arrays.fill(b, fourccIdx - 4, fourccIdx, 0.toByte)
      b
    }
    // moov is the last top-level box: size 0 = "to end of file", legal
    assert(Mp4Index.frameIndex(zeroSize(s.lastIndexOf("moov"))).isDefined)
    // the same trick on a NESTED box (stsz inside stbl) must refuse —
    // it would swallow its siblings
    assert(Mp4Index.frameIndex(zeroSize(s.indexOf("stsz"))).isEmpty)
  }

  test("fragmented: declared tracks route trafs — audio traf first is skipped") {
    val frags = Seq(samples(5, 9), samples(7))
    val f = Mp4Index.encodeSyntheticFragmented(frags, audioTrackFirst = true)
    val spans = Mp4Index.frameIndex(f).get
    assert(spans.length === 3)
    assert(spans.map(_.byteLen) === Seq(5, 9, 7))
    spans.zip(frags.flatten).foreach { case (sp, s) =>
      assert(f.slice(sp.byteStart, sp.byteStart + sp.byteLen)
        .sameElements(s), s"frame ${sp.frameIdx}")
    }
    assert(spans.map(_.isIdr) === Seq(true, false, true))
    // an init segment that declares tracks but no VIDEO one has no
    // frame stream: flip the vide handler to soun
    val idx = new String(f, "ISO-8859-1").indexOf("vide")
    val noVideo = f.clone()
    "soun".getBytes("ISO-8859-1").zipWithIndex.foreach { case (c, i) =>
      noVideo(idx + i) = c
    }
    assert(Mp4Index.frameIndex(noVideo).isEmpty)
  }

  test("fragmented: negative trun data_offset refuses at parse time") {
    val f = Mp4Index.encodeSyntheticFragmented(Seq(samples(5, 5)))
    val idx = new String(f, "ISO-8859-1").indexOf("trun")
    // data_offset u32 sits at trun fourcc + 4 (vf) + 4 (count)
    val bad = f.clone()
    bad(idx + 12) = 0xff.toByte
    assert(Mp4Index.frameIndex(bad).isEmpty)
  }

  test("audio sample table: M4A spans + entry facts; the audio side of an A/V MP4") {
    def sz(ns: Int*) = ns.map(n => Array.tabulate[Byte](n)(_.toByte))
    val m4a = Mp4Index.encodeSyntheticM4a(sz(9, 13, 11),
      sampleRate = 32000, channels = 1, samplesPerChunk = 2)
    val t = Mp4Index.audioSampleTable(m4a).get
    assert(t.offsets.toSeq === Seq(24L, 33L, 46L))
    assert(t.sizes.toSeq === Seq(9L, 13L, 11L))
    assert(t.codec === "mp4a" && t.sampleRateHz === 32000 &&
      t.channels === 1)
    // the audio trak of an A/V mux is reachable by the same call —
    // and the VIDEO walk still picks the video trak (selection is by
    // handler, both directions)
    val av = Mp4Index.encodeSynthetic(sz(7, 14, 3), syncSamples = Seq(1),
      audioTrakFirst = true)
    val at = Mp4Index.audioSampleTable(av).get
    assert(at.offsets.toSeq === Seq(24L) && at.sizes.toSeq === Seq(7L))
    assert(at.codec === "mp4a" && at.sampleRateHz === 22050 &&
      at.channels === 2)
    assert(Mp4Index.frameIndex(av).get.map(_.byteLen) === Seq(7, 14, 3))
    // a video-only MP4 has no audio table; junk refuses
    val vOnly = Mp4Index.encodeSynthetic(sz(7, 14), syncSamples = Seq(1))
    assert(Mp4Index.audioSampleTable(vOnly).isEmpty)
    assert(Mp4Index.audioSampleTable(Array[Byte](9, 9, 9, 9)).isEmpty)
  }

  test("mvhd movie duration: v0 fixture, v1 hand-built, absent, zero timescale") {
    // the real-layout fixture declares timescale 600, duration 1500
    assert(Mp4Index.movieDuration(ExternalFixtures.ffmpegStyleMp4)
      === Some((600L, 1500L)))
    // the minimal synthetic mux has no mvhd at all
    assert(Mp4Index.movieDuration(Mp4Index.encodeSynthetic(
      Seq(Array[Byte](1, 2)), syncSamples = Seq(1))).isEmpty)
    // v1: 64-bit duration at payload +24, timescale at +20
    val v1 = {
      val p = new Array[Byte](4 + 108)
      p(0) = 1
      Mp4Index.u32a(Seq(90000L)).copyToArray(p, 20)
      Mp4Index.u64a(3L << 32).copyToArray(p, 24)
      Mp4Index.box("ftyp", "isom".getBytes("ISO-8859-1") ++
        new Array[Byte](4)) ++
        Mp4Index.box("moov", Mp4Index.box("mvhd", p))
    }
    assert(Mp4Index.movieDuration(v1) === Some((90000L, 3L << 32)))
    // a zero timescale refuses (division is the caller's next step)
    val z = ExternalFixtures.ffmpegStyleMp4.clone()
    // timescale bytes sit inside moov: find mvhd and zero them
    val at = {
      val s = new String(z, "ISO-8859-1"); s.indexOf("mvhd")
    }
    java.util.Arrays.fill(z, at + 4 + 12, at + 4 + 16, 0.toByte)
    assert(Mp4Index.movieDuration(z).isEmpty)
  }

  test("seekable: a sparse >2GiB MP4 indexes from headers alone, reading kilobytes") {
    val f = java.io.File.createTempFile("graft-big", ".mp4")
    try {
      val ftyp = Mp4Index.box("ftyp",
        "isom".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0))
      val mdatPayload = 2400000000L // 2.4 GB, sparse
      val raf = new java.io.RandomAccessFile(f, "rw")
      raf.write(ftyp)
      // mdat with the 64-bit size escape (size field == 1)
      raf.write(Array[Byte](0, 0, 0, 1))
      raf.write("mdat".getBytes("ISO-8859-1"))
      raf.write(Mp4Index.u64a(16 + mdatPayload))
      val s1 = Array.tabulate[Byte](5)(i => (10 + i).toByte)
      val s2 = Array.tabulate[Byte](7)(i => (40 + i).toByte)
      val off1 = 16L + 16L + 2200000123L // > Int.MaxValue: needs co64
      val off2 = off1 + 100000019L
      raf.seek(off1); raf.write(s1)
      raf.seek(off2); raf.write(s2)
      raf.seek(16L + 16L + mdatPayload)
      raf.write(Mp4Index.encodeMoovCo64(Seq(off1, off2), Seq(5L, 7L),
        syncSamples = Seq(1)))
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
      val spans = try Mp4Index.frameIndexSeekable(counting).get
        finally counting.close()
      assert(spans.map(s => (s.byteStart, s.byteLen, s.isIdr)) ===
        Seq((off1, 5L, true), (off2, 7L, false)))
      // header-only contract: box headers + moov, never mdat
      assert(bytesRead < 10000L, s"read $bytesRead bytes")
      val r2 = new Mp4Index.FileRangeReader(f.getPath)
      try {
        assert(r2.readFully(off1, 5).sameElements(s1))
        assert(r2.readFully(off2, 7).sameElements(s2))
      } finally r2.close()
    } finally f.delete()
  }

  test("seekable: adversarial stsz counts refuse with None, never an alloc crash") {
    // boundLen exceeds Int.MaxValue on this path, so a corrupt count
    // must be caught BEFORE .toInt and before any count-sized
    // allocation: a few-KB moov claiming 2^26+ uniform samples would
    // otherwise OOM the task from a tiny input
    val moov = Mp4Index.encodeMoovCo64(Seq(48L), Seq(5L), Seq(1))
    val idx = new String(moov, "ISO-8859-1").indexOf("stsz")
    def patched(sampleSize: Long, count: Long): Array[Byte] = {
      val m = moov.clone()
      def put(at: Int, v: Long): Unit = (0 until 4).foreach { j =>
        m(at + j) = ((v >> (8 * (3 - j))) & 0xff).toByte
      }
      put(idx + 8, sampleSize) // after fourcc + vf
      put(idx + 12, count)
      m
    }
    val f = java.io.File.createTempFile("graft-adv", ".mp4")
    try {
      for ((ss, n) <- Seq((1L, (1L << 26) + 1), // over the count cap
                          (1L, 0x80000000L),    // would wrap .toInt
                          (0x10000L, 1L << 26)  // total exceeds file
                         )) {
        val raf = new java.io.RandomAccessFile(f, "rw")
        raf.setLength(0)
        raf.write(Mp4Index.box("ftyp",
          "isom".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0)))
        // sparse mdat so the file is big enough that boundLen alone
        // cannot refuse the count
        raf.write(Array[Byte](0, 0, 0, 1))
        raf.write("mdat".getBytes("ISO-8859-1"))
        raf.write(Mp4Index.u64a(16 + 2200000000L))
        raf.seek(16L + 16L + 2200000000L)
        raf.write(patched(ss, n))
        raf.close()
        val r = new Mp4Index.FileRangeReader(f.getPath)
        try assert(Mp4Index.frameIndexSeekable(r).isEmpty, s"ss=$ss n=$n")
        finally r.close()
      }
    } finally f.delete()
  }

  test("seekable agrees with the in-memory walk on multi-moov files") {
    val ss = samples(5, 7)
    val mp4 = Mp4Index.encodeSynthetic(ss, syncSamples = Seq(1))
    // first moov declares a NON-video handler (no usable video table),
    // the second is the real one — both walks must take the second
    val s = new String(mp4, "ISO-8859-1")
    val moovAt = s.lastIndexOf("moov") - 4
    val moovBytes = mp4.drop(moovAt)
    val audioMoov = {
      val m = moovBytes.clone()
      val vi = new String(m, "ISO-8859-1").indexOf("vide")
      "soun".getBytes("ISO-8859-1").zipWithIndex.foreach { case (c, j) =>
        m(vi + j) = c
      }
      m
    }
    val multi = mp4.take(moovAt) ++ audioMoov ++ moovBytes
    val mem = Mp4Index.frameIndex(multi)
    assert(mem.isDefined && mem.get.map(_.byteLen) === Seq(5, 7))
    val f = java.io.File.createTempFile("graft-multi", ".mp4")
    try {
      java.nio.file.Files.write(f.toPath, multi)
      val r = new Mp4Index.FileRangeReader(f.getPath)
      val seek = try Mp4Index.frameIndexSeekable(r).get finally r.close()
      assert(seek.map(s => (s.byteStart, s.byteLen, s.isIdr)) ===
        mem.get.map(s => (s.byteStart.toLong, s.byteLen.toLong, s.isIdr)))
    } finally f.delete()
  }

  test("seekable fragmented: a >2GiB DASH-merged shape indexes from moof headers alone") {
    // take the synthetic fragmented layout (explicit base addressing),
    // patch fragment 2's tfhd base-data-offset past 2^31, park its
    // sample bytes there under a trailing sparse mdat, and index
    // without touching either mdat's payload
    val frags = Seq(samples(5, 9), samples(7))
    val b = Mp4Index.encodeSyntheticFragmented(frags, explicitBase = true)
    val s = new String(b, "ISO-8859-1")
    val tfhd2 = s.indexOf("tfhd", s.indexOf("tfhd") + 1)
    val big = 2300000007L
    val patched = b.clone()
    (0 until 8).foreach { j =>
      patched(tfhd2 + 12 + j) = ((big >> (8 * (7 - j))) & 0xff).toByte
    }
    val f = java.io.File.createTempFile("graft-bigfrag", ".mp4")
    try {
      val fileLen = big + 7 // ends exactly at fragment 2's sample end
      val raf = new java.io.RandomAccessFile(f, "rw")
      raf.write(patched)
      // trailing sparse mdat covering [patched.length, fileLen)
      raf.write(Array[Byte](0, 0, 0, 1))
      raf.write("mdat".getBytes("ISO-8859-1"))
      raf.write(Mp4Index.u64a(fileLen - patched.length))
      raf.seek(big)
      raf.write(frags(1).head)
      raf.close()
      assert(f.length === fileLen && fileLen > Int.MaxValue.toLong)
      var bytesRead = 0L
      val inner = new Mp4Index.FileRangeReader(f.getPath)
      val counting = new Mp4Index.RangeReader {
        def length: Long = inner.length
        def readFully(at: Long, len: Int): Array[Byte] = {
          bytesRead += len; inner.readFully(at, len)
        }
        def close(): Unit = inner.close()
      }
      val spans = try Mp4Index.frameIndexSeekable(counting).get
        finally counting.close()
      assert(spans.length === 3)
      assert(spans.map(_.byteLen) === Seq(5L, 9L, 7L))
      assert(spans(2).byteStart === big && spans(2).isIdr)
      assert(bytesRead < 10000L, s"read $bytesRead bytes")
      val r2 = new Mp4Index.FileRangeReader(f.getPath)
      try assert(r2.readFully(big, 7).sameElements(frags(1).head))
      finally r2.close()
    } finally f.delete()
  }

  test("seekable fragmented: a moov AFTER the first moof refuses (8.8.4 ordering)") {
    val b = Mp4Index.encodeSyntheticFragmented(Seq(samples(5, 5)))
    // append a copy of the leading moov (16 B shell) after the stream
    val s = new String(b, "ISO-8859-1")
    val moovAt = s.indexOf("moov") - 4
    val appended = b ++ b.slice(moovAt, moovAt + 16)
    val f = java.io.File.createTempFile("graft-late-moov", ".mp4")
    try {
      java.nio.file.Files.write(f.toPath, appended)
      val r = new Mp4Index.FileRangeReader(f.getPath)
      try assert(Mp4Index.frameIndexSeekable(r).isEmpty)
      finally r.close()
    } finally f.delete()
  }

  test("seekable fragmented agrees with the in-memory walk, incl. track routing") {
    for (audioFirst <- Seq(false, true)) {
      val frags = Seq(samples(5, 9), samples(7))
      val b = Mp4Index.encodeSyntheticFragmented(frags,
        audioTrackFirst = audioFirst)
      val mem = Mp4Index.frameIndex(b).get
      val f = java.io.File.createTempFile("graft-frag", ".mp4")
      try {
        java.nio.file.Files.write(f.toPath, b)
        val r = new Mp4Index.FileRangeReader(f.getPath)
        val seek = try Mp4Index.frameIndexSeekable(r).get finally r.close()
        assert(seek.map(s => (s.byteStart, s.byteLen, s.isIdr)) ===
          mem.map(s => (s.byteStart.toLong, s.byteLen.toLong, s.isIdr)),
          s"audioFirst=$audioFirst")
      } finally f.delete()
    }
  }

  test("seekable agrees with the in-memory walk on ordinary files and refuses junk") {
    val ss = samples(7, 14, 3, 21, 9)
    val mp4 = Mp4Index.encodeSynthetic(ss, syncSamples = Seq(1, 4))
    val f = java.io.File.createTempFile("graft-small", ".mp4")
    try {
      java.nio.file.Files.write(f.toPath, mp4)
      val r = new Mp4Index.FileRangeReader(f.getPath)
      val seek = try Mp4Index.frameIndexSeekable(r).get finally r.close()
      val mem = Mp4Index.frameIndex(mp4).get
      assert(seek.map(s => (s.byteStart, s.byteLen, s.isIdr)) ===
        mem.map(s => (s.byteStart.toLong, s.byteLen.toLong, s.isIdr)))
      // junk file refuses
      java.nio.file.Files.write(f.toPath, Array[Byte](9, 9, 9, 9))
      val rj = new Mp4Index.FileRangeReader(f.getPath)
      try assert(Mp4Index.frameIndexSeekable(rj).isEmpty)
      finally rj.close()
    } finally f.delete()
  }

  test("sampler integration: MP4 sniffs first and indexes via the table") {
    val mp4 = Mp4Index.encodeSynthetic(samples(6, 6, 6, 6), Seq(1, 3))
    val spans = Mp4Index.frameIndex(mp4).get
    assert(spans.map(_.isIdr) === Seq(true, false, true, false))
    // the same bytes must NOT be claimed by the other walkers
    assert(H264Avcc.frameIndex(mp4).isEmpty)
  }

  test("ilstTags: text/int/packed/binary data atoms, postures") {
    val s9 = Seq(Array.fill[Byte](9)(3))
    val tagged = Mp4Index.encodeSyntheticM4a(s9,
      udta = Mp4Index.ilstBox(Seq(
        ("©nam", Mp4Index.ilstData(1, "Café Voyage".getBytes("UTF-8"))),
        ("tmpo", Mp4Index.ilstData(21, Array[Byte](0, 120))),
        ("tmp2", Mp4Index.ilstData(21, Array[Byte](0xff.toByte, 0x9c.toByte))),
        ("trkn", Mp4Index.ilstData(0,
          Array[Byte](0, 0, 0, 3, 0, 12, 0, 0))),
        ("disk", Mp4Index.ilstData(0, Array[Byte](0, 0, 0, 1, 0, 2))),
        ("covr", Mp4Index.ilstData(14, Array.fill[Byte](24)(0x42))))))
    val ts = Mp4Index.ilstTags(tagged).get
    assert(ts.map(t => (t.name, t.dataType, t.value, t.binary)) === Seq(
      ("©nam", 1, "Café Voyage", false),
      ("tmpo", 21, "120", false),
      ("tmp2", 21, "-100", false), // sign-extended negative int
      ("trkn", 0, "3/12", false),
      ("disk", 0, "1/2", false),
      ("covr", 14, "", true)))
    // no udta -> Some(empty); item without a data atom -> refuse;
    // junk -> None
    assert(Mp4Index.ilstTags(
      Mp4Index.encodeSyntheticM4a(s9)).get.isEmpty)
    assert(Mp4Index.ilstTags(Mp4Index.encodeSyntheticM4a(s9,
      udta = Mp4Index.ilstBox(Seq(("©nam", Array.empty[Byte]))))).isEmpty)
    assert(Mp4Index.ilstTags(Array[Byte](9, 9, 9, 9)).isEmpty)
    // `free` padding inside ilst (editing taggers leave it when tags
    // shrink) is skipped, never a refusal, and does not shift indices
    val padded = Mp4Index.encodeSyntheticM4a(s9,
      udta = Mp4Index.ilstBox(Seq(
        ("©nam", Mp4Index.ilstData(1, "Keep".getBytes("UTF-8"))),
        ("free", Array.fill[Byte](16)(0)),
        ("©alb", Mp4Index.ilstData(1, "Also".getBytes("UTF-8"))))))
    assert(Mp4Index.ilstTags(padded).get.map(t => (t.itemIdx, t.name,
      t.value)) === Seq((0, "©nam", "Keep"), (1, "©alb", "Also")))
    // a corrupt moov (child overrunning its payload) flags the asset —
    // NOT "indexed, no tags" (absent-vs-corrupt must not conflate)
    val base = Mp4Index.encodeSyntheticM4a(s9)
    val moovBox = Mp4Index.boxes(base, 0, base.length, topLevel = true)
      .get.find(_.fourcc == "moov").get
    val bad = base.clone()
    bad(moovBox.payloadStart) = 0x7f // trak's size high byte: huge
    assert(Mp4Index.ilstTags(bad).isEmpty)
    // the tagged fixture still audio-indexes (udta must not disturb
    // the sample-table walk)
    assert(Mp4Index.audioSampleTable(tagged).nonEmpty)
    // the seekable twin IS the in-memory walk (one implementation:
    // the fetched moov slice), mdat skipped by seek
    assert(Mp4Index.ilstTagsSeekable(
      new Mp4Index.BytesRangeReader(tagged)).get === ts)
    // a moov past the metadata cap refuses instead of allocating
    assert(Mp4Index.ilstTagsSeekable(
      new Mp4Index.BytesRangeReader(tagged), maxMetaBytes = 16).isEmpty)
  }
}
