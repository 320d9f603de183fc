package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The no-throw contract, enforced mechanically: EVERY container
  * walker documents "corrupt bytes yield None, never an exception".
  * This spec drives each walker with (a) deterministic pseudo-random
  * byte blobs, (b) valid fixtures with every single byte flipped in
  * turn (truncation-free corruption), and (c) random truncations of
  * valid fixtures — and asserts no call ever throws. The Spark seams
  * mask walker exceptions behind NonFatal catches; this pins the
  * stronger direct-caller contract the docs promise.
  */
class WalkerFuzzSpec extends AnyFunSuite {

  // every byte-column walker in the engine, by name
  private val walkers: Seq[(String, Array[Byte] => Any)] = Seq(
    ("Mp3Frames", Mp3Frames.frameIndex _),
    ("AdtsAac", AdtsAac.frameIndex _),
    ("FlacIndex", FlacIndex.frameIndex _),
    ("OggIndex", OggIndex.pageIndex _),
    ("MpegTs", MpegTs.unitIndex _),
    ("Mp4Index.frameIndex", Mp4Index.frameIndex _),
    ("Mp4Index.audio", Mp4Index.audioSampleTable(_: Array[Byte])),
    ("MkvIndex", MkvIndex.frameIndex _),
    ("DkifIndex", DkifIndex.frameIndex _),
    ("H264AnnexB", H264AnnexB.frameIndex _),
    ("H264Avcc", H264Avcc.frameIndex _),
    ("H265.annexb", (b: Array[Byte]) => H265.frameIndexAnnexB(b)),
    ("H265.hvcc", (b: Array[Byte]) => H265.frameIndexHvcc(b)),
    ("Mp4Index.frag", Mp4Index.fragmentIndex _),
    ("AviMjpeg", AviMjpeg.frameChunks _),
    ("WavIndex", WavIndex.info _),
    ("ImageDims", ImageDims.dims _),
    ("ImageDims.orient", (b: Array[Byte]) => ImageDims.jpegOrientation(b)),
    ("MediaTags", MediaTags.tags _),
    ("Warc", graft.io.Warc.recordIndex _),
    ("Tar", graft.io.Tar.entryIndex _),
    ("ZipIndex", graft.io.ZipIndex.entryIndex _),
    ("GzipMembers", graft.io.GzipMembers.memberIndex _),
    ("TfRecord", graft.io.TfRecord.recordIndex _),
    ("Mp4Index.codecInfo", Mp4Index.videoCodecInfo _),
    ("MkvIndex.videoTrack", MkvIndex.videoTrack _),
    ("MkvIndex.audioTracks", MkvIndex.audioTracks _),
    ("MkvIndex.duration", MkvIndex.segmentDuration _),
    ("MkvIndex.privateKind",
      (b: Array[Byte]) => MkvIndex.audioPrivateKind(b, 0, b.length)),
    ("CodecConfigs.av1C",
      (b: Array[Byte]) => CodecConfigs.parseAv1C(b, 0, b.length)),
    ("CodecConfigs.vpcC",
      (b: Array[Byte]) => CodecConfigs.parseVpcC(b, 0, b.length)),
    ("CodecConfigs.avcC",
      (b: Array[Byte]) => CodecConfigs.parseAvcC(b, 0, b.length)),
    ("CodecConfigs.hvcC",
      (b: Array[Byte]) => CodecConfigs.parseHvcC(b, 0, b.length)),
    ("CodecConfigs.vp9cp",
      (b: Array[Byte]) => CodecConfigs.parseVp9Private(b, 0, b.length)),
    ("Mp4Index.codecSeek", (b: Array[Byte]) =>
      Mp4Index.videoCodecInfoSeekable(new Mp4Index.BytesRangeReader(b))),
    ("MkvIndex.tracksSeek", (b: Array[Byte]) =>
      MkvIndex.trackPayloadsSeekable(new Mp4Index.BytesRangeReader(b))),
    ("Mp4Index.audioCodec", Mp4Index.audioCodecInfo _),
    ("MkvIndex.subtitles", MkvIndex.subtitleCues _),
    ("MkvIndex.attachments", MkvIndex.attachments _),
    ("MkvIndex.chapters", MkvIndex.chapters _),
    ("MkvIndex.mkvTags", MkvIndex.mkvTags _),
    ("Mp4Index.ilstTags", Mp4Index.ilstTags _),
    ("Mp4Index.ilstSeek", (b: Array[Byte]) =>
      Mp4Index.ilstTagsSeekable(new Mp4Index.BytesRangeReader(b))),
    ("CodecConfigs.esds",
      (b: Array[Byte]) => CodecConfigs.parseEsds(b, 0, b.length)),
    ("CodecConfigs.dOps",
      (b: Array[Byte]) => CodecConfigs.parseDOps(b, 0, b.length)),
    ("WarcCdx", (b: Array[Byte]) => graft.io.WarcCdx.cdxIndex(b)))

  // small valid fixtures, one per family, as corruption bases
  private def fixtures: Seq[Array[Byte]] = Seq(
    Mp3Frames.encodeSynthetic(Seq((9, 0), (9, 1))),
    AdtsAac.encodeSynthetic(Seq(40, 50)),
    FlacIndex.encodeSynthetic(Seq((256, 30), (256, 40)),
      comments = Seq(("k", "v"))),
    OggIndex.encodeSynthetic(Seq((Seq(Array.fill[Byte](19)(3)), 0L,
      true, true))),
    MpegTs.encodeSynthetic(Seq(MpegTs.SynthUnit(0x100,
      Array.fill[Byte](50)(7), 0L, randomAccess = true),
      MpegTs.SynthUnit(0x100, Array.fill[Byte](50)(8), 1L,
        randomAccess = false))),
    Mp4Index.encodeSynthetic(Seq(Array.fill[Byte](9)(1),
      Array.fill[Byte](7)(2)), syncSamples = Seq(1)),
    MkvIndex.encodeSynthetic(Seq((Array.fill[Byte](5)(1), true))),
    DkifIndex.encodeSynthetic("VP90", Seq((Array.fill[Byte](8)(2), true))),
    graft.io.Warc.encodeSynthetic(Seq(("warcinfo", "", "text/plain",
      "x\r\n".getBytes("ISO-8859-1")))),
    graft.io.Tar.encodeSynthetic(Seq(("a.txt", Array.fill[Byte](40)(5),
      0L))),
    graft.io.TfRecord.encodeSynthetic(Seq(Array.fill[Byte](30)(6))),
    graft.io.Warc.gzipPerRecord(Seq(Array.fill[Byte](64)(9))),
    // a valid per-record .warc.gz: byte-flips exercise the CDX
    // member walk AND the single-record parse behind it
    graft.io.Warc.gzipPerRecord(Seq(graft.io.Warc.encodeSyntheticHeaders(
      Seq((Seq("WARC-Type" -> "response",
        "WARC-Date" -> "2024-03-05T06:07:08Z",
        "WARC-Target-URI" -> "http://fuzz.example/",
        "Content-Type" -> "application/http; msgtype=response"),
        graft.io.Warc.httpResponse(200, "OK",
          Seq("Content-Type" -> "text/html"),
          "<html><body>f</body></html>".getBytes("UTF-8"))))))),
    ExternalFixtures.libavifStyleAvif(),
    ExternalFixtures.ffmpegStyleAdts,
    // near-valid bases for the walkers the list would otherwise only
    // feed foreign-format noise (which dies at the first signature)
    {
      val out = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(out)
      val e = new java.util.zip.ZipEntry("a/x.html")
      z.putNextEntry(e)
      z.write("<html><body><p>hi</p></body></html>".getBytes("UTF-8"))
      z.closeEntry(); z.close()
      out.toByteArray
    },
    H264AnnexB.encodeSynthetic(Seq(true, false)),
    ExternalFixtures.avccHighStream,
    H265.encodeSynthetic(Seq(true, false)),
    H265.encodeSyntheticHvcc(Seq(true, false)),
    Mp4Index.encodeSyntheticFragmented(
      Seq(Seq(Array.fill[Byte](6)(1), Array.fill[Byte](7)(2)))),
    Mp4Index.encodeSyntheticM4a(Seq(Array.fill[Byte](9)(3))),
    ExternalFixtures.ffmpegStyleWebm,
    ExternalFixtures.lameStyleMp3,
    ExternalFixtures.libflacStyleFlac,
    MkvIndex.encodeSyntheticAudio(Seq(
      ("A_OPUS", 2, 48000.0, Some(MkvIndex.encodeOpusHead(2, 48000)))),
      durationTicks = Some(1000.0)),
    MkvIndex.encodeSyntheticSubtitles(Seq(
      (0L, 900L, "fuzz cue one"), (1500L, -1L, "two"))),
    // the ASS carriage: byte-flips must exercise the field-split path
    MkvIndex.encodeSyntheticSubtitles(Seq(
      (0L, 900L, "0,0,Default,,0,0,0,,fuzz\\Ncue"),
      (1500L, -1L, "1,0,Default,,0,0,0,,two")), codecId = "S_TEXT/ASS"),
    MkvIndex.encodeSyntheticAttachments(Seq(
      ("cover.png", "image/png", 7L, Array.fill[Byte](40)(0x11)),
      ("notes.txt", "text/plain", -1L, "fuzz".getBytes("UTF-8")))),
    MkvIndex.encodeSyntheticChapters(Seq(Seq(
      MkvIndex.ChapterSpec(1L, 0L, 9000000000L, "One", "eng",
        children = Seq(MkvIndex.ChapterSpec(2L, 1L, -1L, "Two", null))),
      MkvIndex.ChapterSpec(3L, 9000000000L, -1L, null, null)))),
    MkvIndex.encodeSyntheticTags(Seq(
      (50L, 0L, Seq(MkvIndex.TagSpec("TITLE", "Fuzz",
        children = Seq(MkvIndex.TagSpec("SORT_WITH", "fuzz"))))),
      (30L, 7L, Seq(MkvIndex.TagSpec("ARTIST", null))))),
    Mp4Index.encodeSyntheticM4a(Seq(Array.fill[Byte](9)(3)),
      udta = Mp4Index.ilstBox(Seq(
        ("©nam", Mp4Index.ilstData(1, "fuzz".getBytes("UTF-8"))),
        ("trkn", Mp4Index.ilstData(0,
          Array[Byte](0, 0, 0, 3, 0, 12, 0, 0)))))),
    Mp4Index.encodeSynthetic(Seq(Array.fill[Byte](6)(1)),
      syncSamples = Seq(1),
      videoEntry = Some(Mp4Index.videoSampleEntry("av01",
        Some(("av1C", CodecConfigs.encodeAv1CRecord(0, 8)))))))

  private def rnd(seed: Int, n: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](n)
    r.nextBytes(b)
    b
  }

  test("random blobs never throw in any walker") {
    for (seed <- 0 until 40; n <- Seq(0, 1, 7, 64, 513, 4096)) {
      val blob = rnd(seed * 31 + n, n)
      walkers.foreach { case (name, w) =>
        try w(blob)
        catch { case e: Throwable =>
          fail(s"$name threw ${e.getClass.getSimpleName} on " +
            s"seed=$seed n=$n: ${e.getMessage}")
        }
      }
    }
  }

  test("every single-byte corruption of valid fixtures never throws") {
    fixtures.foreach { fx =>
      var i = 0
      while (i < fx.length) {
        val c = fx.clone(); c(i) = (c(i) ^ 0xff).toByte
        walkers.foreach { case (name, w) =>
          try w(c)
          catch { case e: Throwable =>
            fail(s"$name threw ${e.getClass.getSimpleName} flipping " +
              s"byte $i of a ${fx.length}-byte fixture: ${e.getMessage}")
          }
        }
        i += 1
      }
    }
  }

  test("random truncations of valid fixtures never throw") {
    val r = new java.util.Random(42)
    fixtures.foreach { fx =>
      (0 until 25).foreach { _ =>
        val cut = r.nextInt(fx.length + 1)
        val c = java.util.Arrays.copyOfRange(fx, 0, cut)
        walkers.foreach { case (name, w) =>
          try w(c)
          catch { case e: Throwable =>
            fail(s"$name threw ${e.getClass.getSimpleName} on a " +
              s"$cut-byte truncation: ${e.getMessage}")
          }
        }
      }
    }
  }
}
