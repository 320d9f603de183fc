package graft.analytics

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal decode under the correctness gate. The test tables carry
  * no media columns, so the assets are GENERATED at plan-build time —
  * driver-side ImageIO-encoded PNGs with known pixels (lossless, so
  * decoded dimensions/channels/luma are exact constants) plus one junk
  * blob. The oracle states those constants: a codec, schema, or
  * fallback regression hash-fails.
  */
object MultimodalQueries {

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** PNG decode: exact dimensions/channels + Rec.601 luma of solid-
    * color images (white=1, black=0, pure red=0.299), junk flagged
    * undecoded.
    */
  val qMultimodalDecode: QueryDef = QueryDef.sql(
    "q_multimodal_decode",
    """SELECT * FROM (VALUES
      |  (1, 3, 2, 3, CAST(1.0 AS DOUBLE), true),
      |  (2, 5, 4, 3, CAST(0.0 AS DOUBLE), true),
      |  (3, 4, 4, 3, CAST(0.299 AS DOUBLE), true),
      |  (4, NULL, NULL, NULL, NULL, false))
      |  AS t(asset_id, width, height, channels, mean_luma, decoded)
      |ORDER BY asset_id""".stripMargin,
    doc = "JDK ImageIO decode of generated PNGs (multimodal ops)") { (s, dir) =>
    import s.implicits._
    val assets = Seq(
      (1L, "mem://white.png", png(3, 2, 0xFFFFFF)),
      (2L, "mem://black.png", png(5, 4, 0x000000)),
      (3L, "mem://red.png", png(4, 4, 0xFF0000)),
      (4L, "mem://junk.png", Array[Byte](9, 9, 9))
    ).toDF("id", "uri", "bytes")
    val feats = Multimodal.extractImageFeatures(
      Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s))(s)
    feats.select(col("asset_id"),
        when(col("decoded"), col("width")).as("width"),
        when(col("decoded"), col("height")).as("height"),
        when(col("decoded"), col("channels")).as("channels"),
        when(col("decoded"), round(col("mean_luma"), 6).cast("double"))
          .as("mean_luma"),
        col("decoded"))
      .orderBy("asset_id")
  }

  private def wav(rate: Float, nFrames: Int, amplitude: Short): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s: Short = if (i % 2 == 0) amplitude else (-amplitude).toShort
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

  /** WAV decode: exact format constants + RMS of generated square
    * waves (amplitude 16384/32768 → rms exactly 0.5; PCM is lossless).
    */
  val qMultimodalAudio: QueryDef = QueryDef.sql(
    "q_multimodal_audio",
    """SELECT * FROM (VALUES
      |  (1, CAST(8000.0 AS DOUBLE), 1, 800, CAST(0.1 AS DOUBLE), CAST(0.5 AS DOUBLE), true),
      |  (2, CAST(16000.0 AS DOUBLE), 1, 3200, CAST(0.2 AS DOUBLE), CAST(0.25 AS DOUBLE), true),
      |  (3, NULL, NULL, NULL, NULL, NULL, false))
      |  AS t(asset_id, sample_rate, channels, n_frames, duration_sec, rms, decoded)
      |ORDER BY asset_id""".stripMargin,
    doc = "JDK WAV/PCM decode of generated square waves (multimodal ops)") { (s, dir) =>
    import s.implicits._
    val assets = Seq(
      (1L, "mem://half.wav", wav(8000f, 800, 16384)),
      (2L, "mem://quarter.wav", wav(16000f, 3200, 8192)),
      (3L, "mem://junk.wav", Array[Byte](7, 7))
    ).toDF("id", "uri", "bytes")
    val feats = Multimodal.extractAudioFeatures(
      Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s))(s)
    feats.select(col("asset_id"),
        when(col("decoded"), col("sample_rate")).as("sample_rate"),
        when(col("decoded"), col("channels")).as("channels"),
        when(col("decoded"), col("n_frames").cast("int")).as("n_frames"),
        when(col("decoded"), round(col("duration_sec"), 6).cast("double"))
          .as("duration_sec"),
        when(col("decoded"), round(col("rms"), 6).cast("double")).as("rms"),
        col("decoded"))
      .orderBy("asset_id")
  }

  /** Resize → re-decode round trip: solid-color PNGs resized to 4×4
    * must decode back at the target shape with their exact luma
    * (bilinear resampling of a constant field is the constant).
    */
  val qMultimodalResize: QueryDef = QueryDef.sql(
    "q_multimodal_resize",
    """SELECT * FROM (VALUES
      |  (1, 4, 4, CAST(1.0 AS DOUBLE), true),
      |  (2, 4, 4, CAST(0.0 AS DOUBLE), true))
      |  AS t(asset_id, width, height, mean_luma, decoded)
      |ORDER BY asset_id""".stripMargin,
    doc = "JDK resize + re-decode round trip (multimodal ops)") { (s, dir) =>
    import s.implicits._
    val assets = Seq(
      (1L, "mem://white.png", png(8, 6, 0xFFFFFF)),
      (2L, "mem://black.png", png(10, 10, 0x000000))
    ).toDF("id", "uri", "bytes")
    val resized = Multimodal.resizeImages(
      Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s), 4, 4)(s)
    val reassets = resized.filter(col("decoded"))
      .map(r => Multimodal.MediaAsset(r.asset_id, "image",
        s"mem://resized-${r.asset_id}.png", r.content, r.content.length.toLong))
    Multimodal.extractImageFeatures(reassets)(s)
      .select(col("asset_id"), col("width"), col("height"),
        round(col("mean_luma"), 6).cast("double").as("mean_luma"),
        col("decoded"))
      .orderBy("asset_id")
  }

  /** Video frame sampling: a generated MJPEG-in-AVI clip of solid-gray
    * frames (gray levels 51/204/128 → luma 0.2/0.8/0.5 — JPEG DC
    * roundtrip error on a solid frame is ≤ ~0.004, two orders inside
    * the round-1 bins) sampled at stride 2; junk bytes flag the
    * single `decoded = false` fallback row. Exact frame indexes,
    * dimensions and per-frame luma — a codec, chunk-walk, or sampling
    * regression hash-fails.
    */
  val qMultimodalVideo: QueryDef = QueryDef.sql(
    "q_multimodal_video",
    """SELECT * FROM (VALUES
      |  (1, 0, 16, 12, CAST(0.2 AS DOUBLE), true),
      |  (1, 2, 16, 12, CAST(0.8 AS DOUBLE), true),
      |  (1, 4, 16, 12, CAST(0.5 AS DOUBLE), true),
      |  (2, -1, NULL, NULL, NULL, false))
      |  AS t(asset_id, frame_idx, width, height, mean_luma, decoded)
      |ORDER BY asset_id, frame_idx""".stripMargin,
    doc = "MJPEG-AVI frame sampling with selective decode (multimodal ops)") { (s, dir) =>
    import s.implicits._
    import graft.multimodal.AviMjpeg
    def gray(g: Int) = AviMjpeg.solidFrame(16, 12, (g << 16) | (g << 8) | g)
    // frames 0..4: sampled indexes 0,2,4 → grays 51,204,128
    val clip = AviMjpeg.encode(
      Seq(gray(51), gray(99), gray(204), gray(99), gray(128)), fps = 10)
    val assets = Seq(
      (1L, "mem://clip.avi", clip),
      (2L, "mem://junk.avi", Array[Byte](1, 2, 3))
    ).toDF("id", "uri", "bytes")
    Multimodal.sampleVideoFrames(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
        stride = 2, maxFrames = 3)(s)
      .select(col("asset_id"), col("frame_idx"),
        when(col("decoded"), col("width")).as("width"),
        when(col("decoded"), col("height")).as("height"),
        when(col("decoded"), round(col("mean_luma"), 1).cast("double"))
          .as("mean_luma"),
        col("decoded"))
      .orderBy("asset_id", "frame_idx")
  }

  /** PNG with per-pixel control for perceptual-hash contracts. */
  private def pngPattern(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, f(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Perceptual image near-dup: aHash fingerprints (8×8 luma grid →
    * 64-bit) banded into Hamming pairs via the shared
    * [[graft.dedup.Dedup.signatureNearDupPairs]] engine. Planted
    * contract: a 16×16 checkerboard vs the same board with ONE 2×2
    * block flipped differs in exactly that one grid cell (distance 1);
    * the inverse board flips all 64 bits and a horizontal gradient
    * lands ~half the board away — neither can pair at distance ≤ 3.
    */
  val qMultimodalPhash: QueryDef = QueryDef.sql(
    "q_multimodal_phash",
    """SELECT * FROM (VALUES (1, 2, 1)) AS t(id_a, id_b, distance)
      |ORDER BY id_a, id_b""".stripMargin,
    doc = "perceptual-hash image near-dup pairs, banded Hamming join (multimodal ops)") { (s, dir) =>
    import s.implicits._
    def checker(flip: Boolean): Array[Byte] = pngPattern(16, 16) { (x, y) =>
      val cellWhite = ((x / 2) + (y / 2)) % 2 == 0
      val white = if (flip && x < 2 && y < 2) !cellWhite else cellWhite
      if (white) 0xFFFFFF else 0x000000
    }
    val inverse = pngPattern(16, 16) { (x, y) =>
      if (((x / 2) + (y / 2)) % 2 == 0) 0x000000 else 0xFFFFFF
    }
    val gradient = pngPattern(16, 16)((x, _) => {
      val v = x * 255 / 15; (v << 16) | (v << 8) | v
    })
    val assets = Seq(
      (1L, "mem://checker.png", checker(flip = false)),
      (2L, "mem://checker_flip.png", checker(flip = true)),
      (3L, "mem://inverse.png", inverse),
      (4L, "mem://gradient.png", gradient)
    ).toDF("id", "uri", "bytes")
    val hashes = graft.multimodal.Multimodal.extractImageHashes(
      graft.multimodal.Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s))(s)
    graft.dedup.Dedup.signatureNearDupPairs(hashes.toDF(), "asset_id", "phash",
        maxDistance = 3)
      .select(col("id_a").cast("int").as("id_a"),
        col("id_b").cast("int").as("id_b"),
        col("distance").cast("int").as("distance"))
      .orderBy("id_a", "id_b")
  }

  /** WAV whose per-segment loudness follows `loud` (64 entries, 100
    * samples each): loud segments are a full-scale-half square wave
    * (RMS exactly amp/32768), quiet segments are silence (RMS 0) —
    * so the energy-envelope hash bits are known by construction. */
  private def wavEnvelope(loud: Int => Boolean, amp: Short): Array[Byte] = {
    import javax.sound.sampled._
    val nFrames = 64 * 100
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s: Short =
        if (!loud(i / 100)) 0
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

  /** Audio energy-envelope near-dup: 64-segment RMS hashes banded into
    * Hamming pairs via the same shared
    * [[graft.dedup.Dedup.signatureNearDupPairs]] engine as text
    * SimHash and image aHash. Planted contract: an alternating
    * loud/quiet envelope vs the same envelope with ONE segment muted
    * differs in exactly that segment's bit (distance 1 — muting one of
    * 32 loud segments keeps the mean strictly between silence and the
    * loud RMS); the inverted envelope flips all 64 bits and an
    * always-loud clip hashes to 0 (no segment exceeds the mean) —
    * neither can pair at distance ≤ 3.
    */
  val qMultimodalAudioNeardup: QueryDef = QueryDef.sql(
    "q_multimodal_audio_neardup",
    """SELECT * FROM (VALUES (1, 2, 1)) AS t(id_a, id_b, distance)
      |ORDER BY id_a, id_b""".stripMargin,
    doc = "audio energy-envelope near-dup pairs, banded Hamming join (multimodal ops)") { (s, dir) =>
    import s.implicits._
    val assets = Seq(
      (1L, "mem://alt.wav", wavEnvelope(seg => seg % 2 == 0, 16384)),
      (2L, "mem://alt_mute1.wav",
        wavEnvelope(seg => seg % 2 == 0 && seg != 0, 16384)),
      (3L, "mem://inverse.wav", wavEnvelope(seg => seg % 2 == 1, 16384)),
      (4L, "mem://flat.wav", wavEnvelope(_ => true, 16384))
    ).toDF("id", "uri", "bytes")
    val hashes = Multimodal.extractAudioHashes(
      Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s))(s)
    graft.dedup.Dedup.signatureNearDupPairs(
        hashes.filter(col("decoded")).toDF(), "asset_id", "ahash",
        maxDistance = 3)
      .select(col("id_a").cast("int").as("id_a"),
        col("id_b").cast("int").as("id_b"),
        col("distance").cast("int").as("distance"))
      .orderBy("id_a", "id_b")
  }

  /** Video near-dup: majority-bit clip signatures over sampled frame
    * aHashes, banded by the same shared Hamming engine. The frames are
    * half-black/half-white (low-frequency — MJPEG-roundtrip-safe: cell
    * lumas sit ~0.5 from the grid mean, two orders above JPEG error on
    * a step edge). Planted contract: inverting ONE grid cell in 3 of a
    * clip's 5 frames flips exactly that bit of the majority signature
    * (distance 1); inverting it in only 2 frames loses the majority
    * vote (distance 0 — the outlier-frame robustness the clip-level
    * hash exists for); the fully-inverted clip flips all 64 bits and
    * cannot pair at distance ≤ 3.
    */
  val qMultimodalVideoNeardup: QueryDef = QueryDef.sql(
    "q_multimodal_video_neardup",
    """SELECT * FROM (VALUES (1, 2, 0), (1, 3, 1), (2, 3, 1))
      |  AS t(id_a, id_b, distance)
      |ORDER BY id_a, id_b""".stripMargin,
    doc = "video clip near-dup pairs via frame-majority signatures (multimodal ops)") { (s, dir) =>
    import s.implicits._
    import graft.multimodal.AviMjpeg
    def frame(invertCell: Boolean, invertAll: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) {
          val baseWhite = x >= 8
          val cellFlip = invertCell && x >= 14 && y < 2 // grid cell (7,0)
          val white = (baseWhite != cellFlip) != invertAll
          img.setRGB(x, y, if (white) 0xFFFFFF else 0x000000)
          x += 1
        }
        y += 1
      }
      img
    }
    val base = frame(invertCell = false, invertAll = false)
    val edit = frame(invertCell = true, invertAll = false)
    val inv = frame(invertCell = false, invertAll = true)
    val assets = Seq(
      (1L, "mem://base.avi",
        AviMjpeg.encode(Seq(base, base, base, base, base), fps = 10)),
      (2L, "mem://minority_edit.avi",
        AviMjpeg.encode(Seq(edit, base, edit, base, base), fps = 10)),
      (3L, "mem://majority_edit.avi",
        AviMjpeg.encode(Seq(edit, edit, base, edit, base), fps = 10)),
      (4L, "mem://inverse.avi",
        AviMjpeg.encode(Seq(inv, inv, inv, inv, inv), fps = 10)),
      (5L, "mem://junk.avi", Array[Byte](3, 1, 4))
    ).toDF("id", "uri", "bytes")
    val hashes = Multimodal.extractVideoHashes(
      Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
      stride = 1, maxFrames = 5)(s)
    graft.dedup.Dedup.signatureNearDupPairs(
        hashes.filter(col("decoded")).toDF(), "asset_id", "vhash",
        maxDistance = 3)
      .select(col("id_a").cast("int").as("id_a"),
        col("id_b").cast("int").as("id_b"),
        col("distance").cast("int").as("distance"))
      .orderBy("id_a", "id_b")
  }

  /** H.264 frame-range indexing ([[graft.multimodal.H264AnnexB]]): a
    * synthetic Annex-B stream of 5 frames (IDR at 0 and 3, each frame
    * = one first_mb==0 slice + one continuation slice that must NOT
    * split the frame) sampled at stride 2 → exact byte spans: frame 0
    * owns the stream head (SPS 8 B + PPS 7 B + two 7 B slices = 29),
    * every later frame is two slices (14 B). Junk bytes flag the
    * single `indexed = false` fallback row. A start-code, exp-Golomb,
    * or AU-grouping regression hash-fails.
    */
  val qMultimodalH264Index: QueryDef = QueryDef.sql(
    "q_multimodal_h264_index",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(0 AS BIGINT), CAST(29 AS BIGINT), true, true),
      |  (1, 2, CAST(43 AS BIGINT), CAST(14 AS BIGINT), false, true),
      |  (1, 4, CAST(71 AS BIGINT), CAST(14 AS BIGINT), false, true),
      |  (2, -1, NULL, NULL, NULL, false))
      |  AS t(asset_id, frame_idx, byte_start, byte_len, is_idr, indexed)
      |ORDER BY asset_id, frame_idx""".stripMargin,
    doc = "H.264 Annex-B access-unit byte-range index + stride sampling " +
      "(multimodal ops; decode is the documented external-seam stub)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.H264AnnexB
    val stream = H264AnnexB.encodeSynthetic(
      Seq(true, false, false, true, false), extraSlices = 1)
    val assets = Seq(
      (1L, "mem://clip.h264", stream),
      (2L, "mem://junk.h264", Array[Byte](9, 9, 9, 9))
    ).toDF("id", "uri", "bytes")
    Multimodal.sampleH264Frames(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
        stride = 2, maxFrames = 5)(s)
      .select(col("asset_id"), col("frame_idx"),
        when(col("indexed"), col("byte_start")).as("byte_start"),
        when(col("indexed"), col("byte_len")).as("byte_len"),
        when(col("indexed"), col("is_idr")).as("is_idr"),
        col("indexed"))
      .orderBy("asset_id", "frame_idx")
  }

  /** AVCC (length-prefixed, MP4/MKV-framing) H.264 indexing
    * ([[graft.multimodal.H264Avcc]]) beside Annex-B in ONE sampling
    * pass — the container real corpora actually carry. Byte-exact
    * oracle: the 4-byte-length clip's avcC record is 18 B (1+3+1+1 +
    * 2+4 SPS + 1 + 2+3 PPS), each frame = primary + continuation
    * slice at 7 B apiece (4 B length + 1 B header + 2 B payload), and
    * spans cover SAMPLE bytes only (parameter sets are out-of-band in
    * the record, unlike Annex-B where frame 0 carries them inline —
    * asset 2 pins that contrast in the same result). The 2-byte-length
    * clip (asset 4, 5 B per slice NAL) pins lengthSizeMinusOne
    * handling; junk pins the flagged fallback. A length-walk,
    * config-parse, or sniff-order regression hash-fails.
    */
  val qMultimodalAvccIndex: QueryDef = QueryDef.sql(
    "q_multimodal_avcc_index",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(18 AS BIGINT), CAST(14 AS BIGINT), true, true),
      |  (1, 2, CAST(46 AS BIGINT), CAST(14 AS BIGINT), false, true),
      |  (1, 4, CAST(74 AS BIGINT), CAST(14 AS BIGINT), false, true),
      |  (2, 0, CAST(0 AS BIGINT), CAST(29 AS BIGINT), true, true),
      |  (2, 2, CAST(43 AS BIGINT), CAST(14 AS BIGINT), false, true),
      |  (2, 4, CAST(71 AS BIGINT), CAST(14 AS BIGINT), false, true),
      |  (3, -1, NULL, NULL, NULL, false),
      |  (4, 0, CAST(18 AS BIGINT), CAST(5 AS BIGINT), true, true),
      |  (5, 0, CAST(47 AS BIGINT), CAST(25 AS BIGINT), true, true),
      |  (5, 2, CAST(89 AS BIGINT), CAST(17 AS BIGINT), false, true))
      |  AS t(asset_id, frame_idx, byte_start, byte_len, is_idr, indexed)
      |ORDER BY asset_id, frame_idx""".stripMargin,
    doc = "H.264 AVCC (length-prefixed) frame index beside Annex-B in one " +
      "pass (multimodal ops; decode is the documented external-seam stub)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.{H264AnnexB, H264Avcc}
    val idrs = Seq(true, false, false, true, false)
    val assets = Seq(
      (1L, "mem://clip.mp4",
        H264Avcc.encodeSynthetic(idrs, extraSlices = 1)),
      (2L, "mem://clip.h264",
        H264AnnexB.encodeSynthetic(idrs, extraSlices = 1)),
      (3L, "mem://junk.mp4", Array[Byte](9, 9, 9, 9)),
      (4L, "mem://short.mkv",
        H264Avcc.encodeSynthetic(Seq(true, false), lengthSize = 2)),
      // real-layout fixture (x264-shaped High-profile record incl.
      // the chroma/bit-depth extension): 47 B header, frames at
      // 47/72/89 of 25/17/17 B — NOT produced by the repo's encoder
      (5L, "mem://x264.mp4", graft.multimodal.ExternalFixtures.avccHighStream)
    ).toDF("id", "uri", "bytes")
    Multimodal.sampleH264Frames(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
        stride = 2, maxFrames = 5)(s)
      .select(col("asset_id"), col("frame_idx"),
        when(col("indexed"), col("byte_start")).as("byte_start"),
        when(col("indexed"), col("byte_len")).as("byte_len"),
        when(col("indexed"), col("is_idr")).as("is_idr"),
        col("indexed"))
      .orderBy("asset_id", "frame_idx")
  }

  /** Real-container MP4 indexing ([[graft.multimodal.Mp4Index]]): the
    * `stbl` sample table IS the frame index — no codec parsing at
    * all. Byte-exact oracle derived from the box layout: `ftyp` is
    * 16 B, `mdat` payload starts at 24; samples of sizes
    * (7,14,3,21,9) packed 2-per-chunk sit at offsets
    * 24/31 · 45/48 · 69 (chunk offsets from `stco`, intra-chunk
    * packing from `stsz` prefix sums, sample→chunk mapping from the
    * `stsc` run); `stss` = {1,4} flags the sync samples. Stride-2
    * sampling keeps frames 0/2/4; junk pins the flagged fallback. A
    * box-walk, stsc-expansion, or offset-arithmetic regression
    * hash-fails.
    */
  val qMultimodalMp4Index: QueryDef = QueryDef.sql(
    "q_multimodal_mp4_index",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(24 AS BIGINT), CAST(7 AS BIGINT), true, true),
      |  (1, 2, CAST(45 AS BIGINT), CAST(3 AS BIGINT), false, true),
      |  (1, 4, CAST(69 AS BIGINT), CAST(9 AS BIGINT), false, true),
      |  (2, -1, NULL, NULL, NULL, false),
      |  (3, 0, CAST(48 AS BIGINT), CAST(9 AS BIGINT), true, true),
      |  (3, 2, CAST(70 AS BIGINT), CAST(11 AS BIGINT), false, true))
      |  AS t(asset_id, frame_idx, byte_start, byte_len, is_idr, indexed)
      |ORDER BY asset_id, frame_idx""".stripMargin,
    doc = "MP4 stbl sample-table frame index + stride sampling " +
      "(multimodal ops; decode is the documented external-seam stub)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.Mp4Index
    val sampleBytes = Seq(7, 14, 3, 21, 9).zipWithIndex.map { case (n, i) =>
      Array.tabulate[Byte](n)(j => ((i * 31 + j) & 0x7f).toByte)
    }
    val assets = Seq(
      (1L, "mem://real.mp4",
        Mp4Index.encodeSynthetic(sampleBytes, syncSamples = Seq(1, 4),
          samplesPerChunk = 2)),
      (2L, "mem://junk.mp4", Array[Byte](9, 9, 9, 9)),
      // real-layout fixture: ffmpeg box order (ftyp+compat brands,
      // free, mdat BEFORE a full moov with mvhd/tkhd/edts/mdhd/hdlr/
      // vmhd/dinf/stts/ctts) — samples (9,13,11) at 48/57/70, stss={1}
      (3L, "mem://lavf.mp4", graft.multimodal.ExternalFixtures.ffmpegStyleMp4)
    ).toDF("id", "uri", "bytes")
    Multimodal.sampleH264Frames(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
        stride = 2, maxFrames = 5)(s)
      .select(col("asset_id"), col("frame_idx"),
        when(col("indexed"), col("byte_start")).as("byte_start"),
        when(col("indexed"), col("byte_len")).as("byte_len"),
        when(col("indexed"), col("is_idr")).as("is_idr"),
        col("indexed"))
      .orderBy("asset_id", "frame_idx")
  }

  /** Fragmented-MP4 (CMAF/DASH segment shape) indexing
    * ([[graft.multimodal.Mp4Index.fragmentIndex]]): samples addressed
    * by `tfhd` defaults + `trun` runs across `[moof][mdat]` pairs, no
    * global sample table. Byte-exact oracle from the box arithmetic:
    * ftyp 16 + moov(mvex) 16 = 32; fragment 1's moof
    * (mfhd 16 + traf(tfhd 20 + trun 32) + hdr) is 84 B so its two
    * samples (5, 9 B) sit at 124/129; fragment 2's moof is 80 B so
    * its sample (7 B) sits at 226. First sample per fragment is sync
    * via first_sample_flags, continuations non-sync via the tfhd
    * default — the keyframe-per-segment CMAF contract; frame indexes
    * continue across fragments. A tfhd-field, trun-row-stride, or
    * base-addressing regression hash-fails.
    */
  val qMultimodalFmp4Index: QueryDef = QueryDef.sql(
    "q_multimodal_fmp4_index",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(124 AS BIGINT), CAST(5 AS BIGINT), true, true),
      |  (1, 1, CAST(129 AS BIGINT), CAST(9 AS BIGINT), false, true),
      |  (1, 2, CAST(226 AS BIGINT), CAST(7 AS BIGINT), true, true),
      |  (2, -1, NULL, NULL, NULL, false),
      |  (3, 0, CAST(794 AS BIGINT), CAST(6 AS BIGINT), true, true),
      |  (3, 1, CAST(800 AS BIGINT), CAST(8 AS BIGINT), false, true),
      |  (3, 2, CAST(808 AS BIGINT), CAST(7 AS BIGINT), false, true))
      |  AS t(asset_id, frame_idx, byte_start, byte_len, is_idr, indexed)
      |ORDER BY asset_id, frame_idx""".stripMargin,
    doc = "fragmented-MP4 (moof/trun) frame index + sampling " +
      "(multimodal ops; decode is the documented external-seam stub)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.Mp4Index
    def sample(n: Int, i: Int): Array[Byte] =
      Array.tabulate[Byte](n)(j => ((i * 31 + j) & 0x7f).toByte)
    val assets = Seq(
      (1L, "mem://segment.mp4",
        Mp4Index.encodeSyntheticFragmented(Seq(
          Seq(sample(5, 0), sample(9, 1)), Seq(sample(7, 2))))),
      (2L, "mem://junk.mp4", Array[Byte](9, 9, 9, 9)),
      // real-layout fixture: ffmpeg frag_keyframe shape (full init
      // moov with mvex/trex + declared video trak, tfdt in the traf,
      // per-sample duration/size/flags trun) — samples (6,8,7) at
      // 794/800/808, first sync
      (3L, "mem://dash.m4s", graft.multimodal.ExternalFixtures.ffmpegStyleFmp4)
    ).toDF("id", "uri", "bytes")
    Multimodal.sampleH264Frames(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
        stride = 1, maxFrames = 5)(s)
      .select(col("asset_id"), col("frame_idx"),
        when(col("indexed"), col("byte_start")).as("byte_start"),
        when(col("indexed"), col("byte_len")).as("byte_len"),
        when(col("indexed"), col("is_idr")).as("is_idr"),
        col("indexed"))
      .orderBy("asset_id", "frame_idx")
  }

  /** MP3 (Layer III) frame indexing ([[graft.multimodal.Mp3Frames]]):
    * the audio face of the byte-range decoder seam. Byte-exact oracle
    * from the header arithmetic at 32 kHz MPEG-1 (chosen because
    * 144·kbps·1000/32000 is integral): an ID3v2 tag of content size
    * 20 puts frame 0 at byte 30; bitrate indices 9/5/14 give
    * 128/64/320 kbps → frame lengths 576/288/1440 at offsets
    * 30/606/894, each decoding 1152 PCM samples — so duration and
    * VBR profile are pure arithmetic over the emitted columns. A
    * trailing ID3v1 block must terminate (not break) the walk; junk
    * pins the flagged fallback. A header-table, padding, or tag-skip
    * regression hash-fails.
    */
  val qMultimodalMp3Index: QueryDef = QueryDef.sql(
    "q_multimodal_mp3_index",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(30 AS BIGINT), CAST(576 AS BIGINT), 128, 32000, 1152, true),
      |  (1, 1, CAST(606 AS BIGINT), CAST(288 AS BIGINT), 64, 32000, 1152, true),
      |  (1, 2, CAST(894 AS BIGINT), CAST(1440 AS BIGINT), 320, 32000, 1152, true),
      |  (2, -1, NULL, NULL, NULL, NULL, NULL, false),
      |  (3, 0, CAST(34 AS BIGINT), CAST(288 AS BIGINT), 64, 32000, 1152, true),
      |  (3, 1, CAST(322 AS BIGINT), CAST(576 AS BIGINT), 128, 32000, 1152, true),
      |  (3, 2, CAST(898 AS BIGINT), CAST(577 AS BIGINT), 128, 32000, 1152, true))
      |  AS t(asset_id, frame_idx, byte_start, byte_len, bitrate_kbps,
      |       sample_rate_hz, samples, indexed)
      |ORDER BY asset_id, frame_idx""".stripMargin,
    doc = "MP3 Layer-III frame index: byte ranges + rate facts from " +
      "headers alone (multimodal ops; decode is the external-seam stub)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.Mp3Frames
    val assets = Seq(
      (1L, "mem://talk.mp3",
        Mp3Frames.encodeSynthetic(Seq((9, 0), (5, 0), (14, 0)),
          srIdx = 2, mpeg1 = true, id3v2Size = 20, id3v1 = true)),
      (2L, "mem://junk.mp3", Array[Byte](9, 9, 9, 9)),
      // real-layout fixture: lame/ffmpeg shape — ID3v2.3 with a TSSE
      // frame (34 B tag), a Xing/"Info" FIRST frame (valid 64 kbps
      // header, 288 B), 128 kbps music frames (second padded: 577),
      // ID3v1 trailer — frames at 34/322/898
      (3L, "mem://lame.mp3", graft.multimodal.ExternalFixtures.lameStyleMp3)
    ).toDF("id", "uri", "bytes")
    Multimodal.sampleMp3Frames(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
        stride = 1, maxFrames = 5)(s)
      .select(col("asset_id"), col("frame_idx"),
        when(col("indexed"), col("byte_start")).as("byte_start"),
        when(col("indexed"), col("byte_len")).as("byte_len"),
        when(col("indexed"), col("bitrate_kbps")).as("bitrate_kbps"),
        when(col("indexed"), col("sample_rate_hz")).as("sample_rate_hz"),
        when(col("indexed"), col("samples")).as("samples"),
        col("indexed"))
      .orderBy("asset_id", "frame_idx")
  }

  /** ADTS AAC frame indexing ([[graft.multimodal.AdtsAac]]): the
    * third audio face of the decoder seam. Byte-exact oracle from
    * the in-header length field: payloads 100/250/37 B under 7-byte
    * headers give frames 107/257/44 at 0/107/364 (48 kHz 5.1, LC);
    * the CRC clip's 9-byte headers give 73/73 at 0/73 with TWO raw
    * data blocks each (2048 samples — the rdb field, not a constant);
    * the real-layout ffmpeg fixture pins the bit-for-bit header shape
    * an external muxer writes (30/38/24 at 0/30/68). Junk pins the
    * flagged fallback. A length-field, CRC-size, sample-rate-table,
    * or rdb regression hash-fails.
    */
  val qMultimodalAacIndex: QueryDef = QueryDef.sql(
    "q_multimodal_aac_index",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(0 AS BIGINT), CAST(107 AS BIGINT), 1, 48000, 6, 1024, true),
      |  (1, 1, CAST(107 AS BIGINT), CAST(257 AS BIGINT), 1, 48000, 6, 1024, true),
      |  (1, 2, CAST(364 AS BIGINT), CAST(44 AS BIGINT), 1, 48000, 6, 1024, true),
      |  (2, -1, NULL, NULL, NULL, NULL, NULL, NULL, false),
      |  (3, 0, CAST(0 AS BIGINT), CAST(30 AS BIGINT), 1, 48000, 2, 1024, true),
      |  (3, 1, CAST(30 AS BIGINT), CAST(38 AS BIGINT), 1, 48000, 2, 1024, true),
      |  (3, 2, CAST(68 AS BIGINT), CAST(24 AS BIGINT), 1, 48000, 2, 1024, true),
      |  (4, 0, CAST(0 AS BIGINT), CAST(73 AS BIGINT), 1, 44100, 2, 2048, true),
      |  (4, 1, CAST(73 AS BIGINT), CAST(73 AS BIGINT), 1, 44100, 2, 2048, true))
      |  AS t(asset_id, frame_idx, byte_start, byte_len, profile,
      |       sample_rate_hz, channels, samples, indexed)
      |ORDER BY asset_id, frame_idx""".stripMargin,
    doc = "ADTS AAC frame index: byte ranges + rate facts from " +
      "headers alone (multimodal ops; decode is the external-seam stub)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.AdtsAac
    val assets = Seq(
      (1L, "mem://talk.aac",
        AdtsAac.encodeSynthetic(Seq(100, 250, 37), srIdx = 3, chanCfg = 6)),
      (2L, "mem://junk.aac", Array[Byte](9, 9, 9, 9)),
      // real-layout fixture: ffmpeg -f adts shape — MPEG-4 ID bit,
      // buffer fullness 0x7FF, LC 48 kHz stereo — frames 30/38/24
      (3L, "mem://lavf.aac", graft.multimodal.ExternalFixtures.ffmpegStyleAdts),
      (4L, "mem://crc.adts",
        AdtsAac.encodeSynthetic(Seq(64, 64), crc = true, rdbMinus1 = 1))
    ).toDF("id", "uri", "bytes")
    Multimodal.sampleAacFrames(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
        stride = 1, maxFrames = 5)(s)
      .select(col("asset_id"), col("frame_idx"),
        when(col("indexed"), col("byte_start")).as("byte_start"),
        when(col("indexed"), col("byte_len")).as("byte_len"),
        when(col("indexed"), col("profile")).as("profile"),
        when(col("indexed"), col("sample_rate_hz")).as("sample_rate_hz"),
        when(col("indexed"), col("channels")).as("channels"),
        when(col("indexed"), col("samples")).as("samples"),
        col("indexed"))
      .orderBy("asset_id", "frame_idx")
  }

  /** MPEG-TS PES-unit indexing ([[graft.multimodal.MpegTs]]): the
    * streaming-capture face of the decoder seam (HLS segments).
    * Byte-exact oracle from the packet arithmetic: PAT pkt 0, PMT
    * pkt 1; a 414 B video PES fills pkts 2-4, audio pkt 5, a 314 B
    * video PES pkts 6-7 — spans run to the next PUSI on the same
    * PID (video-0's includes the interleaved audio packet; audio's
    * runs to stream end), PTS rides the marker-bit PES encoding,
    * random-access the adaptation field. Asset 3 pins the
    * ffmpeg-style SDT-before-PAT layout (skipped, shifting units by
    * one packet). Junk pins the flagged fallback. A PAT/PMT-CRC,
    * PTS-marker, continuity, or span regression hash-fails.
    */
  val qMultimodalTsIndex: QueryDef = QueryDef.sql(
    "q_multimodal_ts_index",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(376 AS BIGINT), CAST(752 AS BIGINT), 256, 27, 3,
      |   CAST(90000 AS BIGINT), true, true, true),
      |  (1, 1, CAST(940 AS BIGINT), CAST(564 AS BIGINT), 257, 15, 1,
      |   CAST(91000 AS BIGINT), false, false, true),
      |  (1, 2, CAST(1128 AS BIGINT), CAST(376 AS BIGINT), 256, 27, 2,
      |   CAST(93003 AS BIGINT), false, true, true),
      |  (2, -1, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, false),
      |  (3, 0, CAST(564 AS BIGINT), CAST(188 AS BIGINT), 256, 27, 1,
      |   CAST(0 AS BIGINT), true, true, true),
      |  (3, 1, CAST(752 AS BIGINT), CAST(188 AS BIGINT), 256, 27, 1,
      |   CAST(3003 AS BIGINT), false, true, true))
      |  AS t(asset_id, unit_idx, byte_start, byte_len, pid, stream_type,
      |       n_packets, pts, is_random_access, is_video, indexed)
      |ORDER BY asset_id, unit_idx""".stripMargin,
    doc = "MPEG-TS PES-unit index: PAT/PMT walk + PTS/random-access " +
      "facts (multimodal ops; decode is the documented external-seam stub)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.MpegTs
    import graft.multimodal.MpegTs.SynthUnit
    def pl(n: Int, i: Int): Array[Byte] =
      Array.tabulate[Byte](n)(j => ((i * 31 + j + 1) & 0x7f).toByte)
    val assets = Seq(
      (1L, "mem://seg0.ts", MpegTs.encodeSynthetic(Seq(
        SynthUnit(0x100, pl(400, 0), pts = 90000L, randomAccess = true),
        SynthUnit(0x101, pl(50, 1), pts = 91000L, randomAccess = false),
        SynthUnit(0x100, pl(300, 2), pts = 93003L, randomAccess = false)))),
      (2L, "mem://junk.ts", Array[Byte](9, 9, 9, 9)),
      // real-layout variant: ffmpeg writes an SDT before the PAT
      (3L, "mem://lavf.ts", MpegTs.encodeSynthetic(Seq(
        SynthUnit(0x100, pl(100, 0), pts = 0L, randomAccess = true),
        SynthUnit(0x100, pl(100, 1), pts = 3003L, randomAccess = false)),
        sdtFirst = true))
    ).toDF("id", "uri", "bytes")
    Multimodal.sampleTsUnits(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
        stride = 1, maxUnits = 5)(s)
      .select(col("asset_id"), col("unit_idx"),
        when(col("indexed"), col("byte_start")).as("byte_start"),
        when(col("indexed"), col("byte_len")).as("byte_len"),
        when(col("indexed"), col("pid")).as("pid"),
        when(col("indexed"), col("stream_type")).as("stream_type"),
        when(col("indexed"), col("n_packets")).as("n_packets"),
        when(col("indexed"), col("pts")).as("pts"),
        when(col("indexed"), col("is_random_access")).as("is_random_access"),
        when(col("indexed"), col("is_video")).as("is_video"),
        col("indexed"))
      .orderBy("asset_id", "unit_idx")
  }

  /** FLAC frame indexing ([[graft.multimodal.FlacIndex]]): the
    * lossless face of the decoder seam, and the family's hard case —
    * no in-header frame length, so boundaries come from the format's
    * own CRC-8/CRC-16 integrity chain. Byte-exact oracle from the
    * header arithmetic: frames carrying 8/16-bit uncommon block
    * sizes are 7/8 header bytes + payload + 2, so payloads 100/250/37
    * under 16-bit sizes (4096 samples) give 110/260/47 B with the
    * third (1000 samples) also 16-bit-coded — at 42/152/412 after
    * the 42 B magic+STREAMINFO head. The real-layout libFLAC fixture
    * pins the COMMON block-size code path (12 → 4096) + vorbis-
    * comment/padding metadata walk (33/39 B at 110/143). Junk pins
    * the flagged fallback. A CRC-table, boundary-scan, code-table, or
    * metadata-walk regression hash-fails.
    */
  val qMultimodalFlacIndex: QueryDef = QueryDef.sql(
    "q_multimodal_flac_index",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(42 AS BIGINT), CAST(110 AS BIGINT), 4096, 44100, 2, 16, true),
      |  (1, 1, CAST(152 AS BIGINT), CAST(260 AS BIGINT), 4096, 44100, 2, 16, true),
      |  (1, 2, CAST(412 AS BIGINT), CAST(47 AS BIGINT), 1000, 44100, 2, 16, true),
      |  (2, -1, NULL, NULL, NULL, NULL, NULL, NULL, false),
      |  (3, 0, CAST(110 AS BIGINT), CAST(33 AS BIGINT), 4096, 44100, 2, 16, true),
      |  (3, 1, CAST(143 AS BIGINT), CAST(39 AS BIGINT), 4096, 44100, 2, 16, true))
      |  AS t(asset_id, frame_idx, byte_start, byte_len, block_samples,
      |       sample_rate_hz, channels, bits_per_sample, indexed)
      |ORDER BY asset_id, frame_idx""".stripMargin,
    doc = "FLAC frame index: CRC-chain boundary walk + PCM facts " +
      "(multimodal ops; decode is the documented external-seam stub)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.FlacIndex
    val assets = Seq(
      (1L, "mem://song.flac", FlacIndex.encodeSynthetic(
        Seq((4096, 100), (4096, 250), (1000, 37)))),
      (2L, "mem://junk.flac", Array[Byte](9, 9, 9, 9)),
      // real-layout fixture: libFLAC shape — vorbis comment with the
      // reference vendor string, padding block, common-code frames
      (3L, "mem://ref.flac", graft.multimodal.ExternalFixtures.libflacStyleFlac)
    ).toDF("id", "uri", "bytes")
    Multimodal.sampleFlacFrames(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
        stride = 1, maxFrames = 5)(s)
      .select(col("asset_id"), col("frame_idx"),
        when(col("indexed"), col("byte_start")).as("byte_start"),
        when(col("indexed"), col("byte_len")).as("byte_len"),
        when(col("indexed"), col("block_samples")).as("block_samples"),
        when(col("indexed"), col("sample_rate_hz")).as("sample_rate_hz"),
        when(col("indexed"), col("channels")).as("channels"),
        when(col("indexed"), col("bits_per_sample")).as("bits_per_sample"),
        col("indexed"))
      .orderBy("asset_id", "frame_idx")
  }

  /** ISO-BMFF AUDIO sample indexing ([[graft.multimodal.Mp4Index
    * .audioSampleTable]]): M4A corpora and soundtrack extraction
    * from A/V MP4s in one call. Byte-exact oracle from the box
    * arithmetic: a 16 B `M4A ` ftyp + 8 B mdat header put sample 0
    * at 24, sizes 9/13/11 chunked 2+1 tile the mdat (24/33/46);
    * rate/channels ride the AudioSampleEntry (32 kHz mono). Asset 3
    * is an A/V mux — the SAME call returns its audio track (one
    * 22.05 kHz stereo sample at 24) while the video walk still
    * returns its frames (selection is by hdlr, both directions);
    * asset 4 (video-only) and junk pin the flagged fallback. An
    * entry-offset, trak-selection, or stbl regression hash-fails.
    */
  val qMultimodalM4aIndex: QueryDef = QueryDef.sql(
    "q_multimodal_m4a_index",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(24 AS BIGINT), CAST(9 AS BIGINT), 'mp4a', 32000, 1, true),
      |  (1, 1, CAST(33 AS BIGINT), CAST(13 AS BIGINT), 'mp4a', 32000, 1, true),
      |  (1, 2, CAST(46 AS BIGINT), CAST(11 AS BIGINT), 'mp4a', 32000, 1, true),
      |  (2, -1, NULL, NULL, NULL, NULL, NULL, false),
      |  (3, 0, CAST(24 AS BIGINT), CAST(7 AS BIGINT), 'mp4a', 22050, 2, true),
      |  (4, -1, NULL, NULL, NULL, NULL, NULL, false))
      |  AS t(asset_id, sample_idx, byte_start, byte_len, codec,
      |       sample_rate_hz, channels, indexed)
      |ORDER BY asset_id, sample_idx""".stripMargin,
    doc = "ISO-BMFF audio sample index: M4A + A/V soundtrack " +
      "extraction (multimodal ops; decode is the external-seam stub)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.Mp4Index
    def sz(ns: Int*) = ns.map(n => Array.tabulate[Byte](n)(_.toByte))
    val assets = Seq(
      (1L, "mem://talk.m4a", Mp4Index.encodeSyntheticM4a(sz(9, 13, 11),
        sampleRate = 32000, channels = 1, samplesPerChunk = 2)),
      (2L, "mem://junk.m4a", Array[Byte](9, 9, 9, 9)),
      (3L, "mem://movie.mp4", Mp4Index.encodeSynthetic(sz(7, 14, 3),
        syncSamples = Seq(1), audioTrakFirst = true)),
      (4L, "mem://silent.mp4", Mp4Index.encodeSynthetic(sz(7, 14),
        syncSamples = Seq(1)))
    ).toDF("id", "uri", "bytes")
    Multimodal.sampleM4aFrames(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
        stride = 1, maxFrames = 5)(s)
      .select(col("asset_id"), col("sample_idx"),
        when(col("indexed"), col("byte_start")).as("byte_start"),
        when(col("indexed"), col("byte_len")).as("byte_len"),
        when(col("indexed"), col("codec")).as("codec"),
        when(col("indexed"), col("sample_rate_hz")).as("sample_rate_hz"),
        when(col("indexed"), col("channels")).as("channels"),
        col("indexed"))
      .orderBy("asset_id", "sample_idx")
  }

  /** Header-only WAV profiling ([[graft.multimodal.WavIndex]] +
    * `Multimodal.extractWavInfo`): speech corpora ship as PCM WAV —
    * format/duration facts and the data span without touching a
    * sample byte. The fixtures are written by the JDK's OWN
    * javax.sound WAV writer (a real external encoder), whose
    * canonical 44-byte header puts data at 44; frames = dataLen /
    * blockAlign exactly, so duration analytics are arithmetic. Junk
    * pins the flagged fallback. A chunk-walk, endianness, or
    * align-consistency regression hash-fails.
    */
  val qMultimodalWavInfo: QueryDef = QueryDef.sql(
    "q_multimodal_wav_info",
    """SELECT * FROM (VALUES
      |  (1, 1, 1, 16000, 16, CAST(44 AS BIGINT), CAST(2468 AS BIGINT),
      |   CAST(1234 AS BIGINT), true),
      |  (2, 1, 2, 44100, 16, CAST(44 AS BIGINT), CAST(2000 AS BIGINT),
      |   CAST(500 AS BIGINT), true),
      |  (3, NULL, NULL, NULL, NULL, NULL, NULL, NULL, false))
      |  AS t(asset_id, format_code, channels, sample_rate_hz,
      |       bits_per_sample, data_start, data_len, frames, parsed)
      |ORDER BY asset_id""".stripMargin,
    doc = "WAV header facts + data span from the RIFF walk alone " +
      "(multimodal ops; the uncompressed face of the audio seam)") {
    (s, dir) =>
    import s.implicits._
    def wav(rate: Float, channels: Int, nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels,
        true, false)
      val pcm = new Array[Byte](nFrames * channels * 2)
      pcm.indices.foreach(i => pcm(i) = ((i * 37) & 0x7f).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val assets = Seq(
      (1L, "mem://speech.wav", wav(16000f, 1, 1234)),
      (2L, "mem://music.wav", wav(44100f, 2, 500)),
      (3L, "mem://junk.wav", Array[Byte](9, 9, 9, 9))
    ).toDF("id", "uri", "bytes")
    Multimodal.extractWavInfo(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s))(s)
      .select(col("asset_id"),
        when(col("parsed"), col("format_code")).as("format_code"),
        when(col("parsed"), col("channels")).as("channels"),
        when(col("parsed"), col("sample_rate_hz")).as("sample_rate_hz"),
        when(col("parsed"), col("bits_per_sample")).as("bits_per_sample"),
        when(col("parsed"), col("data_start")).as("data_start"),
        when(col("parsed"), col("data_len")).as("data_len"),
        when(col("parsed"), col("frames")).as("frames"),
        col("parsed"))
      .orderBy("asset_id")
  }

  /** Media tag extraction ([[graft.multimodal.MediaTags]] +
    * `Multimodal.extractMediaTags`): curation metadata (title/
    * artist/language) as rows, header-only like the rest of the
    * seam. Exact oracle over decoded strings: ID3v2.3 frames across
    * ISO-8859-1 and UTF-16-with-BOM encodings, FLAC Vorbis comments
    * with canonical-uppercased keys and UTF-8 values; Ogg OpusTags
    * comments assembled from page lacing (the same Vorbis-comment
    * structure, RFC 7845 §5.2); a tag-less FLAC pins
    * presence-without-tags (one parsed empty row); junk pins the
    * flagged fallback. An encoding-dispatch, synchsafe,
    * packet-assembly, or comment-length regression hash-fails.
    */
  val qMultimodalTags: QueryDef = QueryDef.sql(
    "q_multimodal_tags",
    """SELECT * FROM (VALUES
      |  (1, 'id3', 'TIT2', 'Night Drive', true),
      |  (1, 'id3', 'TLAN', 'deu', true),
      |  (1, 'id3', 'TPE1', 'Grüße — ünïcode', true),
      |  (2, 'flac', 'ARTIST', 'Chopin', true),
      |  (2, 'flac', 'LANGUAGE', 'pol', true),
      |  (2, 'flac', 'TITLE', 'Nocturne Op. 9', true),
      |  (3, NULL, NULL, NULL, false),
      |  (4, 'flac', '', '', true),
      |  (5, 'ogg', 'ARTIST', 'Sea', true),
      |  (5, 'ogg', 'TITLE', 'Waves', true))
      |  AS t(asset_id, container, tag_key, tag_value, parsed)
      |ORDER BY asset_id, tag_key""".stripMargin,
    doc = "ID3v2 + FLAC Vorbis-comment tag extraction: curation " +
      "metadata rows from headers alone (multimodal ops)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.{FlacIndex, MediaTags}
    val assets = Seq(
      (1L, "mem://night.mp3", MediaTags.encodeId3(Seq(
        ("TIT2", "Night Drive", 0),
        ("TPE1", "Grüße — ünïcode", 1),
        ("TLAN", "deu", 0)), padding = 17)),
      (2L, "mem://nocturne.flac", FlacIndex.encodeSynthetic(
        Seq((256, 30), (256, 40)),
        comments = Seq(("title", "Nocturne Op. 9"), ("Artist", "Chopin"),
          ("LANGUAGE", "pol")))),
      (3L, "mem://junk.mp3", Array[Byte](9, 9, 9, 9)),
      (4L, "mem://plain.flac", FlacIndex.encodeSynthetic(
        Seq((256, 30), (256, 40)))),
      (5L, "mem://waves.opus", graft.multimodal.MediaTags
        .encodeOpusStream(Seq(("title", "Waves"), ("ARTIST", "Sea"))))
    ).toDF("id", "uri", "bytes")
    Multimodal.extractMediaTags(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s))(s)
      .select(col("asset_id"),
        when(col("parsed"), col("container")).as("container"),
        when(col("parsed"), col("tag_key")).as("tag_key"),
        when(col("parsed"), col("tag_value")).as("tag_value"),
        col("parsed"))
      .orderBy("asset_id", "tag_key")
  }

  /** Header-only image dimensions ([[graft.multimodal.ImageDims]] +
    * `Multimodal.extractImageDims`): resolution filtering WITHOUT a
    * pixel decode — dimensions ride the first bytes of every
    * mainstream container. The PNG/JPEG/GIF/BMP fixtures are encoded
    * by the JDK's OWN ImageIO writers (real external encoders, not
    * the repo's hand), so the oracle pins agreement with genuine
    * encoder output; WebP (no JDK writer exists) is a hand-built
    * VP8L header; AVIF is a libavif-layout fixture whose THUMBNAIL
    * ispe precedes the primary item's in ipco — pinning the
    * pitm+ipma primary-item resolution (a first-ispe heuristic
    * returns 160×90 and hash-fails); asset 8 pins EXIF orientation
    * (a phone-style APP1 with tag 0x0112 = 6 — perceptual hashing
    * of rotated captures depends on it); junk pins the flagged
    * fallback. A marker-walk, endianness, chunk-dispatch, or
    * TIFF-IFD regression hash-fails.
    */
  val qMultimodalImageDims: QueryDef = QueryDef.sql(
    "q_multimodal_image_dims",
    """SELECT * FROM (VALUES
      |  (1, 'png', 31, 17, 1, true),
      |  (2, 'jpeg', 63, 41, 1, true),
      |  (3, 'gif', 12, 7, 1, true),
      |  (4, 'bmp', 9, 5, 1, true),
      |  (5, 'webp', 100, 50, 1, true),
      |  (6, NULL, NULL, NULL, NULL, false),
      |  (7, 'avif', 1280, 720, 1, true),
      |  (8, 'jpeg', 63, 41, 6, true))
      |  AS t(asset_id, format, width, height, orientation, parsed)
      |ORDER BY asset_id""".stripMargin,
    doc = "decode-free image dimensions from container headers " +
      "(multimodal ops; the scalable pre-filter before any decode)") {
    (s, dir) =>
    import s.implicits._
    def enc(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, fmt, out))
      out.toByteArray
    }
    val vp8l: Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("ISO-8859-1"))
      val payload = 13 // VP8L sig + 4 size bytes + 8 filler
      (0 until 4).foreach(j => out.write(((4 + 8 + payload) >> (8 * j)) & 0xff))
      out.write("WEBPVP8L".getBytes("ISO-8859-1"))
      (0 until 4).foreach(j => out.write((payload >> (8 * j)) & 0xff))
      out.write(0x2f)
      val bits = 99L | (49L << 14) // (w-1, h-1) packed 14-bit fields
      (0 until 4).foreach(j => out.write(((bits >> (8 * j)) & 0xff).toInt))
      out.write(new Array[Byte](8))
      out.toByteArray
    }
    // libavif-layout AVIF: thumbnail ispe FIRST in ipco; pitm names
    // item 2, whose ipma association points at the 1280×720 ispe
    val avif = graft.multimodal.ExternalFixtures.libavifStyleAvif()
    val assets = Seq(
      (1L, "mem://a.png", enc("png", 31, 17)),
      (2L, "mem://b.jpg", enc("jpg", 63, 41)),
      (3L, "mem://c.gif", enc("gif", 12, 7)),
      (4L, "mem://d.bmp", enc("bmp", 9, 5)),
      (5L, "mem://e.webp", vp8l),
      (6L, "mem://f.png", Array[Byte](9, 9, 9, 9)),
      (7L, "mem://g.avif", avif),
      // a phone-style rotated JPEG: EXIF APP1 with orientation 6
      // spliced ahead of a real ImageIO JPEG's segments
      (8L, "mem://h.jpg", {
        val real = enc("jpg", 63, 41)
        val tiff = Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0, // LE, IFD0@8
          1, 0,                                   // 1 entry
          0x12, 0x01, 3, 0, 1, 0, 0, 0, 6, 0, 0, 0, // tag 0x0112 = 6
          0, 0, 0, 0)                             // next-IFD = none
        val exif = "Exif".getBytes("ISO-8859-1") ++
          Array[Byte](0, 0) ++ tiff
        val segLen = 2 + exif.length
        Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
          ((segLen >> 8) & 0xff).toByte, (segLen & 0xff).toByte) ++
          exif ++ real.drop(2)
      })
    ).toDF("id", "uri", "bytes")
    Multimodal.extractImageDims(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s))(s)
      .select(col("asset_id"),
        when(col("parsed"), col("format")).as("format"),
        when(col("parsed"), col("width")).as("width"),
        when(col("parsed"), col("height")).as("height"),
        when(col("parsed"), col("orientation")).as("orientation"),
        col("parsed"))
      .orderBy("asset_id")
  }

  /** Header-only VIDEO profiling ([[graft.multimodal.Mp4Index
    * .movieDuration]] + the stbl walk): frame/keyframe counts and
    * the mvhd duration (timescale 600, duration 1500 → 2.5 s in the
    * real-layout fixture) with no sample byte touched — the video
    * twin of q_multimodal_audio_profile. The minimal synthetic mux
    * declares no mvhd → NULL duration with counts intact; junk pins
    * the flagged fallback.
    */
  val qMultimodalVideoProfile: QueryDef = QueryDef.sql(
    "q_multimodal_video_profile",
    """SELECT * FROM (VALUES
      |  (1, 3, 1, CAST(2.5 AS DOUBLE), true),
      |  (2, 3, 2, CAST(NULL AS DOUBLE), true),
      |  (3, NULL, NULL, NULL, false))
      |  AS t(asset_id, n_frames, n_sync, duration_s, indexed)
      |ORDER BY asset_id""".stripMargin,
    doc = "per-asset video duration + frame/keyframe counts from " +
      "container headers alone (multimodal ops; no decode)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.Mp4Index
    val assets = Seq(
      (1L, "mem://movie.mp4",
        graft.multimodal.ExternalFixtures.ffmpegStyleMp4),
      (2L, "mem://clip.mp4", Mp4Index.encodeSynthetic(
        Seq(Array.fill[Byte](9)(1), Array.fill[Byte](7)(2),
          Array.fill[Byte](5)(3)), syncSamples = Seq(1, 3))),
      (3L, "mem://junk.mp4", Array[Byte](9, 9, 9))
    ).toDF("id", "uri", "bytes")
    Multimodal.extractVideoInfo(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s))(s)
      .select(col("asset_id"),
        when(col("indexed"), col("n_frames")).as("n_frames"),
        when(col("indexed"), col("n_sync")).as("n_sync"),
        when(col("indexed") && col("duration_s") >= 0,
          col("duration_s")).as("duration_s"),
        col("indexed"))
      .orderBy("asset_id")
  }

  /** Audio duration/bitrate profiling PURELY from the container
    * indexes — the point of the byte-range seam: no decode anywhere,
    * duration is `Σ samples / rate` and bitrate `Σ bytes · 8 /
    * duration` over the emitted index columns, one hash-aggregate
    * per codec. The oracle COMPUTES the same formulas from the
    * planted per-asset facts (3456 samples @32 kHz in 2304 B MP3;
    * 3072 @48 kHz in 408 B AAC; 9192 @44.1 kHz in 417 B FLAC), so a
    * frame-count, sample-count, or byte-span regression in ANY of
    * the three indexers hash-fails here too.
    */
  val qMultimodalAudioProfile: QueryDef = QueryDef.sql(
    "q_multimodal_audio_profile",
    """SELECT asset_id, codec, n_frames,
      |  round(samples / CAST(rate AS DOUBLE), 6) AS duration_s,
      |  round(bytes * 8.0 / (samples / CAST(rate AS DOUBLE)) / 1000, 6)
      |    AS mean_kbps
      |FROM (VALUES
      |  (1, 'mp3', 3, 3456, 32000, 2304),
      |  (2, 'aac', 3, 3072, 48000, 408),
      |  (3, 'flac', 3, 9192, 44100, 417))
      |  AS t(asset_id, codec, n_frames, samples, rate, bytes)
      |ORDER BY asset_id""".stripMargin,
    doc = "per-asset audio duration + bitrate from index arithmetic " +
      "alone (multimodal ops; no decode touches any byte)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.{AdtsAac, FlacIndex, Mp3Frames}
    val assets = Multimodal.toMediaAssets(Seq(
      (1L, "mem://a.mp3", Mp3Frames.encodeSynthetic(
        Seq((9, 0), (5, 0), (14, 0)), srIdx = 2)),
      (2L, "mem://b.aac", AdtsAac.encodeSynthetic(
        Seq(100, 250, 37), srIdx = 3, chanCfg = 6)),
      (3L, "mem://c.flac", FlacIndex.encodeSynthetic(
        Seq((4096, 100), (4096, 250), (1000, 37))))
    ).toDF("id", "uri", "bytes"), "id", "uri", "bytes")(s)
    def profile(df: org.apache.spark.sql.DataFrame, codec: String,
        samplesCol: String, rateCol: String) =
      df.filter(col("indexed"))
        .groupBy(col("asset_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col(samplesCol)).as("samples"),
          max(col(rateCol)).as("rate"),
          sum(col("byte_len")).as("bytes"))
        .withColumn("codec", lit(codec))
    val mp3 = profile(Multimodal.sampleMp3Frames(assets, 1, 1000)(s).toDF,
      "mp3", "samples", "sample_rate_hz")
    val aac = profile(Multimodal.sampleAacFrames(assets, 1, 1000)(s).toDF,
      "aac", "samples", "sample_rate_hz")
    val flac = profile(Multimodal.sampleFlacFrames(assets, 1, 1000)(s).toDF,
      "flac", "block_samples", "sample_rate_hz")
    mp3.unionByName(aac).unionByName(flac)
      .select(col("asset_id"), col("codec"), col("n_frames"),
        round(col("samples") / col("rate").cast("double"), 6)
          .as("duration_s"),
        round(col("bytes") * lit(8.0)
          / (col("samples") / col("rate").cast("double")) / lit(1000), 6)
          .as("mean_kbps"))
      .orderBy("asset_id")
  }

  /** HEVC (H.265) frame indexing ([[graft.multimodal.H265]]) over
    * BOTH framings in one sampling pass. Byte-exact oracle from the
    * NAL arithmetic: Annex-B frame 0 owns the stream head
    * (VPS+SPS+PPS at 8 B each + primary + continuation slice at 8 B
    * = 40), later frames are two 8 B slices (16); the hvcC clip's
    * record is exactly 50 B (23 fixed + 3 parameter-set arrays of 9)
    * and spans cover SAMPLE bytes only — the same out-of-band
    * contrast the AVCC gate pins for H.264. Asset 4 (lengthSize 2,
    * 6 B frames) pins lengthSizeMinusOne handling; junk pins the
    * flagged fallback. A header-check, AU-grouping, or sniff-order
    * regression (H.264 claiming HEVC bytes or vice versa) hash-fails.
    */
  val qMultimodalHevcIndex: QueryDef = QueryDef.sql(
    "q_multimodal_hevc_index",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(0 AS BIGINT), CAST(40 AS BIGINT), true, true),
      |  (1, 2, CAST(56 AS BIGINT), CAST(16 AS BIGINT), false, true),
      |  (1, 4, CAST(88 AS BIGINT), CAST(16 AS BIGINT), false, true),
      |  (2, 0, CAST(50 AS BIGINT), CAST(16 AS BIGINT), true, true),
      |  (2, 2, CAST(82 AS BIGINT), CAST(16 AS BIGINT), false, true),
      |  (2, 4, CAST(114 AS BIGINT), CAST(16 AS BIGINT), false, true),
      |  (3, -1, NULL, NULL, NULL, false),
      |  (4, 0, CAST(50 AS BIGINT), CAST(6 AS BIGINT), true, true))
      |  AS t(asset_id, frame_idx, byte_start, byte_len, is_idr, indexed)
      |ORDER BY asset_id, frame_idx""".stripMargin,
    doc = "HEVC (H.265) frame index over Annex-B and hvcC framings " +
      "(multimodal ops; decode is the documented external-seam stub)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.H265
    val idrs = Seq(true, false, false, true, false)
    val assets = Seq(
      (1L, "mem://clip.h265", H265.encodeSynthetic(idrs, extraSlices = 1)),
      (2L, "mem://clip.hevc",
        H265.encodeSyntheticHvcc(idrs, extraSlices = 1)),
      (3L, "mem://junk.hevc", Array[Byte](9, 9, 9, 9)),
      (4L, "mem://short.265",
        H265.encodeSyntheticHvcc(Seq(true, false), lengthSize = 2))
    ).toDF("id", "uri", "bytes")
    Multimodal.sampleH264Frames(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
        stride = 2, maxFrames = 5)(s)
      .select(col("asset_id"), col("frame_idx"),
        when(col("indexed"), col("byte_start")).as("byte_start"),
        when(col("indexed"), col("byte_len")).as("byte_len"),
        when(col("indexed"), col("is_idr")).as("is_idr"),
        col("indexed"))
      .orderBy("asset_id", "frame_idx")
  }

  /** Matroska/WebM indexing ([[graft.multimodal.MkvIndex]]): the EBML
    * block walk IS the frame index, like MP4's stbl. Byte-exact
    * oracle from the element arithmetic: EBML header 12 B; Segment
    * header 5 (4-byte ID + 1-byte size) puts Info (12 B) at 17 and
    * Tracks (30 B: one video TrackEntry with a 15-char CodecID) at
    * 29; the Cluster header (5) + Timestamp (3) put the first
    * SimpleBlock at 67, each block being 2 header + 4
    * (track-VINT/timestamp/flags) + data — so frames of 5/7/6 bytes
    * sit at 73/84/97. Keyframes ride the SimpleBlock 0x80 flag; asset
    * 2 pins the BlockGroup face (keyframe = no ReferenceBlock) and
    * the audio-track-first layout (track routing — offsets shift by
    * the 16 B audio TrackEntry and one 8 B audio block per frame);
    * junk pins the flagged fallback. A VINT-width, lacing, tiling, or
    * track-routing regression hash-fails.
    */
  val qMultimodalMkvIndex: QueryDef = QueryDef.sql(
    "q_multimodal_mkv_index",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(73 AS BIGINT), CAST(5 AS BIGINT), true, true),
      |  (1, 1, CAST(84 AS BIGINT), CAST(7 AS BIGINT), false, true),
      |  (1, 2, CAST(97 AS BIGINT), CAST(6 AS BIGINT), true, true),
      |  (2, 0, CAST(100 AS BIGINT), CAST(5 AS BIGINT), true, true),
      |  (2, 1, CAST(121 AS BIGINT), CAST(7 AS BIGINT), false, true),
      |  (2, 2, CAST(147 AS BIGINT), CAST(6 AS BIGINT), true, true),
      |  (3, -1, NULL, NULL, NULL, false),
      |  (4, 0, CAST(201 AS BIGINT), CAST(6 AS BIGINT), true, true),
      |  (4, 1, CAST(213 AS BIGINT), CAST(9 AS BIGINT), false, true),
      |  (4, 2, CAST(228 AS BIGINT), CAST(5 AS BIGINT), true, true))
      |  AS t(asset_id, frame_idx, byte_start, byte_len, is_idr, indexed)
      |ORDER BY asset_id, frame_idx""".stripMargin,
    doc = "Matroska/WebM EBML block-walk frame index " +
      "(multimodal ops; decode is the documented external-seam stub)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.MkvIndex
    def fr(n: Int, i: Int): Array[Byte] =
      Array.tabulate[Byte](n)(j => ((i * 37 + j) & 0x7f).toByte)
    val fs = Seq(fr(5, 0), fr(7, 1), fr(6, 2))
    val keys = Seq(true, false, true)
    val assets = Seq(
      (1L, "mem://clip.webm", MkvIndex.encodeSynthetic(fs.zip(keys))),
      (2L, "mem://muxed.mkv", MkvIndex.encodeSynthetic(fs.zip(keys),
        audioTrackFirst = true, useBlockGroups = true)),
      (3L, "mem://junk.webm", Array[Byte](9, 9, 9, 9)),
      // real-layout fixture: ffmpeg shape — full 7-element EBML
      // header, UNKNOWN-size Segment, Void patch space, Info with
      // MuxingApp/WritingApp/Duration, full TrackEntry — frames
      // (6,9,5) at 201/213/228, keys T/F/T
      (4L, "mem://lavf.webm", graft.multimodal.ExternalFixtures.ffmpegStyleWebm)
    ).toDF("id", "uri", "bytes")
    Multimodal.sampleH264Frames(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
        stride = 1, maxFrames = 5)(s)
      .select(col("asset_id"), col("frame_idx"),
        when(col("indexed"), col("byte_start")).as("byte_start"),
        when(col("indexed"), col("byte_len")).as("byte_len"),
        when(col("indexed"), col("is_idr")).as("is_idr"),
        col("indexed"))
      .orderBy("asset_id", "frame_idx")
  }

  /** IVF/DKIF (raw VP8/VP9/AV1) frame indexing
    * ([[graft.multimodal.DkifIndex]]): byte-exact oracle from the
    * fixed layout — 32-byte file header + 12-byte frame headers, so
    * VP9 frames of 5/7/6 B sit at 44/61/80; the AV1 clip's payloads
    * grow by its 5 lead OBU bytes (9/11 B at 44/65). Keyframes come
    * from each codec's own public signal (VP9 uncompressed-header
    * frame_type bit; AV1 sequence-header OBU presence); junk pins
    * the flagged fallback. A header-walk, keyframe-bit, or
    * count-consistency regression hash-fails.
    */
  val qMultimodalDkifIndex: QueryDef = QueryDef.sql(
    "q_multimodal_dkif_index",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(44 AS BIGINT), CAST(5 AS BIGINT), true, true),
      |  (1, 1, CAST(61 AS BIGINT), CAST(7 AS BIGINT), false, true),
      |  (1, 2, CAST(80 AS BIGINT), CAST(6 AS BIGINT), true, true),
      |  (2, 0, CAST(44 AS BIGINT), CAST(9 AS BIGINT), true, true),
      |  (2, 1, CAST(65 AS BIGINT), CAST(11 AS BIGINT), false, true),
      |  (3, -1, NULL, NULL, NULL, false))
      |  AS t(asset_id, frame_idx, byte_start, byte_len, is_idr, indexed)
      |ORDER BY asset_id, frame_idx""".stripMargin,
    doc = "IVF/DKIF raw VP9/AV1 frame index with codec keyframe bits " +
      "(multimodal ops; decode is the documented external-seam stub)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.DkifIndex
    def fb(n: Int, i: Int): Array[Byte] =
      Array.tabulate[Byte](n)(j => ((i * 37 + j + 1) & 0x7f).toByte)
    val assets = Seq(
      (1L, "mem://clip.ivf", DkifIndex.encodeSynthetic("VP90",
        Seq((fb(5, 0), true), (fb(7, 1), false), (fb(6, 2), true)))),
      (2L, "mem://clip_av1.ivf", DkifIndex.encodeSynthetic("AV01",
        Seq((fb(5, 0), true), (fb(7, 1), false)))),
      (3L, "mem://junk.ivf", Array[Byte](9, 9, 9, 9))
    ).toDF("id", "uri", "bytes")
    Multimodal.sampleH264Frames(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
        stride = 1, maxFrames = 5)(s)
      .select(col("asset_id"), col("frame_idx"),
        when(col("indexed"), col("byte_start")).as("byte_start"),
        when(col("indexed"), col("byte_len")).as("byte_len"),
        when(col("indexed"), col("is_idr")).as("is_idr"),
        col("indexed"))
      .orderBy("asset_id", "frame_idx")
  }

  /** Ogg page indexing ([[graft.multimodal.OggIndex]]): the second
    * audio face of the decoder seam. Byte-exact oracle from the page
    * arithmetic: page length = 27 + segments + data, so a BOS page
    * with one 19 B packet is 47 B at 0; a page with packets of 10
    * and 300 B laces 300 as 255+45 (3 segments, 340 B at 47); the
    * 5 B EOS page is 33 B at 387. Granules/packet counts ride the
    * header; every page CRC-32 validates (RFC 3533 §6) — junk pins
    * the flagged fallback. A lacing, CRC, or flag regression
    * hash-fails.
    */
  val qMultimodalOggIndex: QueryDef = QueryDef.sql(
    "q_multimodal_ogg_index",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(0 AS BIGINT), CAST(47 AS BIGINT),
      |   CAST(0 AS BIGINT), 1, true, false, true),
      |  (1, 1, CAST(47 AS BIGINT), CAST(340 AS BIGINT),
      |   CAST(960 AS BIGINT), 2, false, false, true),
      |  (1, 2, CAST(387 AS BIGINT), CAST(33 AS BIGINT),
      |   CAST(1920 AS BIGINT), 1, false, true, true),
      |  (2, -1, NULL, NULL, NULL, NULL, NULL, NULL, false))
      |  AS t(asset_id, page_idx, byte_start, byte_len, granule,
      |       n_packets, is_bos, is_eos, indexed)
      |ORDER BY asset_id, page_idx""".stripMargin,
    doc = "Ogg page index: CRC-validated byte ranges + granule facts " +
      "(multimodal ops; decode is the documented external-seam stub)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.OggIndex
    def fb(n: Int, i: Int): Array[Byte] =
      Array.tabulate[Byte](n)(j => ((i * 37 + j + 1) & 0x7f).toByte)
    val assets = Seq(
      (1L, "mem://talk.opus", OggIndex.encodeSynthetic(Seq(
        (Seq(fb(19, 0)), 0L, true, false),
        (Seq(fb(10, 1), fb(300, 2)), 960L, false, false),
        (Seq(fb(5, 3)), 1920L, false, true)))),
      (2L, "mem://junk.ogg", Array[Byte](9, 9, 9, 9))
    ).toDF("id", "uri", "bytes")
    Multimodal.sampleOggPages(
        Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s),
        stride = 1, maxPages = 5)(s)
      .select(col("asset_id"), col("page_idx"),
        when(col("indexed"), col("byte_start")).as("byte_start"),
        when(col("indexed"), col("byte_len")).as("byte_len"),
        when(col("indexed"), col("granule")).as("granule"),
        when(col("indexed"), col("n_packets")).as("n_packets"),
        when(col("indexed"), col("is_bos")).as("is_bos"),
        when(col("indexed"), col("is_eos")).as("is_eos"),
        col("indexed"))
      .orderBy("asset_id", "page_idx")
  }

  /** Codec-config (extradata) extraction across carriages
    * ([[graft.multimodal.CodecConfigs]]): MP4 sample entries route
    * avcC/hvcC/av1C/vpcC and Matroska CodecPrivate carries the av1C
    * record verbatim; profile/level/bit-depth parse from each spec's
    * fixed fields. Oracle constants derived from the record
    * definitions by hand: the 18-byte baseline avcC (profile 66 level
    * 30), the 16-byte av1C (4 header + 2 OBU header + 10 payload;
    * seq_profile/seq_level_idx/high_bitdepth in bytes 1–2), the
    * 12-byte zero-init vpcC, the 23-byte no-array hvcC (profile byte
    * 1 = 0x01 → idc 1, level byte 12 = 93, bit_depth_luma byte 17).
    * Asset 6 pins in-band VP9 (kind none), 7 the flagged fallback, 8
    * the malformed-record posture (reserved bits set → visible span,
    * −1 fields, still indexed), 9 the required-record-ABSENT posture
    * (avc1 with no avcC child: declared kind, −1 span — not "none"),
    * 10 VP9's OPTIONAL WebM CodecPrivate present (the `vp9cp`
    * feature-record format: 4 id/length/value triples = 12 bytes).
    * A routing, field-offset, or strictness regression hash-fails.
    */
  val qMultimodalCodecConfig: QueryDef = QueryDef.sql(
    "q_multimodal_codec_config",
    """SELECT * FROM (VALUES
      |  (1, 'mp4', 'avc1', 'avcC', 66, 30, 8, CAST(18 AS BIGINT), true),
      |  (2, 'mp4', 'av01', 'av1C', 2, 8, 10, CAST(16 AS BIGINT), true),
      |  (3, 'mp4', 'vp09', 'vpcC', 2, 41, 10, CAST(12 AS BIGINT), true),
      |  (4, 'mp4', 'hev1', 'hvcC', 1, 93, 8, CAST(23 AS BIGINT), true),
      |  (5, 'mkv', 'V_AV1', 'av1C', 0, 12, 8, CAST(16 AS BIGINT), true),
      |  (6, 'mkv', 'V_VP9', 'none', -1, -1, -1, CAST(-1 AS BIGINT), true),
      |  (7, '', '', '', -1, -1, -1, CAST(-1 AS BIGINT), false),
      |  (8, 'mp4', 'av01', 'av1C', -1, -1, -1, CAST(16 AS BIGINT), true),
      |  (9, 'mp4', 'avc1', 'avcC', -1, -1, -1, CAST(-1 AS BIGINT), true),
      |  (10, 'mkv', 'V_VP9', 'vp9cp', 2, 41, 10, CAST(12 AS BIGINT),
      |   true))
      |  AS t(asset_id, container, codec, kind, profile, level,
      |       bit_depth, config_len, indexed)
      |ORDER BY asset_id""".stripMargin,
    doc = "Video codec-config extraction: avcC/hvcC/av1C/vpcC over MP4 " +
      "sample entries + Matroska CodecPrivate (multimodal ops)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.{CodecConfigs, MkvIndex, Mp4Index, Multimodal}
    val frames = Seq(Array.tabulate[Byte](6)(_.toByte))
    val avcc = Array[Byte](1, 66, 0, 30, 0xff.toByte, 0xe1.toByte,
      0, 4, 0x67, 0x42, 0, 30, 1, 0, 3, 0x68, 0x01, 0x02)
    val hvcc = Array[Byte](1, 0x01, 0x60, 0, 0, 0, 0, 0, 0, 0, 0, 0, 93,
      0xf0.toByte, 0, 0xfc.toByte, 0xfd.toByte, 0xf8.toByte,
      0xf8.toByte, 0, 0, 0x03, 0)
    val av1cBad = CodecConfigs.encodeAv1CRecord(2, 8, highBitdepth = true)
    av1cBad(3) = 0x20 // reserved bits set: parse must refuse, span stays
    def mp4(fmt: String, cfg: (String, Array[Byte])): Array[Byte] =
      Mp4Index.encodeSynthetic(frames, syncSamples = Seq(1),
        videoEntry = Some(Mp4Index.videoSampleEntry(fmt, Some(cfg))))
    val assets = Seq(
      (1L, mp4("avc1", ("avcC", avcc))),
      (2L, mp4("av01", ("av1C",
        CodecConfigs.encodeAv1CRecord(2, 8, highBitdepth = true)))),
      (3L, mp4("vp09", ("vpcC", CodecConfigs.encodeVpcCRecord(2, 41, 10)))),
      (4L, mp4("hev1", ("hvcC", hvcc))),
      (5L, MkvIndex.encodeSynthetic(frames.map((_, true)),
        codecPrivate = Some(CodecConfigs.encodeAv1CRecord(0, 12)),
        codecId = "V_AV1")),
      (6L, MkvIndex.encodeSynthetic(frames.map((_, true)),
        codecId = "V_VP9")),
      (7L, Array[Byte](9, 9, 9, 9)),
      (8L, mp4("av01", ("av1C", av1cBad))),
      // a REQUIRED record that is absent: declared kind, -1 span —
      // the spec-violating-mux face, distinct from in-band "none"
      (9L, Mp4Index.encodeSynthetic(frames, syncSamples = Seq(1),
        videoEntry = Some(Mp4Index.videoSampleEntry("avc1", None)))),
      // VP9's OPTIONAL WebM CodecPrivate present: the feature-record
      // format (id/length/value triples), 12 bytes by construction
      (10L, MkvIndex.encodeSynthetic(frames.map((_, true)),
        codecPrivate = Some(CodecConfigs.encodeVp9Private(2, 41, 10)),
        codecId = "V_VP9"))
    ).toDF("id", "bytes")
    Multimodal.videoCodecConfigs(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("container"), col("codec"), col("kind"),
        col("profile"), col("level"), col("bit_depth"), col("config_len"),
        col("indexed"))
      .orderBy("asset_id")
  }

  /** Matroska/WebM AUDIO TrackEntry profiling
    * ([[graft.multimodal.MkvIndex.audioTracks]]): codec, channels,
    * sample rate, bit depth, CodecPrivate magic sniff and Segment
    * duration from the track headers alone — no Cluster byte read.
    * Oracle constants by construction: OpusHead is 19 bytes (RFC
    * 7845 §5.1 fixed layout), the Xiph-laced Vorbis private is
    * 3 + 30 + 16 + 8 = 57, duration = 2500 ticks × 10⁶ ns ÷ 10⁹ =
    * 2.5 s; asset 2 (video-only) contributes NO rows, 3 the flagged
    * fallback, 4 the declared-bit-depth/no-private/no-duration face.
    * An element-ID, float-width, lacing-sniff, or default regression
    * hash-fails.
    */
  val qMultimodalMkvAudio: QueryDef = QueryDef.sql(
    "q_multimodal_mkv_audio",
    """SELECT asset_id, track_idx, codec, channels,
      |  CAST(sample_rate_hz AS DOUBLE) AS sample_rate_hz, bit_depth,
      |  private_kind, private_len, CAST(duration_s AS DOUBLE)
      |    AS duration_s, indexed
      |FROM (VALUES
      |  (1, 0, 'A_OPUS', 2, 48000.0, -1, 'opus', CAST(19 AS BIGINT), 2.5,
      |   true),
      |  (1, 1, 'A_VORBIS', 1, 44100.0, -1, 'vorbis', CAST(57 AS BIGINT),
      |   2.5, true),
      |  (3, -1, '', -1, -1.0, -1, '', CAST(-1 AS BIGINT), -1.0, false),
      |  (4, 0, 'A_PCM/INT/LIT', 2, 16000.0, 16, 'none',
      |   CAST(-1 AS BIGINT), -1.0, true))
      |  AS t(asset_id, track_idx, codec, channels, sample_rate_hz,
      |       bit_depth, private_kind, private_len, duration_s, indexed)
      |ORDER BY asset_id, track_idx""".stripMargin,
    doc = "Matroska audio TrackEntry profile: codec/channels/rate/" +
      "depth/CodecPrivate/duration, header-only (multimodal ops)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.{MkvIndex, Multimodal}
    val assets = Seq(
      (1L, MkvIndex.encodeSyntheticAudio(Seq(
        ("A_OPUS", 2, 48000.0, Some(MkvIndex.encodeOpusHead(2, 48000))),
        ("A_VORBIS", 1, 44100.0, Some(MkvIndex.encodeVorbisPrivate()))),
        durationTicks = Some(2500.0))),
      (2L, MkvIndex.encodeSynthetic(
        Seq((Array.fill[Byte](5)(1), true)))),
      (3L, Array[Byte](9, 9, 9, 9)),
      (4L, MkvIndex.encodeSyntheticAudio(
        Seq(("A_PCM/INT/LIT", 2, 16000.0, None)), bitDepth = Some(16)))
    ).toDF("id", "bytes")
    Multimodal.extractMkvAudioTracks(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("track_idx"), col("codec"),
        col("channels"), col("sample_rate_hz"), col("bit_depth"),
        col("private_kind"), col("private_len"), col("duration_s"),
        col("indexed"))
      .orderBy("asset_id", "track_idx")
  }

  /** AUDIO codec-config extraction
    * ([[graft.multimodal.Mp4Index.audioCodecInfo]] +
    * [[graft.multimodal.CodecConfigs.parseAudio]]): the stsd entry's
    * declared rate/channels AND the record's own declaration,
    * separately. Oracle by construction: the minimal esds is
    * 4 (flags) + 24 (ES→DecoderConfig→ASC with 1-byte lengths) = 28
    * bytes, objectTypeIndication 0x40 = 64, ASC freqIdx 4 = 44100 Hz;
    * the family-0 dOps is 11 bytes with objectType −1. Asset 3 pins
    * the required-esds-absent posture (bare mp4a), 4 the flagged
    * fallback, 5 a malformed record (bad FullBox version → −1
    * fields, span reported), 6 an entry/record MISMATCH (entry says
    * 22050/1, the ASC says 44100/2 — both visible). A descriptor-
    * framing, ASC-bit, or routing regression hash-fails.
    */
  val qMultimodalAudioConfig: QueryDef = QueryDef.sql(
    "q_multimodal_audio_config",
    """SELECT * FROM (VALUES
      |  (1, 'mp4a', 'esds', 44100, 2, 64, 44100, 2,
      |   CAST(28 AS BIGINT), true),
      |  (2, 'Opus', 'dOps', 48000, 2, -1, 48000, 2,
      |   CAST(11 AS BIGINT), true),
      |  (3, 'mp4a', 'esds', 22050, 2, -1, -1, -1,
      |   CAST(-1 AS BIGINT), true),
      |  (4, '', '', -1, -1, -1, -1, -1, CAST(-1 AS BIGINT), false),
      |  (5, 'mp4a', 'esds', 44100, 2, -1, -1, -1,
      |   CAST(28 AS BIGINT), true),
      |  (6, 'mp4a', 'esds', 22050, 1, 64, 44100, 2,
      |   CAST(28 AS BIGINT), true))
      |  AS t(asset_id, codec, kind, entry_rate_hz, entry_channels,
      |       object_type, config_rate_hz, config_channels, config_len,
      |       indexed)
      |ORDER BY asset_id""".stripMargin,
    doc = "Audio codec-config extraction: esds (AAC) + dOps (Opus) " +
      "over ISO-BMFF sample entries (multimodal ops)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.{CodecConfigs, Mp4Index, Multimodal}
    val samples = Seq(Array.tabulate[Byte](40)(_.toByte))
    val esds = CodecConfigs.encodeEsdsRecord(freqIdx = 4, channels = 2)
    val esdsBad = esds.clone(); esdsBad(0) = 1 // FullBox version != 0
    def m4a(entry: Array[Byte]): Array[Byte] =
      Mp4Index.encodeSyntheticM4a(samples, audioEntry = Some(entry))
    val assets = Seq(
      (1L, m4a(Mp4Index.audioSampleEntryBox("mp4a", 44100, 2,
        Some(("esds", esds))))),
      (2L, m4a(Mp4Index.audioSampleEntryBox("Opus", 48000, 2,
        Some(("dOps", CodecConfigs.encodeDOpsRecord(2, 48000)))))),
      (3L, Mp4Index.encodeSyntheticM4a(samples, sampleRate = 22050)),
      (4L, Array[Byte](9, 9, 9, 9)),
      (5L, m4a(Mp4Index.audioSampleEntryBox("mp4a", 44100, 2,
        Some(("esds", esdsBad))))),
      // entry/record mismatch: both declarations must surface
      (6L, m4a(Mp4Index.audioSampleEntryBox("mp4a", 22050, 1,
        Some(("esds", esds)))))
    ).toDF("id", "bytes")
    Multimodal.audioCodecConfigs(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("codec"), col("kind"),
        col("entry_rate_hz"), col("entry_channels"), col("object_type"),
        col("config_rate_hz"), col("config_channels"), col("config_len"),
        col("indexed"))
      .orderBy("asset_id")
  }

  /** Matroska subtitle-cue extraction
    * ([[graft.multimodal.MkvIndex.subtitleCues]] → text rows): the
    * in-container sibling of the SRT/VTT family. Oracle by
    * construction: TimestampScale 10⁶ makes ticks milliseconds, so
    * the encoder's (start, dur) pairs ARE the oracle's ms values;
    * asset 2 pins track routing (leading video track + interleaved
    * video blocks must not leak into the cues) and SimpleBlock
    * carriage (dur −1); asset 3 the flagged fallback; asset 4 a
    * valid subtitle-less file contributing NO rows. UTF-8 text with
    * a non-ASCII cue pins the decode. A timestamp, duration,
    * routing, or lacing-contract regression hash-fails. Asset 5 pins
    * the S_TEXT/ASS carriage: the Matroska mapping stores
    * `ReadOrder,Layer,Style,Name,MarginL,MarginR,MarginV,Effect,Text`
    * per block — the 8 metadata fields must be STRIPPED (the Text
    * field's own commas kept) and `\N`/`\h` escapes decoded, so the
    * text column carries the cue text, not `0,0,Default,,0,0,0,,…`.
    */
  val qMultimodalMkvSubtitles: QueryDef = QueryDef.sql(
    "q_multimodal_mkv_subtitles",
    """SELECT asset_id, cue_idx, CAST(start_ms AS DOUBLE) AS start_ms,
      |  CAST(dur_ms AS DOUBLE) AS dur_ms, text, n_chars, extracted
      |FROM (VALUES
      |  (1, 0, 0.0, 2000.0, 'Hello there.', 12, true),
      |  (1, 1, 2500.0, 1500.0, CAST('Caf' || CHR(233) || ' scene'
      |     AS VARCHAR), 10, true),
      |  (2, 0, 100.0, -1.0, 'routed', 6, true),
      |  (3, -1, -1.0, -1.0, '', 0, false),
      |  (5, 0, 3000.0, 2000.0, CAST('Hello, comma' || CHR(10) ||
      |     'line two' AS VARCHAR), 21, true),
      |  (5, 1, 6000.0, -1.0, 'hard space', 10, true))
      |  AS t(asset_id, cue_idx, start_ms, dur_ms, text, n_chars,
      |       extracted)
      |ORDER BY asset_id, cue_idx""".stripMargin,
    doc = "Matroska S_TEXT subtitle cues to text rows (multimodal " +
      "ops; the SRT/VTT family's in-container sibling)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.{MkvIndex, Multimodal}
    val assets = Seq(
      (1L, MkvIndex.encodeSyntheticSubtitles(Seq(
        (0L, 2000L, "Hello there."),
        (2500L, 1500L, "Café scene")))),
      (2L, MkvIndex.encodeSyntheticSubtitles(Seq(
        (100L, -1L, "routed")), videoTrackFirst = true)),
      (3L, Array[Byte](9, 9, 9, 9)),
      (4L, MkvIndex.encodeSynthetic(
        Seq((Array.fill[Byte](5)(1), true)))),
      // the ASS carriage: raw block payloads carry the 8 dialogue
      // metadata fields + escapes; the text column must not
      (5L, MkvIndex.encodeSyntheticSubtitles(Seq(
        (3000L, 2000L, "0,0,Default,,0,0,0,,Hello, comma\\Nline two"),
        (6000L, -1L, "1,0,Default,,0,0,0,,hard\\hspace")),
        codecId = "S_TEXT/ASS"))
    ).toDF("id", "bytes")
    Multimodal.extractMkvSubtitles(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("cue_idx"), col("start_ms"),
        col("dur_ms"), col("text"), col("n_chars"), col("extracted"))
      .orderBy("asset_id", "cue_idx")
  }

  /** Matroska attachment extraction
    * ([[graft.multimodal.MkvIndex.attachments]] → rows): cover art,
    * fonts, companion files — the last common Matroska payload kind
    * beside media tracks. Oracle by construction: the cover is the
    * hand-built 33-byte VP8L WebP (100×50 — [[graft.multimodal
    * .ImageDims]] decodes the dims from the data head, pinning the
    * image-attachment feed-through); the font/notes entries pin
    * non-image rows (no dims) and the omitted-FileUID posture
    * (uid −1 by value). Asset 2 pins the no-half-parse rule: an
    * AttachedFile MISSING its spec-mandatory FileMimeType refuses
    * the whole asset (flagged row); asset 3 the non-Matroska flag;
    * asset 4 a valid file with no attachments contributing NO rows.
    * An element-tiling, mandatory-field, span, or dims regression
    * hash-fails.
    */
  val qMultimodalMkvAttachments: QueryDef = QueryDef.sql(
    "q_multimodal_mkv_attachments",
    """SELECT asset_id, att_idx, file_name, mime_type,
      |  CAST(file_uid AS BIGINT) AS file_uid,
      |  CAST(data_len AS BIGINT) AS data_len, img_format, width,
      |  height, indexed
      |FROM (VALUES
      |  (1, 0, 'cover.webp', 'image/webp', 7, 33, 'webp', 100, 50,
      |   true),
      |  (1, 1, 'font.ttf', 'font/ttf', 8, 20, '', -1, -1, true),
      |  (1, 2, 'notes.txt', 'text/plain', -1, 2, '', -1, -1, true),
      |  (2, -1, '', '', -1, -1, '', -1, -1, false),
      |  (3, -1, '', '', -1, -1, '', -1, -1, false))
      |  AS t(asset_id, att_idx, file_name, mime_type, file_uid,
      |       data_len, img_format, width, height, indexed)
      |ORDER BY asset_id, att_idx""".stripMargin,
    doc = "Matroska AttachedFile index: name/mime/uid + data spans, " +
      "image attachments' dims decoded from the data head " +
      "(multimodal ops; spans are SpanFetch ranges)") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.{MkvIndex, Multimodal}
    // the hand-built VP8L WebP: deterministic 33 bytes, 100x50
    val webp: Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("ISO-8859-1"))
      val payload = 13
      (0 until 4).foreach(j => out.write(((4 + 8 + payload) >> (8 * j)) & 0xff))
      out.write("WEBPVP8L".getBytes("ISO-8859-1"))
      (0 until 4).foreach(j => out.write((payload >> (8 * j)) & 0xff))
      out.write(0x2f)
      val bits = 99L | (49L << 14) // (w-1, h-1) packed 14-bit fields
      (0 until 4).foreach(j => out.write(((bits >> (8 * j)) & 0xff).toInt))
      out.write(new Array[Byte](8))
      out.toByteArray
    }
    val assets = Seq(
      (1L, MkvIndex.encodeSyntheticAttachments(Seq(
        ("cover.webp", "image/webp", 7L, webp),
        ("font.ttf", "font/ttf", 8L, Array.fill[Byte](20)(0x42)),
        ("notes.txt", "text/plain", -1L, "hi".getBytes("UTF-8"))))),
      // spec-mandatory FileMimeType missing -> the whole asset refuses
      (2L, MkvIndex.encodeSyntheticAttachments(Seq(
        ("cover.webp", "image/webp", 7L, webp)),
        omitMimeFor = Set("cover.webp"))),
      (3L, Array[Byte](9, 9, 9, 9)),
      (4L, MkvIndex.encodeSynthetic(
        Seq((Array.fill[Byte](5)(1), true))))
    ).toDF("id", "bytes")
    Multimodal.extractMkvAttachments(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("att_idx"), col("file_name"),
        col("mime_type"), col("file_uid"), col("data_len"),
        col("img_format"), col("width"), col("height"), col("indexed"))
      .orderBy("asset_id", "att_idx")
  }

  /** Matroska CHAPTERS gate ([[graft.multimodal.MkvIndex.chapters]]
    * via `Multimodal.extractMkvChapters`): the navigation payload
    * kind joining tracks/attachments/subtitles. Asset 1 pins two
    * editions — edition 0 with two top-level chapters (the first
    * carrying a nested atom at level 1, emitted parent-first; the
    * second without ChapterTimeEnd → `end_ns = -1`) and edition 1
    * with one display-less chapter (empty title, spec-default "eng")
    * — all times NANOSECONDS by construction. Asset 2 pins the
    * no-half-parse rule (ChapterAtom missing its mandatory
    * ChapterUID refuses the asset); asset 3 the non-Matroska flag;
    * asset 4 a valid chapter-less file contributing NO rows. A
    * tiling, mandatory-field, nesting-order, or language-default
    * regression hash-fails.
    */
  val qMultimodalMkvChapters: QueryDef = QueryDef.sql(
    "q_multimodal_mkv_chapters",
    """SELECT asset_id, edition_idx, chapter_idx,
      |  CAST(chapter_uid AS BIGINT) AS chapter_uid,
      |  CAST(start_ns AS BIGINT) AS start_ns,
      |  CAST(end_ns AS BIGINT) AS end_ns, title, language, nest_level,
      |  indexed
      |FROM (VALUES
      |  (1, 0, 0, 11, 0, 90000000000, 'Intro', 'eng', 0, true),
      |  (1, 0, 1, 12, 5000000000, 30000000000, 'Cold open', 'und', 1,
      |   true),
      |  (1, 0, 2, 13, 90000000000, -1, 'Hauptteil', 'ger', 0, true),
      |  (1, 1, 3, 21, 0, 60000000000, '', 'eng', 0, true),
      |  (2, -1, -1, -1, -1, -1, '', '', -1, false),
      |  (3, -1, -1, -1, -1, -1, '', '', -1, false))
      |  AS t(asset_id, edition_idx, chapter_idx, chapter_uid, start_ns,
      |       end_ns, title, language, nest_level, indexed)
      |ORDER BY asset_id, chapter_idx""".stripMargin,
    doc = "Matroska chapter marks: edition/atom tree to (uid, ns " +
      "times, title, language, nesting) rows, mandatory-field refusal " +
      "+ non-Matroska flag postures") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.{MkvIndex, Multimodal}
    import MkvIndex.ChapterSpec
    val assets = Seq(
      (1L, MkvIndex.encodeSyntheticChapters(Seq(
        Seq(
          ChapterSpec(11L, 0L, 90000000000L, "Intro", "eng",
            children = Seq(ChapterSpec(12L, 5000000000L, 30000000000L,
              "Cold open", "und"))),
          ChapterSpec(13L, 90000000000L, -1L, "Hauptteil", "ger")),
        Seq(ChapterSpec(21L, 0L, 60000000000L, null, null))))),
      // mandatory ChapterUID missing -> the whole asset refuses
      (2L, MkvIndex.encodeSyntheticChapters(Seq(Seq(
        ChapterSpec(0L, 0L, -1L, "x", null, omitUid = true))))),
      (3L, Array[Byte](9, 9, 9, 9)),
      (4L, MkvIndex.encodeSynthetic(Seq((Array.fill[Byte](5)(1), true))))
    ).toDF("id", "bytes")
    Multimodal.extractMkvChapters(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("edition_idx"), col("chapter_idx"),
        col("chapter_uid"), col("start_ns"), col("end_ns"), col("title"),
        col("language"), col("nest_level"), col("indexed"))
      .orderBy("asset_id", "chapter_idx")
  }

  /** Matroska TAGS gate ([[graft.multimodal.MkvIndex.mkvTags]] via
    * `Multimodal.extractMkvTags`): TITLE/ARTIST/… SimpleTags — the
    * Matroska sibling of the ID3/Vorbis/FLAC tag families, with
    * per-Tag targeting. Asset 1 pins two Tag elements: one at the
    * explicit movie level (TargetTypeValue 50) whose SimpleTags
    * cover a nested sub-tag (parent-first) with a language override
    * and a TagBinary (binary flag, empty value); one track-scoped
    * (TargetTypeValue 30, TagTrackUID 7). Asset 2 pins the
    * Targets-less defaults (50 / uid 0). Asset 3 pins the
    * no-half-parse rule (SimpleTag missing its mandatory TagName
    * refuses); asset 4 the non-Matroska flag; asset 5 a valid
    * tag-less file contributing NO rows. A tiling, default,
    * targeting, or nesting regression hash-fails.
    */
  val qMultimodalMkvTags: QueryDef = QueryDef.sql(
    "q_multimodal_mkv_tags",
    """SELECT asset_id, tag_idx, row_idx,
      |  CAST(target_type AS BIGINT) AS target_type,
      |  CAST(track_uid AS BIGINT) AS track_uid, name, value, language,
      |  is_binary, nest_level, indexed
      |FROM (VALUES
      |  (1, 0, 0, 50, 0, 'TITLE', 'Voyage', 'und', false, 0, true),
      |  (1, 0, 1, 50, 0, 'SORT_WITH', 'voyage', 'eng', false, 1, true),
      |  (1, 0, 2, 50, 0, 'THUMBNAIL', '', 'und', true, 0, true),
      |  (1, 1, 3, 30, 7, 'ARTIST', 'Ensemble', 'und', false, 0, true),
      |  (2, 0, 0, 50, 0, 'DATE_RELEASED', '2021', 'und', false, 0,
      |   true),
      |  (3, -1, -1, -1, -1, '', '', '', false, -1, false),
      |  (4, -1, -1, -1, -1, '', '', '', false, -1, false))
      |  AS t(asset_id, tag_idx, row_idx, target_type, track_uid, name,
      |       value, language, is_binary, nest_level, indexed)
      |ORDER BY asset_id, row_idx""".stripMargin,
    doc = "Matroska Tags: SimpleTag name/value/language rows with " +
      "TargetTypeValue/TagTrackUID targeting, defaults, TagBinary " +
      "flagging, nesting, refusal + non-Matroska postures") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.{MkvIndex, Multimodal}
    import MkvIndex.TagSpec
    val assets = Seq(
      (1L, MkvIndex.encodeSyntheticTags(Seq(
        (50L, 0L, Seq(
          TagSpec("TITLE", "Voyage",
            children = Seq(TagSpec("SORT_WITH", "voyage", lang = "eng"))),
          TagSpec("THUMBNAIL", null))),
        (30L, 7L, Seq(TagSpec("ARTIST", "Ensemble")))))),
      // Targets omitted entirely -> spec defaults (50, uid 0)
      (2L, MkvIndex.encodeSyntheticTags(Seq(
        (-1L, 0L, Seq(TagSpec("DATE_RELEASED", "2021")))))),
      // mandatory TagName missing -> the whole asset refuses
      (3L, MkvIndex.encodeSyntheticTags(Seq(
        (50L, 0L, Seq(TagSpec(null, "x")))))),
      (4L, Array[Byte](9, 9, 9, 9)),
      (5L, MkvIndex.encodeSynthetic(Seq((Array.fill[Byte](5)(1), true))))
    ).toDF("id", "bytes")
    Multimodal.extractMkvTags(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("tag_idx"), col("row_idx"),
        col("target_type"), col("track_uid"), col("name"), col("value"),
        col("language"), col("binary").as("is_binary"),
        col("nest_level"), col("indexed"))
      .orderBy("asset_id", "row_idx")
  }

  /** MP4 `ilst` TAGS gate ([[graft.multimodal.Mp4Index.ilstTags]]
    * via `Multimodal.extractMp4Tags`): the iTunes-style metadata
    * carriage (`moov/udta/meta/ilst`) — the last tag family beside
    * ID3/Vorbis/FLAC/Matroska. Asset 1 pins UTF-8 text items (©-
    * prefixed fourccs through the ISO-8859-1 mapping), a type-21
    * signed int (tmpo), the packed `trkn` track/total layout, and a
    * binary cover-art item (type 14 → flagged, value empty). Asset 2
    * pins a tag-less M4A contributing NO rows; asset 3 an ilst item
    * MISSING its `data` atom (the no-half-parse refusal); asset 4
    * the non-BMFF flag. A box-tiling, type-rendering, or packed-
    * layout regression hash-fails.
    */
  val qMultimodalMp4Tags: QueryDef = QueryDef.sql(
    "q_multimodal_mp4_tags",
    """SELECT asset_id, item_idx, name, data_type, value, is_binary,
      |  indexed
      |FROM (VALUES
      |  (1, 0, CHR(169) || 'nam', 1, 'Voyage', false, true),
      |  (1, 1, CHR(169) || 'ART', 1, 'Ensemble', false, true),
      |  (1, 2, 'tmpo', 21, '120', false, true),
      |  (1, 3, 'trkn', 0, '3/12', false, true),
      |  (1, 4, 'covr', 14, '', true, true),
      |  (3, -1, '', -1, '', false, false),
      |  (4, -1, '', -1, '', false, false))
      |  AS t(asset_id, item_idx, name, data_type, value, is_binary,
      |       indexed)
      |ORDER BY asset_id, item_idx""".stripMargin,
    doc = "MP4/M4A ilst tags: text/int/packed-track/binary data atoms " +
      "to rows, tag-less + missing-data-atom + non-BMFF postures") {
    (s, dir) =>
    import s.implicits._
    import graft.multimodal.{Mp4Index, Multimodal}
    val sample = Array.fill[Byte](9)(3)
    val tagged = Mp4Index.encodeSyntheticM4a(Seq(sample),
      udta = Mp4Index.ilstBox(Seq(
        ("©nam", Mp4Index.ilstData(1, "Voyage".getBytes("UTF-8"))),
        ("©ART", Mp4Index.ilstData(1, "Ensemble".getBytes("UTF-8"))),
        ("tmpo", Mp4Index.ilstData(21, Array[Byte](0, 120))),
        ("trkn", Mp4Index.ilstData(0,
          Array[Byte](0, 0, 0, 3, 0, 12, 0, 0))),
        ("covr", Mp4Index.ilstData(14, Array.fill[Byte](24)(0x42))))))
    val plain = Mp4Index.encodeSyntheticM4a(Seq(sample))
    // an ilst item with NO data atom: a bare item box inside the tree
    val missingData = Mp4Index.encodeSyntheticM4a(Seq(sample),
      udta = graft.multimodal.Mp4Index.ilstBox(Seq(
        ("©nam", Array.empty[Byte]))))
    val assets = Seq((1L, tagged), (2L, plain), (3L, missingData),
      (4L, Array[Byte](9, 9, 9, 9))).toDF("id", "bytes")
    Multimodal.extractMp4Tags(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("item_idx"), col("name"),
        col("data_type"), col("value"), col("binary").as("is_binary"),
        col("indexed"))
      .orderBy("asset_id", "item_idx")
  }

  val all: Seq[QueryDef] = Seq(
    qMultimodalMkvChapters, qMultimodalMkvTags, qMultimodalMp4Tags,
    qMultimodalDecode, qMultimodalAudio, qMultimodalResize, qMultimodalVideo,
    qMultimodalPhash, qMultimodalAudioNeardup, qMultimodalVideoNeardup,
    qMultimodalH264Index, qMultimodalAvccIndex, qMultimodalMp4Index,
    qMultimodalFmp4Index, qMultimodalMp3Index, qMultimodalAacIndex,
    qMultimodalFlacIndex, qMultimodalTsIndex, qMultimodalM4aIndex,
    qMultimodalVideoProfile, qMultimodalAudioProfile,
    qMultimodalImageDims, qMultimodalTags, qMultimodalWavInfo,
    qMultimodalHevcIndex, qMultimodalMkvIndex, qMultimodalDkifIndex,
    qMultimodalOggIndex, qMultimodalCodecConfig, qMultimodalMkvAudio,
    qMultimodalAudioConfig, qMultimodalMkvSubtitles,
    qMultimodalMkvAttachments)
}
