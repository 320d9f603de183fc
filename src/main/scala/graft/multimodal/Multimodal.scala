package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for a training-data pipeline: media as
  * opaque `binary` columns with typed metadata, processed by
  * partition-mapped batch functions.
  *
  * IMAGE, AUDIO and VIDEO decode are REAL: the JDK ships
  * `javax.imageio` (PNG/JPEG/GIF/BMP → [[decodeImage]]) and
  * `javax.sound.sampled` (WAV/PCM → [[decodeAudio]]), and MJPEG-in-AVI
  * video decodes through the RIFF walk + per-frame JPEG path in
  * [[AviMjpeg]] ([[sampleVideoFrames]]) — no external libraries
  * needed. Bytes no installed reader accepts fall back to a flagged
  * `decoded = false` record, keeping the pipeline total (no dropped
  * assets); other video codecs (H.264 etc. — no JDK decoder exists)
  * take that flagged fallback.
  *
  * Scale design: media rows are large (MBs) — `repartitionForMedia`
  * sizes partitions by BYTES not row count, so a 100 TB corpus of
  * mixed-size blobs doesn't produce straggler tasks. Feature extraction
  * is mapPartitions (one iterator pass, no per-row closure overhead) —
  * the Scala analogue of `mapInPandas` batch UDFs — and luma sampling
  * is grid-bounded so a 100-megapixel scan costs the same as a
  * thumbnail.
  */
object Multimodal {

  /** Typed record for a media asset: id + raw bytes + metadata. */
  final case class MediaAsset(
      asset_id: Long,
      kind: String,          // "image" | "audio" | "video"
      uri: String,
      content: Array[Byte],
      content_length: Long)

  /** Decoded-image features; `decoded = false` marks the stub fallback
    * for bytes no installed reader accepts. */
  final case class ImageFeatures(
      asset_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_luma: Double,
      decoded: Boolean)

  /** Leading-bytes kind sniff for assets whose uri carries no known
    * extension — extension-only routing silently drops a misnamed
    * `.bin` MP4 from every kind-filtered pipeline. Pure codegen'd
    * binary `substring` comparisons against the container magics the
    * strict indexers themselves arbitrate on: PNG/JPEG/GIF/BMP/
    * RIFF+WEBP (image); RIFF+WAVE, ID3, OggS, fLaC, an MPEG-1/2
    * Layer-III frame sync, or an ADTS AAC sync (layer bits 00 — the
    * field that separates ADTS from every MPEG-audio layer)
    * (audio); ftyp at byte 4 (MP4), EBML 0x1A45DFA3 (Matroska/WebM),
    * RIFF+AVI, a 4-byte Annex-B start code, or 0x47 sync bytes on
    * three consecutive 188-byte MPEG-TS packet boundaries (video). A
    * sniffed kind
    * only ROUTES the asset into a pipeline — the strict parsers still
    * refuse non-conforming bytes with the flagged fallback row, so a
    * magic-colliding junk blob costs one flagged row, never a wrong
    * result.
    */
  def sniffKind(bytes: Column): Column = {
    def magic(at: Int, m: Array[Byte]): Column =
      substring(bytes, at, m.length) === lit(m)
    def ascii(at: Int, s: String): Column =
      magic(at, s.getBytes("ISO-8859-1"))
    val image =
      magic(1, Array(0x89.toByte, 0x50, 0x4e, 0x47)) || // PNG
        magic(1, Array(0xff.toByte, 0xd8.toByte, 0xff.toByte)) || // JPEG
        ascii(1, "GIF8") || ascii(1, "BM") ||
        (ascii(1, "RIFF") && ascii(9, "WEBP")) ||
        // ISO-BMFF IMAGE brands (AVIF/HEIC) — checked BEFORE the
        // video ftyp clause below, so brand decides image vs movie
        (ascii(5, "ftyp") &&
          Seq("avif", "avis", "heic", "heix", "mif1", "msf1", "heif")
            .map(ascii(9, _)).reduce(_ || _))
    val audio =
      (ascii(1, "RIFF") && ascii(9, "WAVE")) ||
        ascii(1, "ID3") || ascii(1, "OggS") || ascii(1, "fLaC") ||
        // bare MP3 frame sync: FF + (MPEG-1/2, Layer III) second byte
        (magic(1, Array(0xff.toByte)) &&
          Seq(0xfb, 0xfa, 0xf3, 0xf2, 0xe3, 0xe2,
              // ADTS AAC: 12-bit sync + layer 00 (either ID/CRC bit)
              0xf0, 0xf1, 0xf8, 0xf9)
            .map(b => magic(2, Array(b.toByte))).reduce(_ || _))
    val video =
      ascii(5, "ftyp") || // ISO-BMFF: size(4) then the ftyp fourcc
        magic(1, Array(0x1a, 0x45, 0xdf.toByte, 0xa3.toByte)) || // EBML
        ascii(1, "DKIF") || // raw VP8/VP9/AV1 IVF capture
        (ascii(1, "RIFF") && ascii(9, "AVI ")) ||
        magic(1, Array(0, 0, 0, 1)) || // Annex-B start code (H.264/HEVC)
        // MPEG-TS: 0x47 sync on three consecutive 188-byte packets
        (magic(1, Array(0x47)) && magic(189, Array(0x47)) &&
          magic(377, Array(0x47)))
    when(image, "image").when(audio, "audio").when(video, "video")
      .otherwise("unknown")
  }

  /** Wrap a DataFrame of (id, uri, bytes) into the canonical media
    * schema, deriving kind from the uri suffix — falling back to the
    * content sniff ([[sniffKind]]) when the extension is unknown —
    * and length from the bytes: the multimodal twin of schema
    * inference.
    */
  def toMediaAssets(df: DataFrame, idCol: String, uriCol: String,
      bytesCol: String)(implicit spark: SparkSession): Dataset[MediaAsset] = {
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("asset_id"),
      when(lower(col(uriCol))
        .rlike("\\.(png|jpe?g|gif|bmp|webp|avif|hei[cf])$"), "image")
        .when(lower(col(uriCol))
          .rlike("\\.(wav|mp3|flac|ogg|opus|aac|adts|m4a|m4b)$"), "audio")
        .when(lower(col(uriCol))
          .rlike("\\.(mp4|mov|avi|mkv|webm|h264|264|h265|hevc|265|ivf|ts|m2ts)$"),
          "video")
        .otherwise(sniffKind(col(bytesCol))).as("kind"),
      col(uriCol).as("uri"),
      col(bytesCol).as("content"),
      length(col(bytesCol)).cast("long").as("content_length"))
      .as[MediaAsset]
  }

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP — no
    * external libraries). Mean luma (Rec. 601) is sampled on a bounded
    * ≤32×32 grid: constant work per image regardless of resolution.
    * None when no installed reader accepts the bytes.
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else Some((img.getWidth, img.getHeight, img.getRaster.getNumBands,
        gridMeanLuma(img)))
    } catch { case _: Exception => None }

  /** Rec. 601 mean luma sampled on a bounded ≤32×32 grid — constant
    * work per image regardless of resolution. Shared by the image and
    * video decode paths. */
  def gridMeanLuma(img: java.awt.image.BufferedImage): Double = {
    val w = img.getWidth
    val h = img.getHeight
    val sx = math.max(1, w / 32)
    val sy = math.max(1, h / 32)
    var sum = 0.0
    var n = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sum += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
        n += 1
        x += sx
      }
      y += sy
    }
    if (n == 0) 0.0 else sum / n
  }

  /** STUB decoder: deterministic fake features from the byte content —
    * the fallback for undecodable bytes and the stand-in shape for the
    * audio/video codecs the JDK lacks.
    */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.abs(h % 1024)
    val height = 64 + math.abs((h / 1024) % 1024)
    val channels = 1 + math.abs(h % 3)
    val meanLuma =
      if (bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length / 255.0
    (width, height, channels, meanLuma)
  }

  /** Batch feature extraction: one partition-level iterator pass (the
    * mapPartitions shape a vectorized decoder wants — amortized codec
    * init per partition, not per row). Real ImageIO decode; stub
    * fallback flagged via `decoded = false`.
    */
  def extractImageFeatures(assets: Dataset[MediaAsset])(
      implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    assets.filter(col("kind") === "image").mapPartitions { it =>
      // per-partition decoder init would go here (amortized)
      it.map { a =>
        decodeImage(a.content) match {
          case Some((w, h, c, luma)) =>
            ImageFeatures(a.asset_id, w, h, c, luma, decoded = true)
          case None =>
            val (w, h, c, luma) = decodeImageStub(a.content)
            ImageFeatures(a.asset_id, w, h, c, luma, decoded = false)
        }
      }
    }
  }

  /** Average-hash (aHash) perceptual fingerprint: the image is reduced
    * to an 8×8 grid of mean Rec. 601 lumas (every pixel contributes to
    * exactly one cell — deterministic, resolution-independent), and
    * bit i of the 64-bit hash is set iff cell i's luma exceeds the
    * grid mean. Visually-near-identical images land within a few bits
    * of Hamming distance; the standard cheap screen for near-duplicate
    * images before any learned embedding.
    */
  def imageAHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](64)
    val counts = new Array[Int](64)
    var y = 0
    while (y < h) {
      val cy = math.min(7, y * 8 / math.max(h, 1))
      var x = 0
      while (x < w) {
        val cx = math.min(7, x * 8 / math.max(w, 1))
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        val i = cy * 8 + cx
        sums(i) += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
        counts(i) += 1
        x += 1
      }
      y += 1
    }
    val cells = Array.tabulate(64)(i =>
      if (counts(i) == 0) 0.0 else sums(i) / counts(i))
    val mean = cells.sum / 64.0
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (cells(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** An image's perceptual hash; `decoded = false` marks undecodable
    * bytes (stub hash from the byte content, deterministic). */
  /** Decode-free image dimensions + EXIF orientation (1–8; 1 for
    * formats without one); `parsed = false` flags bytes no header
    * parser accepts. */
  final case class ImageDimsRow(asset_id: Long, format: String,
      width: Int, height: Int, orientation: Int, parsed: Boolean)

  /** Header-only dimension extraction ([[ImageDims]]): resolution /
    * aspect filtering of an image corpus WITHOUT paying a pixel
    * decode per asset — dimensions ride the first few hundred bytes
    * of every mainstream container (details on [[ImageDims]]), so a
    * batch of 100-megapixel scans costs the same as thumbnails. The
    * scalable pre-filter in front of [[extractImageFeatures]] (which
    * decodes); unparseable bytes emit one flagged row.
    */
  def extractImageDims(assets: Dataset[MediaAsset])(
      implicit spark: SparkSession): Dataset[ImageDimsRow] = {
    import spark.implicits._
    assets.filter(col("kind") === "image").mapPartitions { it =>
      it.map { a =>
        val d =
          try ImageDims.dims(a.content)
          catch { case scala.util.control.NonFatal(_) => None }
        d match {
          case Some(x) =>
            val orient =
              if (x.format == "jpeg") ImageDims.jpegOrientation(a.content)
              else 1
            ImageDimsRow(a.asset_id, x.format, x.width, x.height, orient,
              parsed = true)
          case None => ImageDimsRow(a.asset_id, "", 0, 0, 0,
            parsed = false)
        }
      }
    }
  }

  final case class ImageHash(asset_id: Long, phash: Long, decoded: Boolean)

  /** Batch perceptual hashing — same mapPartitions shape as
    * [[extractImageFeatures]]. Feed the result to
    * [[graft.dedup.Dedup.signatureNearDupPairs]] for banded
    * near-duplicate-image pairs (shuffle on chunk keys, never
    * all-pairs — the 100 TB image-dedup screen).
    */
  def extractImageHashes(assets: Dataset[MediaAsset])(
      implicit spark: SparkSession): Dataset[ImageHash] = {
    import spark.implicits._
    assets.filter(col("kind") === "image").mapPartitions { it =>
      it.map { a =>
        (try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.content)))
         catch { case _: Exception => None }) match {
          case Some(img) => ImageHash(a.asset_id, imageAHash64(img), decoded = true)
          case None =>
            ImageHash(a.asset_id,
              java.util.Arrays.hashCode(a.content).toLong, decoded = false)
        }
      }
    }
  }

  /** Decoded-audio features; `decoded = false` marks the stub fallback. */
  final case class AudioFeatures(
      asset_id: Long,
      sample_rate: Double,
      channels: Int,
      n_frames: Long,
      duration_sec: Double,
      rms: Double,
      decoded: Boolean)

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/PCM —
    * no external libraries): format header + RMS amplitude over a
    * bounded number of frames (constant work per asset). None when the
    * bytes aren't a supported audio stream or aren't 16-bit PCM.
    */
  def decodeAudio(bytes: Array[Byte],
      maxFrames: Int = 1 << 20): Option[(Double, Int, Long, Double)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val channels = fmt.getChannels
          val frameBytes = fmt.getFrameSize
          val totalFrames = ais.getFrameLength
          val toRead = math.min(totalFrames, maxFrames.toLong).toInt
          val buf = new Array[Byte](toRead * frameBytes)
          var off = 0
          var r = 0
          while (off < buf.length && r >= 0) {
            r = ais.read(buf, off, buf.length - off)
            if (r > 0) off += r
          }
          val be = fmt.isBigEndian
          var sumSq = 0.0
          var i = 0
          while (i + 1 < off) {
            val s =
              if (be) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
              else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
            val x = s / 32768.0
            sumSq += x * x
            i += 2
          }
          val nSamples = off / 2
          val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
          Some((fmt.getSampleRate.toDouble, channels, totalFrames, rms))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Batch audio feature extraction — same mapPartitions shape as the
    * image path; undecodable bytes flag `decoded = false` with zeroed
    * features rather than dropping the asset.
    */
  def extractAudioFeatures(assets: Dataset[MediaAsset])(
      implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    assets.filter(col("kind") === "audio").mapPartitions { it =>
      it.map { a =>
        decodeAudio(a.content) match {
          case Some((rate, ch, frames, rms)) =>
            AudioFeatures(a.asset_id, rate, ch, frames,
              if (rate == 0) 0.0 else frames / rate, rms, decoded = true)
          case None =>
            AudioFeatures(a.asset_id, 0.0, 0, 0L, 0.0, 0.0, decoded = false)
        }
      }
    }
  }

  /** 64-segment temporal-energy average hash of a PCM audio stream —
    * the audio twin of [[imageAHash64]]: the decoded waveform is split
    * into 64 equal-duration segments (every sample contributes to
    * exactly one — duration-independent, like aHash's pixel grid),
    * per-segment RMS is computed, and bit i is set iff segment i's RMS
    * exceeds the mean segment RMS. Near-identical audio (re-encodes,
    * small edits) lands within a few bits of Hamming distance; pitch
    * is ignored, which is exactly right for a cheap energy-envelope
    * near-dup screen. None for non-PCM-16 bytes or clips shorter than
    * 64 samples.
    */
  def audioAHash64(bytes: Array[Byte], maxFrames: Int = 1 << 20): Option[Long] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val frameBytes = fmt.getFrameSize
          val totalFrames = ais.getFrameLength
          val toRead = math.min(totalFrames, maxFrames.toLong).toInt
          val buf = new Array[Byte](toRead * frameBytes)
          var off = 0
          var r = 0
          while (off < buf.length && r >= 0) {
            r = ais.read(buf, off, buf.length - off)
            if (r > 0) off += r
          }
          val be = fmt.isBigEndian
          val nSamples = off / 2
          if (nSamples < 64) None
          else {
            val segSq = new Array[Double](64)
            val segN = new Array[Int](64)
            var i = 0
            var s = 0
            while (i + 1 < off) {
              val v = (if (be) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
                       else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort) / 32768.0
              val seg = math.min(63, (s.toLong * 64 / nSamples).toInt)
              segSq(seg) += v * v
              segN(seg) += 1
              i += 2
              s += 1
            }
            val rms = Array.tabulate(64)(k =>
              if (segN(k) == 0) 0.0 else math.sqrt(segSq(k) / segN(k)))
            val mean = rms.sum / 64.0
            var hash = 0L
            var k = 0
            while (k < 64) {
              if (rms(k) > mean) hash |= (1L << k)
              k += 1
            }
            Some(hash)
          }
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** An audio clip's energy-envelope hash; `decoded = false` marks
    * undecodable bytes (deterministic stub hash from the content). */
  final case class AudioHash(asset_id: Long, ahash: Long, decoded: Boolean)

  /** Batch audio fingerprinting — same mapPartitions shape as
    * [[extractAudioFeatures]]. Feed the result to
    * [[graft.dedup.Dedup.signatureNearDupPairs]] for banded
    * near-duplicate-audio pairs (shuffle on chunk keys, never
    * all-pairs — the 100 TB audio-dedup screen, sharing one Hamming
    * band engine with text SimHash and image aHash).
    */
  def extractAudioHashes(assets: Dataset[MediaAsset])(
      implicit spark: SparkSession): Dataset[AudioHash] = {
    import spark.implicits._
    assets.filter(col("kind") === "audio").mapPartitions { it =>
      it.map { a =>
        audioAHash64(a.content) match {
          case Some(h) => AudioHash(a.asset_id, h, decoded = true)
          case None =>
            AudioHash(a.asset_id,
              java.util.Arrays.hashCode(a.content).toLong, decoded = false)
        }
      }
    }
  }

  /** A resized image asset: re-encoded bytes + output dimensions. */
  final case class ResizedImage(
      asset_id: Long,
      width: Int,
      height: Int,
      content: Array[Byte],
      decoded: Boolean)

  /** Real image resize via JDK Graphics2D (bilinear) + PNG re-encode —
    * the standard thumbnail/normalize step before a vision encoder.
    * Aspect ratio is NOT preserved (fixed target shape, the usual
    * model-input contract). Undecodable bytes pass through unchanged
    * with `decoded = false`. Same mapPartitions batch shape as the
    * feature extractors.
    */
  def resizeImages(assets: Dataset[MediaAsset], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[ResizedImage] = {
    import spark.implicits._
    assets.filter(col("kind") === "image").mapPartitions { it =>
      it.map { a =>
        val img = try {
          Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.content)))
        } catch { case _: Exception => None }
        img match {
          case Some(src) =>
            val dst = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(src, 0, 0, targetW, targetH, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            ResizedImage(a.asset_id, targetW, targetH, bos.toByteArray,
              decoded = true)
          case None =>
            ResizedImage(a.asset_id, 0, 0, a.content, decoded = false)
        }
      }
    }
  }

  /** Frame sampling plumbing for video: emit every `stride`-th frame
    * index up to `maxFrames` as (asset_id, frame_idx) — the pure
    * fan-out/explode shape (index planning without touching bytes);
    * [[sampleVideoFrames]] is the decoding twin.
    */
  def sampleFrameIndexes(assets: Dataset[MediaAsset], stride: Int,
      maxFrames: Int): DataFrame =
    assets.filter(col("kind") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0), lit((maxFrames - 1) * stride), lit(stride)))
          .as("frame_idx"))

  /** A decoded sampled video frame; `decoded = false` flags either an
    * unparseable container (one row, frame_idx −1) or a frame chunk no
    * reader accepts. */
  final case class VideoFrame(
      asset_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      mean_luma: Double,
      decoded: Boolean)

  /** REAL video frame sampling for MJPEG-in-AVI ([[AviMjpeg]]): index
    * the container's frame chunks in one linear header walk, then
    * decode ONLY every `stride`-th frame up to `maxFrames` — the
    * skip-what-you-drop access pattern that matters when a corpus row
    * is a long clip. Containers the parser rejects (other codecs —
    * this is the one video format decodable with a bare JDK) emit a
    * single flagged `decoded = false` row, keeping the pipeline total.
    * Same mapPartitions batch shape as the image/audio extractors.
    */
  def sampleVideoFrames(assets: Dataset[MediaAsset], stride: Int,
      maxFrames: Int)(implicit spark: SparkSession): Dataset[VideoFrame] = {
    import spark.implicits._
    require(stride > 0 && maxFrames > 0, "stride and maxFrames must be positive")
    assets.filter(col("kind") === "video").mapPartitions { it =>
      it.flatMap { a =>
        AviMjpeg.frameChunks(a.content) match {
          case Some(chunks) =>
            (0 until chunks.size by stride).take(maxFrames).iterator.map { i =>
              AviMjpeg.decodeFrame(a.content, chunks(i)) match {
                case Some(img) =>
                  VideoFrame(a.asset_id, i, img.getWidth, img.getHeight,
                    gridMeanLuma(img), decoded = true)
                case None =>
                  VideoFrame(a.asset_id, i, 0, 0, 0.0, decoded = false)
              }
            }
          case None =>
            Iterator.single(VideoFrame(a.asset_id, -1, 0, 0, 0.0,
              decoded = false))
        }
      }
    }
  }

  /** A sampled MP3 (Layer III) frame BYTE RANGE plus the header
    * facts that need no decode (rate profile, PCM sample count —
    * duration/bitrate analytics come straight from these);
    * `indexed = false` flags the fallback row for bytes that are not
    * a Layer-III stream. */
  final case class Mp3Frame(
      asset_id: Long,
      frame_idx: Int,
      byte_start: Long,
      byte_len: Long,
      bitrate_kbps: Int,
      sample_rate_hz: Int,
      samples: Int,
      indexed: Boolean)

  /** MP3 frame-range sampling ([[Mp3Frames]]): the audio face of the
    * external-decoder seam — index the Layer-III frames in one linear
    * header walk (ID3v2/ID3v1 tags skipped), then emit every
    * `stride`-th frame's byte range with its bitrate/sample-rate/
    * sample-count header facts (up to `maxFrames`). No in-JVM decode;
    * duration and VBR profiles are pure arithmetic over the emitted
    * columns. Bit-reservoir caveat documented on [[Mp3Frames]]: a
    * seeking decoder should also fetch a couple of PRECEDING ranges.
    * Non-Layer-III bytes emit one flagged `indexed = false` row,
    * keeping the pipeline total.
    */
  def sampleMp3Frames(assets: Dataset[MediaAsset], stride: Int,
      maxFrames: Int)(
      implicit spark: SparkSession): Dataset[Mp3Frame] = {
    import spark.implicits._
    require(stride > 0 && maxFrames > 0, "stride and maxFrames must be positive")
    assets.filter(col("kind") === "audio").mapPartitions { it =>
      it.flatMap { a =>
        val indexed =
          try Mp3Frames.frameIndex(a.content)
          catch { case scala.util.control.NonFatal(_) => None }
        indexed match {
          case Some(spans) =>
            (0 until spans.size by stride).take(maxFrames).iterator.map { i =>
              val s = spans(i)
              Mp3Frame(a.asset_id, s.frameIdx, s.byteStart.toLong,
                s.byteLen.toLong, s.bitrateKbps, s.sampleRateHz,
                s.samples, indexed = true)
            }
          case None =>
            Iterator.single(Mp3Frame(a.asset_id, -1, 0L, 0L, 0, 0, 0,
              indexed = false))
        }
      }
    }
  }

  /** A sampled ADTS AAC frame BYTE RANGE plus the header facts that
    * need no decode (audio-object profile, rate, channels, PCM sample
    * count); `indexed = false` flags the fallback row for bytes that
    * are not an ADTS stream. */
  final case class AacFrame(
      asset_id: Long,
      frame_idx: Int,
      byte_start: Long,
      byte_len: Long,
      profile: Int,
      sample_rate_hz: Int,
      channels: Int,
      samples: Int,
      indexed: Boolean)

  /** ADTS AAC frame-range sampling ([[AdtsAac]]): the third audio
    * face of the external-decoder seam — the frame length rides
    * LITERALLY in each 7/9-byte header, so the index is one linear
    * field-extraction walk; every `stride`-th frame's byte range is
    * emitted with its profile/rate/channel/sample-count facts (up to
    * `maxFrames`). No in-JVM decode; duration and bitrate profiles
    * are pure arithmetic over the emitted columns. Non-ADTS bytes
    * emit one flagged `indexed = false` row, keeping the pipeline
    * total.
    */
  def sampleAacFrames(assets: Dataset[MediaAsset], stride: Int,
      maxFrames: Int)(
      implicit spark: SparkSession): Dataset[AacFrame] = {
    import spark.implicits._
    require(stride > 0 && maxFrames > 0, "stride and maxFrames must be positive")
    assets.filter(col("kind") === "audio").mapPartitions { it =>
      it.flatMap { a =>
        val indexed =
          try AdtsAac.frameIndex(a.content)
          catch { case scala.util.control.NonFatal(_) => None }
        indexed match {
          case Some(spans) =>
            (0 until spans.size by stride).take(maxFrames).iterator.map { i =>
              val s = spans(i)
              AacFrame(a.asset_id, s.frameIdx, s.byteStart.toLong,
                s.byteLen.toLong, s.profile, s.sampleRateHz, s.channels,
                s.samples, indexed = true)
            }
          case None =>
            Iterator.single(AacFrame(a.asset_id, -1, 0L, 0L, 0, 0, 0, 0,
              indexed = false))
        }
      }
    }
  }

  /** A sampled FLAC frame BYTE RANGE plus the PCM facts that need no
    * decode (block sample count, rate, channels, bit depth);
    * `indexed = false` flags the fallback row for bytes that are not
    * a FLAC stream. */
  final case class FlacFrame(
      asset_id: Long,
      frame_idx: Int,
      byte_start: Long,
      byte_len: Long,
      block_samples: Int,
      sample_rate_hz: Int,
      channels: Int,
      bits_per_sample: Int,
      indexed: Boolean)

  /** FLAC frame-range sampling ([[FlacIndex]]): the lossless face of
    * the external-decoder seam. FLAC headers carry no frame length —
    * the walk places boundaries with the format's own CRC-8/CRC-16
    * integrity chain (details on [[FlacIndex]]) — so the index costs
    * one linear pass, and every `stride`-th frame's byte range is
    * emitted with its PCM facts (up to `maxFrames`). Duration
    * analytics are pure arithmetic (`block_samples / sample_rate`).
    * Non-FLAC bytes emit one flagged `indexed = false` row, keeping
    * the pipeline total.
    */
  def sampleFlacFrames(assets: Dataset[MediaAsset], stride: Int,
      maxFrames: Int)(
      implicit spark: SparkSession): Dataset[FlacFrame] = {
    import spark.implicits._
    require(stride > 0 && maxFrames > 0, "stride and maxFrames must be positive")
    assets.filter(col("kind") === "audio").mapPartitions { it =>
      it.flatMap { a =>
        val indexed =
          try FlacIndex.frameIndex(a.content)
          catch { case scala.util.control.NonFatal(_) => None }
        indexed match {
          case Some(spans) =>
            (0 until spans.size by stride).take(maxFrames).iterator.map { i =>
              val s = spans(i)
              FlacFrame(a.asset_id, s.frameIdx, s.byteStart.toLong,
                s.byteLen.toLong, s.blockSamples, s.sampleRateHz,
                s.channels, s.bitsPerSample, indexed = true)
            }
          case None =>
            Iterator.single(FlacFrame(a.asset_id, -1, 0L, 0L, 0, 0, 0, 0,
              indexed = false))
        }
      }
    }
  }

  /** A sampled Ogg PAGE byte range plus the header facts that need
    * no decode (granule position — for Opus the 48 kHz PCM sample
    * count, so duration analytics are pure arithmetic — serial,
    * completed-packet count, stream flags); `indexed = false` flags
    * the fallback row for bytes that are not a CRC-valid Ogg
    * stream. */
  final case class OggPageRow(
      asset_id: Long,
      page_idx: Int,
      byte_start: Long,
      byte_len: Long,
      granule: Long,
      n_packets: Int,
      is_bos: Boolean,
      is_eos: Boolean,
      indexed: Boolean)

  /** Ogg page-range sampling ([[OggIndex]]): the second audio face of
    * the external-decoder seam beside [[sampleMp3Frames]] — index the
    * pages in one linear walk (every CRC validated), then emit every
    * `stride`-th page's byte range with its granule/packet facts (up
    * to `maxPages`). The page is Ogg's own seek unit, so the spans
    * are exactly what a seam decoder fetches. Non-Ogg bytes emit one
    * flagged `indexed = false` row, keeping the pipeline total.
    */
  def sampleOggPages(assets: Dataset[MediaAsset], stride: Int,
      maxPages: Int)(
      implicit spark: SparkSession): Dataset[OggPageRow] = {
    import spark.implicits._
    require(stride > 0 && maxPages > 0, "stride and maxPages must be positive")
    assets.filter(col("kind") === "audio").mapPartitions { it =>
      it.flatMap { a =>
        val indexed =
          try OggIndex.pageIndex(a.content)
          catch { case scala.util.control.NonFatal(_) => None }
        indexed match {
          case Some(pages) =>
            (0 until pages.size by stride).take(maxPages).iterator.map { i =>
              val p = pages(i)
              OggPageRow(a.asset_id, p.pageIdx, p.byteStart.toLong,
                p.byteLen.toLong, p.granule, p.packetsCompleted,
                p.isBos, p.isEos, indexed = true)
            }
          case None =>
            Iterator.single(OggPageRow(a.asset_id, -1, 0L, 0L, 0L, 0,
              is_bos = false, is_eos = false, indexed = false))
        }
      }
    }
  }

  /** WAV header facts + the data span; `parsed = false` flags bytes
    * that are not a well-formed RIFF/WAVE. */
  final case class WavInfoRow(asset_id: Long, format_code: Int,
      channels: Int, sample_rate_hz: Int, bits_per_sample: Int,
      data_start: Long, data_len: Long, frames: Long, parsed: Boolean)

  /** Header-only WAV profiling ([[WavIndex]]): the uncompressed face
    * of the audio seam — speech corpora ship as PCM WAV, and
    * duration/format profiling must not decode sample bytes
    * ([[decodeAudio]] is the decoding twin). `duration_s = frames /
    * rate` exactly; a slicing pipeline fetches PCM ranges straight
    * from the data span. Non-WAV bytes emit one flagged row.
    */
  def extractWavInfo(assets: Dataset[MediaAsset])(
      implicit spark: SparkSession): Dataset[WavInfoRow] = {
    import spark.implicits._
    assets.filter(col("kind") === "audio").mapPartitions { it =>
      it.map { a =>
        val parsed =
          try WavIndex.info(a.content)
          catch { case scala.util.control.NonFatal(_) => None }
        parsed match {
          case Some(w) => WavInfoRow(a.asset_id, w.formatCode, w.channels,
            w.sampleRateHz, w.bitsPerSample, w.dataStart.toLong,
            w.dataLen.toLong, w.frames, parsed = true)
          case None => WavInfoRow(a.asset_id, 0, 0, 0, 0, 0L, 0L, 0L,
            parsed = false)
        }
      }
    }
  }

  /** One extracted media tag; `parsed = false` flags assets neither
    * tag parser accepts. */
  final case class MediaTagRow(asset_id: Long, container: String,
      tag_key: String, tag_value: String, parsed: Boolean)

  /** Curation-metadata extraction ([[MediaTags]]): ID3v2 text frames
    * (MP3/ADTS) and FLAC Vorbis comments as rows — title/artist/
    * language tags drive dedup keys, attribution and split
    * stratification, and they ride the first kilobytes, so this is
    * header-only like the rest of the seam. Assets neither parser
    * accepts emit one flagged row; a tagged-but-empty asset emits
    * one parsed row with empty key/value (presence is a fact too).
    */
  def extractMediaTags(assets: Dataset[MediaAsset])(
      implicit spark: SparkSession): Dataset[MediaTagRow] = {
    import spark.implicits._
    assets.filter(col("kind") === "audio").mapPartitions { it =>
      it.flatMap { a =>
        val parsed =
          try MediaTags.tags(a.content)
          catch { case scala.util.control.NonFatal(_) => None }
        parsed match {
          case Some((container, tags)) if tags.nonEmpty =>
            tags.iterator.map(t =>
              MediaTagRow(a.asset_id, container, t.key, t.value,
                parsed = true))
          case Some((container, _)) =>
            Iterator.single(MediaTagRow(a.asset_id, container, "", "",
              parsed = true))
          case None =>
            Iterator.single(MediaTagRow(a.asset_id, "", "", "",
              parsed = false))
        }
      }
    }
  }

  /** A sampled ISO-BMFF audio sample byte range plus the
    * AudioSampleEntry facts (codec fourcc, rate, channels);
    * `indexed = false` flags assets with no parseable audio track. */
  final case class M4aFrame(
      asset_id: Long,
      sample_idx: Int,
      byte_start: Long,
      byte_len: Long,
      codec: String,
      sample_rate_hz: Int,
      channels: Int,
      indexed: Boolean)

  /** ISO-BMFF AUDIO sample sampling ([[Mp4Index.audioSampleTable]]):
    * M4A files and the audio track OF an A/V MP4 — so the filter
    * admits both kinds, and extracting the soundtrack from a video
    * corpus is the same call. Sample spans come from the stbl through
    * the same strict arithmetic as the video path (trak selection by
    * hdlr == 'soun'); rate/channels ride the AudioSampleEntry. No
    * decode; assets without a parseable audio track emit one flagged
    * row, keeping the pipeline total.
    */
  def sampleM4aFrames(assets: Dataset[MediaAsset], stride: Int,
      maxFrames: Int)(
      implicit spark: SparkSession): Dataset[M4aFrame] = {
    import spark.implicits._
    require(stride > 0 && maxFrames > 0, "stride and maxFrames must be positive")
    assets.filter(col("kind").isin("audio", "video")).mapPartitions { it =>
      it.flatMap { a =>
        val indexed =
          try Mp4Index.audioSampleTable(a.content)
          catch { case scala.util.control.NonFatal(_) => None }
        indexed match {
          case Some(t) =>
            (0 until t.offsets.length by stride).take(maxFrames)
              .iterator.map { i =>
                M4aFrame(a.asset_id, i, t.offsets(i), t.sizes(i), t.codec,
                  t.sampleRateHz, t.channels, indexed = true)
              }
          case None =>
            Iterator.single(M4aFrame(a.asset_id, -1, 0L, 0L, "", 0, 0,
              indexed = false))
        }
      }
    }
  }

  /** A sampled MPEG-TS PES-unit byte range plus the routing/timeline
    * facts that need no decode (PID, stream type, this PID's packet
    * count, 90 kHz PTS, random-access flag); `indexed = false` flags
    * the fallback row for bytes that are not a CRC-valid transport
    * stream. */
  final case class TsUnitRow(
      asset_id: Long,
      unit_idx: Int,
      byte_start: Long,
      byte_len: Long,
      pid: Int,
      stream_type: Int,
      n_packets: Int,
      pts: Long,
      is_random_access: Boolean,
      is_video: Boolean,
      indexed: Boolean)

  /** MPEG-TS PES-unit sampling ([[MpegTs]]): the streaming-capture
    * face of the decoder seam (HLS segments, broadcast captures).
    * One linear 188-byte-packet walk validates PAT/PMT CRCs, groups
    * elementary packets into PES units and emits every `stride`-th
    * unit's byte range with PID/stream-type/PTS/random-access facts
    * (up to `maxUnits`). Ranges are contiguous as muxed — an
    * external demuxer filters by PID inside the fetched slice.
    * Non-TS bytes emit one flagged `indexed = false` row, keeping
    * the pipeline total.
    */
  def sampleTsUnits(assets: Dataset[MediaAsset], stride: Int,
      maxUnits: Int)(
      implicit spark: SparkSession): Dataset[TsUnitRow] = {
    import spark.implicits._
    require(stride > 0 && maxUnits > 0, "stride and maxUnits must be positive")
    assets.filter(col("kind") === "video").mapPartitions { it =>
      it.flatMap { a =>
        val indexed =
          try MpegTs.unitIndex(a.content)
          catch { case scala.util.control.NonFatal(_) => None }
        indexed match {
          case Some(units) =>
            (0 until units.size by stride).take(maxUnits).iterator.map { i =>
              val u = units(i)
              TsUnitRow(a.asset_id, u.unitIdx, u.byteStart.toLong,
                u.byteLen.toLong, u.pid, u.streamType, u.nPackets,
                u.ptsTicks, u.isRandomAccess, u.isVideo, indexed = true)
            }
          case None =>
            Iterator.single(TsUnitRow(a.asset_id, -1, 0L, 0L, 0, 0, 0, -1L,
              is_random_access = false, is_video = false, indexed = false))
        }
      }
    }
  }

  /** A sampled H.264 frame BYTE RANGE (no decode — see
    * [[sampleH264Frames]]); `indexed = false` flags the single
    * fallback row for bytes that aren't an Annex-B stream. */
  final case class H264Frame(
      asset_id: Long,
      frame_idx: Int,
      byte_start: Long,
      byte_len: Long,
      is_idr: Boolean,
      indexed: Boolean)

  /** Coded-video frame-range sampling across the H.264 AND HEVC
    * (H.265) families ([[H264AnnexB]] / [[H264Avcc]] / [[H265]] /
    * [[Mp4Index]]): index the access units in one linear scan, then
    * emit every `stride`-th frame's BYTE RANGE (up to `maxFrames`;
    * `keyframesOnly` restricts to IDR/IRAP frames — the seekable
    * ones). This is the MJPEG sampler's access pattern applied to the
    * codecs the JVM cannot decode: at 100 TB the win is fetching only
    * the sampled ranges and handing them to an external decoder
    * behind a UDF seam — the decode step itself is deliberately
    * absent here (the range + keyframe flag is everything the seam
    * needs). Framings are sniffed strictest-first per asset:
    *  1. real MP4 ([[Mp4Index]] — the `stbl`/`moof` tables ARE the
    *     frame index, codec-agnostic; a leading `ftyp` cannot be
    *     impersonated by the others), then Matroska/WebM
    *     ([[MkvIndex]] — the EBML-header magic is equally
    *     unambiguous, and its block walk is codec-agnostic too),
    *  2. raw AVCC (avcC record + length-prefixed NALs — before any
    *     start-code walk because a 4-byte length prefix can
    *     impersonate a start code, never the reverse),
    *  3. raw hvcC + length-prefixed HEVC ([[H265.frameIndexHvcc]] —
    *     its six reserved-bit checks and exact tiling cannot pass an
    *     avcC record, and vice versa),
    *  4. H.264 Annex-B (start codes, parameter sets inline),
    *  5. HEVC Annex-B ([[H265.frameIndexAnnexB]] — AFTER H.264
    *     because an H.264 slice payload's leading 0x80 reads as
    *     temporal_id_plus1 == 0 and fails HEVC's whole-stream header
    *     check, while H.265 NAL types never alias H.264 slice types
    *     at nuh_layer_id 0; trying H.264 first makes the order
    *     independent of payload luck).
    * Out-of-band parameter sets (avcC/hvcC at the asset head for raw
    * streams, inside `stsd` for MP4 — [[Mp4Index.SampleTable]]) are
    * the decoder seam's to re-read; Annex-B frame 0 carries them
    * inline. Bytes matching no framing emit one flagged
    * `indexed = false` row, keeping the pipeline total.
    */
  def sampleH264Frames(assets: Dataset[MediaAsset], stride: Int,
      maxFrames: Int, keyframesOnly: Boolean = false)(
      implicit spark: SparkSession): Dataset[H264Frame] = {
    import spark.implicits._
    require(stride > 0 && maxFrames > 0, "stride and maxFrames must be positive")
    assets.filter(col("kind") === "video").mapPartitions { it =>
      it.flatMap { a =>
        // backstop for the contract the walkers already aim at with
        // explicit bounds checks: ONE corrupt/adversarial asset in a
        // scraped corpus degrades to its flagged fallback row — it
        // must never escape as an exception that kills the task
        val indexed =
          try Mp4Index.frameIndex(a.content)
            .orElse(MkvIndex.frameIndex(a.content))
            .orElse(DkifIndex.frameIndex(a.content))
            .orElse(H264Avcc.frameIndex(a.content))
            .orElse(H265.frameIndexHvcc(a.content))
            .orElse(H264AnnexB.frameIndex(a.content))
            .orElse(H265.frameIndexAnnexB(a.content))
          catch { case scala.util.control.NonFatal(_) => None }
        indexed match {
          case Some(spans) =>
            val pool = if (keyframesOnly) spans.filter(_.isIdr) else spans
            (0 until pool.size by stride).take(maxFrames).iterator.map { i =>
              val s = pool(i)
              H264Frame(a.asset_id, s.frameIdx, s.byteStart.toLong,
                s.byteLen.toLong, s.isIdr, indexed = true)
            }
          case None =>
            Iterator.single(
              H264Frame(a.asset_id, -1, 0L, 0L, is_idr = false,
                indexed = false))
        }
      }
    }
  }

  /** Frame-range sampling for container assets addressed BY PATH
    * instead of by an in-row byte column — the >2 GiB route: the
    * JVM's array cap means a movie-length MP4/WebM cannot even be
    * REPRESENTED as a binary column, and at 100 TB shipping whole
    * assets through a shuffle to read box/element headers is absurd
    * anyway. Each task opens the file and indexes via
    * [[Mp4Index.frameIndexSeekable]] (plain + fragmented MP4) falling
    * through to [[MkvIndex.frameIndexSeekable]] (Matroska/WebM) and
    * [[DkifIndex.frameIndexSeekable]] (raw IVF captures) — only
    * headers, sample/track tables and short keyframe probes are ever
    * read, so indexing a 50 GB file costs KILOBYTES of I/O. Paths
    * route through [[graft.io.PathIO]]: scheme-qualified URIs
    * (`s3a://…`, `hdfs://…`, `file:///…`) open via Hadoop FileSystem
    * with positioned reads (an S3A ranged GET per header read),
    * plain paths stay on `java.io.RandomAccessFile`. Unindexable
    * paths (missing file, unknown container) emit the flagged
    * `indexed = false` row, keeping the pipeline total.
    */
  def sampleVideoFramesByPath(df: DataFrame, idCol: String, pathCol: String,
      stride: Int, maxFrames: Int, keyframesOnly: Boolean = false)(
      implicit spark: SparkSession): Dataset[H264Frame] = {
    import spark.implicits._
    require(stride > 0 && maxFrames > 0, "stride and maxFrames must be positive")
    val confBc = graft.io.PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (id, path) =>
          val indexed =
            try {
              val r = graft.io.PathIO.openRange(path, conf)
              try Mp4Index.frameIndexSeekable(r)
                .orElse(MkvIndex.frameIndexSeekable(r))
                .orElse(DkifIndex.frameIndexSeekable(r))
              finally r.close()
            } catch { case scala.util.control.NonFatal(_) => None }
          indexed match {
            case Some(spans) =>
              val pool = if (keyframesOnly) spans.filter(_.isIdr) else spans
              (0 until pool.size by stride).take(maxFrames).iterator.map { i =>
                val s = pool(i)
                H264Frame(id, s.frameIdx, s.byteStart, s.byteLen, s.isIdr,
                  indexed = true)
              }
            case None =>
              Iterator.single(
                H264Frame(id, -1, 0L, 0L, is_idr = false, indexed = false))
          }
        }
      }
  }

  /** Path-columned Ogg page sampling for >2 GiB audio captures: the
    * audio twin of [[sampleVideoFramesByPath]], through
    * [[OggIndex.pageIndexSeekable]] — headers + lacing by seek;
    * `validateCrc` additionally reads each page (bounded ≤65 KB
    * chunks, never the stream whole) because Ogg's CRC covers
    * payload. Unindexable paths emit the flagged row.
    */
  def sampleOggPagesByPath(df: DataFrame, idCol: String, pathCol: String,
      stride: Int, maxPages: Int, validateCrc: Boolean = true)(
      implicit spark: SparkSession): Dataset[OggPageRow] = {
    import spark.implicits._
    require(stride > 0 && maxPages > 0, "stride and maxPages must be positive")
    val confBc = graft.io.PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (id, path) =>
          val indexed =
            try {
              val r = graft.io.PathIO.openRange(path, conf)
              try OggIndex.pageIndexSeekable(r, validateCrc)
              finally r.close()
            } catch { case scala.util.control.NonFatal(_) => None }
          indexed match {
            case Some(pages) =>
              (0 until pages.size by stride).take(maxPages).iterator.map { i =>
                val p = pages(i)
                OggPageRow(id, p.pageIdx, p.byteStart, p.byteLen,
                  p.granule, p.packetsCompleted, p.isBos, p.isEos,
                  indexed = true)
              }
            case None =>
              Iterator.single(OggPageRow(id, -1, 0L, 0L, 0L, 0,
                is_bos = false, is_eos = false, indexed = false))
          }
        }
      }
  }

  /** Path-columned MPEG-TS PES-unit sampling for >2 GiB broadcast/
    * HLS captures, through [[MpegTs.unitIndexSeekable]] — the walk
    * reads every packet (TS has no out-of-line payload) but holds
    * only one bounded chunk at a time, so a 50 GB capture indexes in
    * constant memory. Unindexable paths emit the flagged row.
    */
  def sampleTsUnitsByPath(df: DataFrame, idCol: String, pathCol: String,
      stride: Int, maxUnits: Int)(
      implicit spark: SparkSession): Dataset[TsUnitRow] = {
    import spark.implicits._
    require(stride > 0 && maxUnits > 0, "stride and maxUnits must be positive")
    val confBc = graft.io.PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (id, path) =>
          val indexed =
            try {
              val r = graft.io.PathIO.openRange(path, conf)
              try MpegTs.unitIndexSeekable(r)
              finally r.close()
            } catch { case scala.util.control.NonFatal(_) => None }
          indexed match {
            case Some(units) =>
              (0 until units.size by stride).take(maxUnits).iterator.map { i =>
                val u = units(i)
                TsUnitRow(id, u.unitIdx, u.byteStart, u.byteLen, u.pid,
                  u.streamType, u.nPackets, u.ptsTicks, u.isRandomAccess,
                  u.isVideo, indexed = true)
              }
            case None =>
              Iterator.single(TsUnitRow(id, -1, 0L, 0L, 0, 0, 0, -1L,
                is_random_access = false, is_video = false,
                indexed = false))
          }
        }
      }
  }

  /** One asset's codec configuration: container + stsd/CodecID codec
    * name, the config-record kind (`avcC`/`hvcC`/`av1C`/`vpcC`, or
    * "none" when the codec keeps config in-band — VP8/VP9-in-WebM,
    * mp4v), the record's parsed profile/level/bit-depth, and its byte
    * span. Anomalies stay VISIBLE without conflating the asset with
    * junk: a present-but-MALFORMED record keeps `indexed = true` with
    * −1 fields and the span reported; a codec that REQUIRES a config
    * record but carries none (avc1 with no avcC child, V_AV1 with no
    * CodecPrivate) keeps its declared kind with −1 fields and a −1
    * span — NOT kind "none", which is reserved for codecs that
    * legitimately keep config in-band. `indexed = false` flags assets
    * no container walk accepts. */
  final case class CodecConfigRow(asset_id: Long, container: String,
      codec: String, kind: String, profile: Int, level: Int,
      bit_depth: Int, config_start: Long, config_len: Long,
      indexed: Boolean)

  /** Codec-config ("extradata") extraction over a video corpus: the
    * selected video track's config record from MP4 sample entries
    * (avcC/hvcC/av1C/vpcC — [[Mp4Index.videoCodecInfo]], which works
    * on fragmented/CMAF init segments too since stsd rides moov) or
    * from the Matroska CodecPrivate ([[MkvIndex.videoTrack]] +
    * [[CodecConfigs.kindForMkvCodec]] — AV1-in-Matroska carries the
    * av1C record verbatim), parsed to profile/level/bit-depth by
    * [[CodecConfigs]]. Pure header walks as mapPartitions — no
    * sample byte is touched, so a 100 TB corpus profiles its codec
    * mix at header I/O cost.
    */
  def videoCodecConfigs(df: DataFrame, idCol: String, bytesCol: String)(
      implicit spark: SparkSession): Dataset[CodecConfigRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          def row(container: String, codec: String, kind: Option[String],
              span: Option[(Int, Int)]): CodecConfigRow =
            (kind, span) match {
              case (Some(k), Some((s, e))) =>
                CodecConfigs.parse(k, bytes, s, e) match {
                  case Some(f) => CodecConfigRow(id, container, codec, k,
                    f.profile, f.level, f.bitDepth, s.toLong,
                    (e - s).toLong, indexed = true)
                  case None => CodecConfigRow(id, container, codec, k,
                    -1, -1, -1, s.toLong, (e - s).toLong, indexed = true)
                }
              case (Some(k), None) =>
                // the codec REQUIRES this record and it is absent —
                // a spec-violating mux; keep the declared kind so a
                // corpus audit counts it as the anomaly it is
                CodecConfigRow(id, container, codec, k,
                  -1, -1, -1, -1L, -1L, indexed = true)
              case (None, _) => CodecConfigRow(id, container, codec,
                "none", -1, -1, -1, -1L, -1L, indexed = true)
            }
          val parsed =
            try {
              Option(bytes).flatMap { b =>
                Mp4Index.videoCodecInfo(b)
                  .map { case (fmt, cfg) =>
                    row("mp4", fmt, Mp4Index.configBoxFor(fmt), cfg)
                  }
                  .orElse(MkvIndex.videoTrack(b).map { vt =>
                    // OPTIONAL CodecPrivate (VP9): absence is the
                    // normal in-band shape → kind "none", not the
                    // required-record-absent anomaly
                    val kind = CodecConfigs.kindForMkvCodec(vt.codecId)
                      .filter(_ => vt.codecPrivate.isDefined ||
                        CodecConfigs.mkvPrivateRequired(vt.codecId))
                    row("mkv", vt.codecId, kind, vt.codecPrivate)
                  })
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          parsed.getOrElse(CodecConfigRow(id, "", "", "", -1, -1, -1,
            -1L, -1L, indexed = false))
        }
      }
  }

  /** One Matroska audio TrackEntry: declared channels / sample rate /
    * bit depth (−1 undeclared), the CodecPrivate's sniffed kind
    * ("opus"/"vorbis"/"unknown" by magic, "none" when absent) and
    * length, and the Segment duration in seconds (−1 when the mux
    * declares none). `indexed = false` flags non-Matroska assets; a
    * valid video-only file emits no rows. */
  final case class MkvAudioRow(asset_id: Long, track_idx: Int,
      codec: String, channels: Int, sample_rate_hz: Double,
      bit_depth: Int, private_kind: String, private_len: Long,
      duration_s: Double, indexed: Boolean)

  /** Header-only audio profiling for Matroska/WebM corpora
    * ([[MkvIndex.audioTracks]]): the TrackEntry's `Audio` element +
    * CodecPrivate magic + `Info/Duration` give codec, channels,
    * sample rate, bit depth and duration without touching a Cluster
    * byte — the audio twin of [[extractVideoInfo]], completing the
    * MP4/FLAC/Ogg/WAV audio-profile family for the one container it
    * lacked. */
  def extractMkvAudioTracks(df: DataFrame, idCol: String, bytesCol: String)(
      implicit spark: SparkSession): Dataset[MkvAudioRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val parsed =
            try Option(bytes).flatMap(b =>
              MkvIndex.audioTracks(b).map { ts =>
                val dur = MkvIndex.segmentDuration(b).getOrElse(-1.0)
                (ts, dur, b)
              })
            catch { case scala.util.control.NonFatal(_) => None }
          parsed match {
            case Some((ts, dur, b)) => ts.iterator.zipWithIndex.map {
              case (t, i) =>
                val (kind, len) = t.codecPrivate match {
                  case Some((s, e)) =>
                    (MkvIndex.audioPrivateKind(b, s, e), (e - s).toLong)
                  case None => ("none", -1L)
                }
                MkvAudioRow(id, i, t.codecId, t.channels, t.sampleRateHz,
                  t.bitDepth, kind, len, dur, indexed = true)
            }
            case None => Iterator.single(MkvAudioRow(id, -1, "", -1,
              -1.0, -1, "", -1L, -1.0, indexed = false))
          }
        }
      }
  }

  /** One ISO-BMFF audio asset's codec configuration: the stsd entry's
    * declared rate/channels PLUS the config record's own declaration
    * (esds → AudioSpecificConfig for AAC, dOps for Opus-in-MP4) —
    * reported separately so a mismatch between the container entry
    * and the codec extradata (a real-world mux bug) is visible.
    * Postures mirror [[CodecConfigRow]]: malformed record → declared
    * kind, −1 config fields, span length reported; required record
    * absent (mp4a without esds) → declared kind, −1 everywhere;
    * `indexed = false` for non-ISO-BMFF bytes. */
  final case class AudioConfigRow(asset_id: Long, codec: String,
      kind: String, entry_rate_hz: Int, entry_channels: Int,
      object_type: Int, config_rate_hz: Int, config_channels: Int,
      config_len: Long, indexed: Boolean)

  /** Audio codec-config extraction over an ISO-BMFF corpus
    * ([[Mp4Index.audioCodecInfo]] + [[CodecConfigs.parseAudio]]) —
    * the audio twin of [[videoCodecConfigs]], completing the
    * extradata family: avcC/hvcC/av1C/vpcC (video), esds/dOps (MP4
    * audio), OpusHead/Vorbis CodecPrivate (Matroska audio, via
    * [[extractMkvAudioTracks]]). Header-only mapPartitions. */
  def audioCodecConfigs(df: DataFrame, idCol: String, bytesCol: String)(
      implicit spark: SparkSession): Dataset[AudioConfigRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val parsed =
            try Option(bytes).flatMap(Mp4Index.audioCodecInfo)
            catch { case scala.util.control.NonFatal(_) => None }
          parsed match {
            case Some((fmt, rate, channels, cfg)) =>
              val kind = Mp4Index.audioConfigBoxFor(fmt)
              (kind, cfg) match {
                case (Some(k), Some((s, e))) =>
                  CodecConfigs.parseAudio(k, bytes, s, e) match {
                    case Some(a) => AudioConfigRow(id, fmt, k, rate,
                      channels, a.objectType, a.sampleRateHz,
                      a.channels, (e - s).toLong, indexed = true)
                    case None => AudioConfigRow(id, fmt, k, rate,
                      channels, -1, -1, -1, (e - s).toLong,
                      indexed = true)
                  }
                case (Some(k), None) =>
                  AudioConfigRow(id, fmt, k, rate, channels,
                    -1, -1, -1, -1L, indexed = true)
                case (None, _) =>
                  AudioConfigRow(id, fmt, "none", rate, channels,
                    -1, -1, -1, -1L, indexed = true)
              }
            case None => AudioConfigRow(id, "", "", -1, -1, -1, -1, -1,
              -1L, indexed = false)
          }
        }
      }
  }

  /** [[extractMkvAudioTracks]] for PATH-addressed (>2 GiB /
    * distributed-FS) corpora: EBML headers + the Tracks/Info
    * payloads only ([[MkvIndex.segmentMetaSeekable]] through
    * [[graft.io.PathIO]]) — the audio profile of a movie-length
    * Matroska file costs kilobytes. Same row semantics as the
    * byte-column operator (one shared seekable-family caveat, as in
    * [[MkvIndex.frameIndexSeekable]]: a top-level element BETWEEN the
    * EBML header and Segment — legal but vanishingly rare — refuses
    * on the seekable route). */
  def extractMkvAudioTracksByPath(df: DataFrame, idCol: String,
      pathCol: String)(
      implicit spark: SparkSession): Dataset[MkvAudioRow] = {
    import spark.implicits._
    val confBc = graft.io.PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (id, path) =>
          val parsed =
            try {
              val r = graft.io.PathIO.openRange(path, conf)
              try MkvIndex.segmentMetaSeekable(r).flatMap { meta =>
                val tracks = meta.tracks.map { tb =>
                  MkvIndex.audioTracksInTracks(tb, 0, tb.length)
                    .map(_.map((_, tb)))
                }
                // any corrupt Tracks payload refuses the asset
                if (tracks.exists(_.isEmpty)) None
                else Some((tracks.flatMap(_.get),
                  meta.durationS.getOrElse(-1.0)))
              } finally r.close()
            } catch { case scala.util.control.NonFatal(_) => None }
          parsed match {
            case Some((ts, dur)) => ts.iterator.zipWithIndex.map {
              case ((t, tb), i) =>
                val (kind, len) = t.codecPrivate match {
                  case Some((s, e)) =>
                    (MkvIndex.audioPrivateKind(tb, s, e), (e - s).toLong)
                  case None => ("none", -1L)
                }
                MkvAudioRow(id, i, t.codecId, t.channels, t.sampleRateHz,
                  t.bitDepth, kind, len, dur, indexed = true)
            }
            case None => Iterator.single(MkvAudioRow(id, -1, "", -1,
              -1.0, -1, "", -1L, -1.0, indexed = false))
          }
        }
      }
  }

  /** [[videoCodecConfigs]] for PATH-addressed (>2 GiB /
    * distributed-FS) corpora: each task opens the file through
    * [[graft.io.PathIO]] and reads ONLY the metadata —
    * [[Mp4Index.videoCodecInfoSeekable]] (box headers + moov) or
    * [[MkvIndex.trackPayloadsSeekable]] (EBML headers + the Tracks
    * payload) — so profiling the codec mix of a movie-length corpus
    * costs kilobytes per asset. Record bytes come back detached from
    * the header fetch, so `config_start` is −1 here (`config_len`
    * still reports the record size); all other row semantics match
    * the byte-column operator, including the required-record-absent
    * and malformed-record postures. */
  def videoCodecConfigsByPath(df: DataFrame, idCol: String,
      pathCol: String)(
      implicit spark: SparkSession): Dataset[CodecConfigRow] = {
    import spark.implicits._
    val confBc = graft.io.PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.map { case (id, path) =>
          def row(container: String, codec: String, kind: Option[String],
              rec: Option[Array[Byte]]): CodecConfigRow =
            (kind, rec) match {
              case (Some(k), Some(bs)) =>
                CodecConfigs.parse(k, bs, 0, bs.length) match {
                  case Some(f) => CodecConfigRow(id, container, codec, k,
                    f.profile, f.level, f.bitDepth, -1L, bs.length.toLong,
                    indexed = true)
                  case None => CodecConfigRow(id, container, codec, k,
                    -1, -1, -1, -1L, bs.length.toLong, indexed = true)
                }
              case (Some(k), None) =>
                CodecConfigRow(id, container, codec, k,
                  -1, -1, -1, -1L, -1L, indexed = true)
              case (None, _) => CodecConfigRow(id, container, codec,
                "none", -1, -1, -1, -1L, -1L, indexed = true)
            }
          val parsed =
            try {
              val r = graft.io.PathIO.openRange(path, conf)
              try videoCodecFactsSeekable(r).map {
                case (cont, codec, kind, rec) => row(cont, codec, kind, rec)
              } finally r.close()
            } catch { case scala.util.control.NonFatal(_) => None }
          parsed.getOrElse(CodecConfigRow(id, "", "", "", -1, -1, -1,
            -1L, -1L, indexed = false))
        }
      }
  }

  /** Container + video-codec + config-record facts of one seekable
    * asset — (container, codec, recordKind, recordBytes), read from
    * metadata alone: the ISO-BMFF stsd walk or the Matroska Tracks
    * payload. The ONE kernel behind [[videoCodecConfigsByPath]] and
    * [[graft.streaming.StreamMedia]] (no twin drift between the
    * batch and streaming seams). None when neither container walk
    * accepts the bytes. */
  private[graft] def videoCodecFactsSeekable(r: Mp4Index.RangeReader)
      : Option[(String, String, Option[String], Option[Array[Byte]])] =
    Mp4Index.videoCodecInfoSeekable(r)
      .map { case (fmt, rec) =>
        ("mp4", fmt, Mp4Index.configBoxFor(fmt), rec)
      }
      .orElse {
        MkvIndex.trackPayloadsSeekable(r).flatMap { tbs =>
          tbs.iterator.flatMap(tb =>
            MkvIndex.videoTrackInTracks(tb, 0, tb.length)
              .map((_, tb))).nextOption()
        }.map { case (vt, tb) =>
          val kind = CodecConfigs.kindForMkvCodec(vt.codecId)
            .filter(_ => vt.codecPrivate.isDefined ||
              CodecConfigs.mkvPrivateRequired(vt.codecId))
          ("mkv", vt.codecId, kind,
            vt.codecPrivate.map { case (s, e) =>
              java.util.Arrays.copyOfRange(tb, s, e)
            })
        }
      }

  /** One extracted subtitle cue; `extracted = false` flags
    * non-Matroska assets. A valid file without a subtitle track
    * emits no rows. */
  final case class MkvSubtitleRow(asset_id: Long, cue_idx: Int,
      start_ms: Double, dur_ms: Double, text: String, n_chars: Int,
      extracted: Boolean)

  /** Subtitle-cue extraction over a Matroska corpus
    * ([[MkvIndex.subtitleCues]]): start/duration converted to
    * milliseconds via the segment's TimestampScale, cue text decoded
    * UTF-8 (the S_TEXT payload contract) — subtitles are a real
    * training-text source (the [[graft.text.Subtitles]] SRT/VTT
    * family's in-container sibling), and the rows feed the text
    * quality/dedup/langid operators directly. `dur_ms` is −1 for
    * SimpleBlock carriage (no BlockDuration). S_TEXT/ASS and
    * S_TEXT/SSA payloads pass [[MkvIndex.assDialogueText]] — the 8
    * dialogue metadata fields are stripped and `\N`/`\n`/`\h`
    * escapes decoded, so the `text` column carries the cue TEXT for
    * every S_TEXT flavor, not the raw ASS field tuple. */
  def extractMkvSubtitles(df: DataFrame, idCol: String, bytesCol: String)(
      implicit spark: SparkSession): Dataset[MkvSubtitleRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val parsed =
            try Option(bytes).flatMap(MkvIndex.subtitleCues)
            catch { case scala.util.control.NonFatal(_) => None }
          parsed match {
            case Some((scale, codec, cues)) =>
              val isAss = codec.startsWith("S_TEXT/ASS") ||
                codec.startsWith("S_TEXT/SSA")
              cues.iterator.zipWithIndex.map {
              case (c, i) =>
                val payload = new String(bytes, c.byteStart, c.byteLen,
                  java.nio.charset.StandardCharsets.UTF_8)
                val text =
                  if (isAss) MkvIndex.assDialogueText(payload)
                  else payload
                // Double math THROUGHOUT: Long ticks × a hostile
                // declared scale would wrap before the division
                MkvSubtitleRow(id, i,
                  c.startTicks.toDouble * scale / 1e6,
                  if (c.durTicks < 0) -1.0
                  else c.durTicks.toDouble * scale / 1e6,
                  text, text.length, extracted = true)
            }
            case None => Iterator.single(MkvSubtitleRow(id, -1, -1.0,
              -1.0, "", 0, extracted = false))
          }
        }
      }
  }

  /** One Matroska attachment row; `indexed = false` flags
    * non-Matroska assets (and ill-formed attachment lists — the
    * walk's no-half-parse rule). A valid file without attachments
    * emits no rows. `img_format`/`width`/`height` are decoded from
    * the FIRST 64 KiB of image-MIME attachments' data ([[ImageDims]] —
    * dimensions ride container headers); "" / −1 for non-images and
    * undecodable data. */
  final case class MkvAttachmentRow(asset_id: Long, att_idx: Int,
      file_name: String, mime_type: String, file_uid: Long,
      data_start: Long, data_len: Long, img_format: String,
      width: Int, height: Int, indexed: Boolean)

  /** How many leading FileData bytes the attachment walks hand to
    * [[ImageDims]] — both seams use the SAME bounded prefix so a
    * byte-column and a path-column walk of one file can never
    * disagree on dims. */
  private val AttachmentDimsProbe = 1 << 16

  private def attachmentRows(id: Long,
      atts: Option[Seq[MkvIndex.Attachment]],
      slice: (Long, Int) => Array[Byte]): Iterator[MkvAttachmentRow] =
    atts match {
      case Some(as) => as.iterator.zipWithIndex.map { case (a, i) =>
        val dims =
          if (a.mimeType.startsWith("image/") && a.dataLen > 0)
            try ImageDims.dims(slice(a.dataStart,
              math.min(a.dataLen, AttachmentDimsProbe.toLong).toInt))
            catch { case scala.util.control.NonFatal(_) => None }
          else None
        MkvAttachmentRow(id, i, a.fileName, a.mimeType, a.fileUid,
          a.dataStart, a.dataLen, dims.map(_.format).getOrElse(""),
          dims.map(_.width).getOrElse(-1),
          dims.map(_.height).getOrElse(-1), indexed = true)
      }
      case None => Iterator.single(MkvAttachmentRow(id, -1, "", "",
        -1L, -1L, -1L, "", -1, -1, indexed = false))
    }

  /** Matroska attachment extraction over a byte-column corpus
    * ([[MkvIndex.attachments]]): cover art, fonts, companion files
    * as (name, mime, uid, data span) rows, image attachments' pixel
    * dimensions decoded from the data HEAD — the span is the fetch
    * range ([[graft.io.SpanFetch]]) if the bytes are wanted later.
    * mapPartitions, flagged fallback, the container-family batch
    * shape. */
  def extractMkvAttachments(df: DataFrame, idCol: String,
      bytesCol: String)(
      implicit spark: SparkSession): Dataset[MkvAttachmentRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val parsed =
            try Option(bytes).flatMap(MkvIndex.attachments)
            catch { case scala.util.control.NonFatal(_) => None }
          attachmentRows(id, parsed, (at, n) =>
            java.util.Arrays.copyOfRange(bytes, at.toInt, at.toInt + n))
        }
      }
  }

  /** [[extractMkvAttachments]] for PATH-addressed (>2 GiB /
    * distributed-FS) corpora: the seekable walk reads element
    * headers + name/mime payloads only; image dims cost one bounded
    * 64 KiB ranged read per image attachment. Unreadable/ill-formed
    * paths emit the flagged row. */
  def extractMkvAttachmentsByPath(df: DataFrame, idCol: String,
      pathCol: String)(
      implicit spark: SparkSession): Dataset[MkvAttachmentRow] = {
    import spark.implicits._
    val confBc = graft.io.PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (id, path) =>
          val rows =
            try {
              val r = graft.io.PathIO.openRange(path, conf)
              try {
                val parsed = MkvIndex.attachmentsSeekable(r)
                // rows materialize INSIDE the reader's lifetime —
                // the dim probes read through `r`
                attachmentRows(id, parsed,
                  (at, n) => r.readFully(at, n)).toVector
              } finally r.close()
            } catch {
              case scala.util.control.NonFatal(_) =>
                attachmentRows(id, None, (_, _) =>
                  Array.empty[Byte]).toVector
            }
          rows
        }
      }
  }

  /** One Matroska chapter row; `indexed = false` flags non-Matroska
    * assets and ill-formed chapter trees (missing mandatory
    * UID/start — the walk's no-half-parse rule). A valid file
    * without chapters emits no rows. Times are NANOSECONDS
    * (`end_ns = -1` when the chapter declares no end); `chapter_idx`
    * numbers rows in document order (parents before children,
    * `nest_level` marking depth). */
  final case class MkvChapterRow(asset_id: Long, edition_idx: Int,
      chapter_idx: Int, chapter_uid: Long, start_ns: Long, end_ns: Long,
      title: String, language: String, nest_level: Int, indexed: Boolean)

  private def chapterRows(id: Long,
      chs: Option[Seq[MkvIndex.Chapter]]): Iterator[MkvChapterRow] =
    chs match {
      case Some(cs) => cs.iterator.zipWithIndex.map { case (c, i) =>
        MkvChapterRow(id, c.editionIdx, i, c.chapterUid, c.startNs,
          c.endNs, c.title, c.language, c.nestLevel, indexed = true)
      }
      case None => Iterator.single(MkvChapterRow(id, -1, -1, -1L, -1L,
        -1L, "", "", -1, indexed = false))
    }

  /** Matroska chapter extraction over a byte-column corpus
    * ([[MkvIndex.chapters]]): edition/atom navigation marks as
    * (uid, start/end ns, title, language, nesting) rows — the last
    * Matroska payload kind beside tracks, attachments and subtitle
    * cues. mapPartitions, flagged fallback. */
  def extractMkvChapters(df: DataFrame, idCol: String, bytesCol: String)(
      implicit spark: SparkSession): Dataset[MkvChapterRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val parsed =
          try Option(bytes).flatMap(MkvIndex.chapters)
          catch { case scala.util.control.NonFatal(_) => None }
        chapterRows(id, parsed)
      })
  }

  /** [[extractMkvChapters]] for PATH-addressed (>2 GiB /
    * distributed-FS) corpora: header + scalar-payload reads only.
    * Unreadable/ill-formed paths emit the flagged row. */
  def extractMkvChaptersByPath(df: DataFrame, idCol: String,
      pathCol: String)(
      implicit spark: SparkSession): Dataset[MkvChapterRow] = {
    import spark.implicits._
    val confBc = graft.io.PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (id, path) =>
          val parsed =
            try {
              val r = graft.io.PathIO.openRange(path, conf)
              try MkvIndex.chaptersSeekable(r) finally r.close()
            } catch { case scala.util.control.NonFatal(_) => None }
          chapterRows(id, parsed)
        }
      }
  }

  /** One Matroska tag row; `indexed = false` flags non-Matroska
    * assets and ill-formed tag trees (missing mandatory TagName). A
    * valid file without tags emits no rows. `target_type` 50 and
    * `track_uid` 0 are the spec defaults (whole movie / applies to
    * everything); `binary = true` marks TagBinary payloads (value
    * empty). */
  final case class MkvTagRow(asset_id: Long, tag_idx: Int, row_idx: Int,
      target_type: Long, track_uid: Long, name: String, value: String,
      language: String, binary: Boolean, nest_level: Int,
      indexed: Boolean)

  private def mkvTagRows(id: Long,
      ts: Option[Seq[MkvIndex.MkvTag]]): Iterator[MkvTagRow] =
    ts match {
      case Some(xs) => xs.iterator.zipWithIndex.map { case (t, i) =>
        MkvTagRow(id, t.tagIdx, i, t.targetTypeValue, t.trackUid,
          t.name, t.value, t.language, t.binary, t.nestLevel,
          indexed = true)
      }
      case None => Iterator.single(MkvTagRow(id, -1, -1, -1L, -1L, "",
        "", "", binary = false, -1, indexed = false))
    }

  /** Matroska tag extraction over a byte-column corpus
    * ([[MkvIndex.mkvTags]]): TITLE/ARTIST/… SimpleTags with their
    * targeting — the Matroska sibling of [[extractMediaTags]]'s
    * ID3/Vorbis/FLAC families. mapPartitions, flagged fallback. */
  def extractMkvTags(df: DataFrame, idCol: String, bytesCol: String)(
      implicit spark: SparkSession): Dataset[MkvTagRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val parsed =
          try Option(bytes).flatMap(MkvIndex.mkvTags)
          catch { case scala.util.control.NonFatal(_) => None }
        mkvTagRows(id, parsed)
      })
  }

  /** [[extractMkvTags]] for PATH-addressed corpora: header + scalar
    * payload reads only. Unreadable/ill-formed paths emit the
    * flagged row. */
  def extractMkvTagsByPath(df: DataFrame, idCol: String,
      pathCol: String)(
      implicit spark: SparkSession): Dataset[MkvTagRow] = {
    import spark.implicits._
    val confBc = graft.io.PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (id, path) =>
          val parsed =
            try {
              val r = graft.io.PathIO.openRange(path, conf)
              try MkvIndex.mkvTagsSeekable(r) finally r.close()
            } catch { case scala.util.control.NonFatal(_) => None }
          mkvTagRows(id, parsed)
        }
      }
  }

  /** One MP4 ilst tag row; `indexed = false` flags non-ISO-BMFF
    * assets and ill-formed tag lists (an item without a `data` atom).
    * A valid file without `udta/meta/ilst` emits no rows. */
  final case class Mp4TagRow(asset_id: Long, item_idx: Int, name: String,
      data_type: Int, value: String, binary: Boolean, indexed: Boolean)

  /** MP4/M4A metadata extraction over a byte-column corpus
    * ([[Mp4Index.ilstTags]]): the iTunes-style `ilst` carriage —
    * closing the tag families beside ID3/Vorbis/FLAC
    * ([[extractMediaTags]]) and Matroska ([[extractMkvTags]]).
    * mapPartitions, flagged fallback. */
  def extractMp4Tags(df: DataFrame, idCol: String, bytesCol: String)(
      implicit spark: SparkSession): Dataset[Mp4TagRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val parsed =
          try Option(bytes).flatMap(Mp4Index.ilstTags)
          catch { case scala.util.control.NonFatal(_) => None }
        parsed match {
          case Some(ts) => ts.iterator.map(t => Mp4TagRow(id, t.itemIdx,
            t.name, t.dataType, t.value, t.binary, indexed = true))
          case None => Iterator.single(Mp4TagRow(id, -1, "", -1, "",
            binary = false, indexed = false))
        }
      })
  }

  /** [[extractMp4Tags]] for PATH-addressed (>2 GiB / distributed-FS)
    * corpora: top-level headers by seek + one bounded moov fetch
    * ([[Mp4Index.ilstTagsSeekable]]) — mdat never read. Unreadable/
    * ill-formed paths emit the flagged row. */
  def extractMp4TagsByPath(df: DataFrame, idCol: String,
      pathCol: String)(
      implicit spark: SparkSession): Dataset[Mp4TagRow] = {
    import spark.implicits._
    val confBc = graft.io.PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (id, path) =>
          val parsed =
            try {
              val r = graft.io.PathIO.openRange(path, conf)
              try Mp4Index.ilstTagsSeekable(r) finally r.close()
            } catch { case scala.util.control.NonFatal(_) => None }
          parsed match {
            case Some(ts) => ts.iterator.map(t => Mp4TagRow(id,
              t.itemIdx, t.name, t.dataType, t.value, t.binary,
              indexed = true))
            case None => Iterator.single(Mp4TagRow(id, -1, "", -1, "",
              binary = false, indexed = false))
          }
        }
      }
  }

  /** Header-only video facts: frame/keyframe counts from the sample
    * table and the mvhd duration; `duration_s` is −1 when the moov
    * declares none (header-less synthetic muxes). `indexed = false`
    * flags assets no container walk accepts. */
  final case class VideoInfoRow(asset_id: Long, n_frames: Int,
      n_sync: Int, duration_s: Double, indexed: Boolean)

  /** Header-only video profiling for ISO-BMFF assets: the video twin
    * of the audio-profile arithmetic — frame + keyframe counts from
    * the stbl/moof walk and duration from `mvhd` (timescale ÷
    * duration, [[Mp4Index.movieDuration]]), no sample byte touched.
    */
  def extractVideoInfo(assets: Dataset[MediaAsset])(
      implicit spark: SparkSession): Dataset[VideoInfoRow] = {
    import spark.implicits._
    assets.filter(col("kind") === "video").mapPartitions { it =>
      it.map { a =>
        val frames =
          try Mp4Index.frameIndex(a.content)
          catch { case scala.util.control.NonFatal(_) => None }
        frames match {
          case Some(fs) =>
            val dur =
              try Mp4Index.movieDuration(a.content)
                .map { case (ts, d) => d.toDouble / ts }.getOrElse(-1.0)
              catch { case scala.util.control.NonFatal(_) => -1.0 }
            VideoInfoRow(a.asset_id, fs.length, fs.count(_.isIdr), dur,
              indexed = true)
          case None =>
            VideoInfoRow(a.asset_id, 0, 0, -1.0, indexed = false)
        }
      }
    }
  }

  /** A video clip's majority-bit perceptual signature over sampled
    * frame aHashes; `decoded = false` marks clips whose container was
    * rejected or produced no decodable sampled frame. */
  final case class VideoHash(
      asset_id: Long,
      vhash: Long,
      n_frames_hashed: Int,
      decoded: Boolean)

  /** Clip-level perceptual fingerprint: aHash each `stride`-th sampled
    * frame ([[imageAHash64]]) and take the per-bit MAJORITY across
    * frames — stable under a minority of edited/outlier frames, which
    * is exactly the near-dup-video contract (re-encodes, inserted
    * title cards). Completes the 64-bit fingerprint family — text
    * SimHash, image aHash, audio energy envelope, video frame-majority
    * — all served by the one
    * [[graft.dedup.Dedup.signatureNearDupPairs]] Hamming band engine.
    * Undecodable containers fall back to a deterministic stub hash,
    * flagged.
    */
  def extractVideoHashes(assets: Dataset[MediaAsset], stride: Int = 2,
      maxFrames: Int = 16)(implicit spark: SparkSession): Dataset[VideoHash] = {
    import spark.implicits._
    require(stride > 0 && maxFrames > 0, "stride and maxFrames must be positive")
    assets.filter(col("kind") === "video").mapPartitions { it =>
      it.map { a =>
        val frameHashes: Seq[Long] = AviMjpeg.frameChunks(a.content) match {
          case Some(chunks) =>
            (0 until chunks.size by stride).take(maxFrames)
              .flatMap(i => AviMjpeg.decodeFrame(a.content, chunks(i))
                .map(imageAHash64))
          case None => Seq.empty
        }
        if (frameHashes.isEmpty)
          VideoHash(a.asset_id,
            java.util.Arrays.hashCode(a.content).toLong, 0, decoded = false)
        else {
          val n = frameHashes.size
          var vhash = 0L
          var k = 0
          while (k < 64) {
            var cnt = 0
            frameHashes.foreach(h => if (((h >> k) & 1L) == 1L) cnt += 1)
            if (2 * cnt > n) vhash |= (1L << k)
            k += 1
          }
          VideoHash(a.asset_id, vhash, n, decoded = true)
        }
      }
    }
  }

  /** Byte-size-aware repartition: target ~`targetBytesPerPartition`
    * per task using the total binary volume — avoids straggler tasks
    * from size-skewed media (row-count partitioning is wrong for
    * blobs).
    */
  def repartitionForMedia(assets: Dataset[MediaAsset],
      targetBytesPerPartition: Long = 128L * 1024 * 1024): Dataset[MediaAsset] = {
    val totalBytes = assets.agg(sum("content_length")).head().getLong(0)
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    assets.repartition(parts, col("asset_id"))
  }
}

