package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for a training-data pipeline: media as
  * opaque `binary` columns with typed metadata, processed by
  * partition-mapped batch functions.
  *
  * The Spark-side plumbing — schema, partition sizing, batch-shaped
  * processing, metadata propagation — is real and tested. The actual
  * codec calls are STUBS (`decodeImageStub`): this container has no
  * image/audio libraries, so decode produces a deterministic fake
  * derived from the bytes. Swapping in a real codec changes only the
  * body of the stub, not the pipeline.
  *
  * Scale design: media rows are large (MBs) — `repartitionForMedia`
  * sizes partitions by BYTES not row count, so a 100 TB corpus of
  * mixed-size blobs doesn't produce straggler tasks. Feature extraction
  * is mapPartitions (one iterator pass, no per-row closure overhead) —
  * the Scala analogue of `mapInPandas` batch UDFs.
  */
object Multimodal {

  /** Typed record for a media asset: id + raw bytes + metadata. */
  final case class MediaAsset(
      asset_id: Long,
      kind: String,          // "image" | "audio" | "video"
      uri: String,
      content: Array[Byte],
      content_length: Long)

  /** Decoded-image features (the stub's output schema — the real
    * decoder contract). */
  final case class ImageFeatures(
      asset_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_luma: Double)

  /** Wrap a DataFrame of (id, uri, bytes) into the canonical media
    * schema, deriving kind from the uri suffix and length from the
    * bytes — the multimodal twin of schema inference.
    */
  def toMediaAssets(df: DataFrame, idCol: String, uriCol: String,
      bytesCol: String)(implicit spark: SparkSession): Dataset[MediaAsset] = {
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("asset_id"),
      when(lower(col(uriCol)).rlike("\\.(png|jpe?g|gif|bmp|webp)$"), "image")
        .when(lower(col(uriCol)).rlike("\\.(wav|mp3|flac|ogg)$"), "audio")
        .when(lower(col(uriCol)).rlike("\\.(mp4|avi|mkv|webm)$"), "video")
        .otherwise("unknown").as("kind"),
      col(uriCol).as("uri"),
      col(bytesCol).as("content"),
      length(col(bytesCol)).cast("long").as("content_length"))
      .as[MediaAsset]
  }

  /** STUB decoder: deterministic fake features from the byte content.
    * A real implementation calls an image codec here (???-equivalent:
    * the only line that changes). Everything around it — batch
    * iteration, schema, partitioning — is production-shaped.
    */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    // ??? real codec goes here; fake derives stable pseudo-dimensions
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
    * init per partition, not per row).
    */
  def extractImageFeatures(assets: Dataset[MediaAsset])(
      implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    assets.filter(col("kind") === "image").mapPartitions { it =>
      // per-partition decoder init would go here (amortized)
      it.map { a =>
        val (w, h, c, luma) = decodeImageStub(a.content)
        ImageFeatures(a.asset_id, w, h, c, luma)
      }
    }
  }

  /** Frame sampling plumbing for video: emit every `stride`-th frame
    * index up to `maxFrames` as (asset_id, frame_idx) — the real
    * decoder fills frame bytes; the fan-out/explode shape is what
    * matters for the pipeline.
    */
  def sampleFrameIndexes(assets: Dataset[MediaAsset], stride: Int,
      maxFrames: Int): DataFrame =
    assets.filter(col("kind") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0), lit((maxFrames - 1) * stride), lit(stride)))
          .as("frame_idx"))

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
