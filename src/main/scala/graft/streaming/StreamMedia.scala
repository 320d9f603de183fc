package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.PathIO
import graft.multimodal.{CodecConfigs, MkvIndex, Mp4Index, Multimodal, OggIndex}

/** Media arrival as a stream: a drop directory of mp4/mkv/webm/ogg
  * files (a capture rig, a transcode farm's output, a video-corpus
  * crawl) profiles incrementally — the [[StreamWarc]]/[[StreamShards]]
  * posture for the multimodal side of the front door.
  *
  * The file source tracks seen files in its checkpoint (exactly-once
  * per drop across restarts) and ships only `path` + mtime; each task
  * opens its file ONCE through [[PathIO]] (Hadoop-FS routed — an
  * `s3a://` drop dir reads kilobytes per multi-GB asset) and walks
  * headers only: the ISO-BMFF sample table or Matroska clusters for
  * frame/keyframe counts, the stsd / Tracks payload for the codec and
  * its config record ([[Multimodal.videoCodecFactsSeekable]] — the
  * SAME kernel as the batch operator, no twin drift), Ogg page
  * headers for page counts. Corrupt/truncated drops emit the flagged
  * row instead of killing the query.
  *
  * What this enables downstream: codec-mix dashboards as captures
  * land, keyframe-density gates before a decode farm wastes GPU time
  * on a broken mux, and the profile rows join the shard/frame fetch
  * seams ([[graft.io.SpanFetch]]) without re-opening anything at
  * corpus scale.
  */
object StreamMedia {

  /** One streamed media profile: container + video codec + codec
    * config facts (profile/level/bit depth, −1 where the record is
    * absent or the container carries none) and the header-walk unit
    * counts — frames and keyframes for mp4/mkv, pages for ogg
    * (`n_sync` −1 there; Ogg pages have no keyframe notion).
    * `indexed = false` flags a drop no container walk accepts. */
  final case class StreamedMediaProfile(path: String,
      arrival_ts: java.sql.Timestamp, container: String, codec: String,
      config_kind: String, profile: Int, level: Int, bit_depth: Int,
      n_units: Int, n_sync: Int, indexed: Boolean)

  /** The profile stream over a media drop directory. Suffix-anchored
    * glob for the same reason as [[StreamWarc.pages]]: a
    * write-then-rename temp must never enter the (path-pinning) file
    * registry. */
  def profiles(spark: SparkSession, dropDir: String,
      pathGlob: String = "*.{mp4,mkv,webm,ogg}"): DataFrame = {
    import spark.implicits._
    val confBc = PathIO.confBroadcast(spark)
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream
      .format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", pathGlob)
      .load(dropDir)
      .select(col("path"), col("modificationTime"))
      .as[(String, java.sql.Timestamp)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.map { case (path, mtime) =>
          profileOne(path, mtime, conf)
        }
      }
      .toDF()
  }

  /** The per-file walk: one open reader, header-only reads, total
    * (corrupt bytes → the flagged row, never a task kill). */
  private def profileOne(path: String, mtime: java.sql.Timestamp,
      conf: org.apache.hadoop.conf.Configuration): StreamedMediaProfile =
    try {
      val r = PathIO.openRange(path, conf)
      try {
        Multimodal.videoCodecFactsSeekable(r).map {
          case (container, codec, kind, rec) =>
            val cfg = for {
              k <- kind
              bs <- rec
              f <- CodecConfigs.parse(k, bs, 0, bs.length)
            } yield f
            val frames = (container match {
              case "mp4" => Mp4Index.frameIndexSeekable(r)
              case _ => MkvIndex.frameIndexSeekable(r)
            }).getOrElse(IndexedSeq.empty)
            StreamedMediaProfile(path, mtime, container, codec,
              kind.getOrElse("none"),
              cfg.map(_.profile).getOrElse(-1),
              cfg.map(_.level).getOrElse(-1),
              cfg.map(_.bitDepth).getOrElse(-1),
              frames.size, frames.count(_.isIdr), indexed = true)
        }.orElse {
          OggIndex.pageIndexSeekable(r).map { pages =>
            StreamedMediaProfile(path, mtime, "ogg", "", "none",
              -1, -1, -1, pages.size, -1, indexed = true)
          }
        }.getOrElse(flagged(path, mtime))
      } finally r.close()
    } catch { case scala.util.control.NonFatal(_) => flagged(path, mtime) }

  private def flagged(path: String,
      mtime: java.sql.Timestamp): StreamedMediaProfile =
    StreamedMediaProfile(path, mtime, "", "", "", -1, -1, -1, -1, -1,
      indexed = false)
}
