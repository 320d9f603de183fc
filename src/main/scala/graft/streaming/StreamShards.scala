package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{PathIO, Tar}

/** Training-shard arrival as a stream: a drop directory of
  * tar/WebDataset shards (the `000123.tar` shape training runs read)
  * indexes incrementally — the [[StreamWarc]] posture for the shard
  * side of the crawl/shard front door.
  *
  * The file source tracks seen shards in its checkpoint (exactly-once
  * per shard across restarts) and ships only `path` + mtime; each
  * task walks its shard's HEADER BLOCKS by seek
  * ([[Tar.entryIndexSeekable]] through [[PathIO]] — Hadoop-FS routed,
  * so an `s3a://` shard store reads kilobytes per 10 GB shard) and
  * emits one row per member with the WebDataset key/ext split.
  * Corrupt/truncated drops emit the flagged row instead of killing
  * the query.
  *
  * What this enables downstream: `groupBy(sample_key)` per
  * micro-batch is the WebDataset sample regrouping; joining member
  * rows against a manifest detects missing/extra modalities as
  * shards land, BEFORE a training run trips on them.
  */
object StreamShards {

  /** One streamed member: which shard + where, the member's data
    * span (read it later by ranged GET), and the WebDataset
    * key/extension split. `indexed = false` flags a shard no tar
    * walk accepts. */
  final case class StreamedMember(path: String,
      arrival_ts: java.sql.Timestamp, entry_idx: Int, name: String,
      sample_key: String, ext: String, typeflag: String,
      data_start: Long, data_len: Long, indexed: Boolean)

  /** The member stream over a shard drop directory. Suffix-anchored
    * glob for the same reason as [[StreamWarc.pages]]: a
    * write-then-rename temp must never enter the (path-pinning) file
    * registry. */
  def members(spark: SparkSession, dropDir: String,
      pathGlob: String = "*.tar"): DataFrame = {
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
        it.flatMap { case (path, mtime) =>
          val indexed =
            try {
              val r = PathIO.openRange(path, conf)
              try Tar.entryIndexSeekable(r) finally r.close()
            } catch { case scala.util.control.NonFatal(_) => None }
          indexed match {
            case Some(es) => es.iterator.map { e =>
              val (key, ext) = Tar.splitKey(e.name)
              StreamedMember(path, mtime, e.entryIdx, e.name, key, ext,
                e.typeflag.toString, e.dataStart, e.dataLen,
                indexed = true)
            }
            case None => Iterator.single(StreamedMember(path, mtime,
              -1, "", "", "", "", -1L, -1L, indexed = false))
          }
        }
      }
      .toDF()
  }

  /** Shard completeness: per (shard, sample_key), the sorted distinct
    * extension set vs the expected one — every sample missing a
    * modality (or carrying extras) surfaces with the arrival it
    * landed in. A sample never spans shards in the WebDataset
    * convention (keys are shard-local by construction), so this is a
    * plain per-shard aggregation with NO cross-batch state — run it
    * inside `foreachBatch` over [[members]] (the spec's shape) or on
    * any batch-read member table; a naked streaming groupBy would
    * need a watermark it has no use for.
    */
  def incompleteSamples(members: DataFrame,
      expectedExts: Seq[String]): DataFrame = {
    val expected = expectedExts.sorted
    members
      .filter(col("indexed") && col("typeflag") === "0" &&
        col("ext") =!= "")
      .groupBy(col("path"), col("sample_key"))
      .agg(sort_array(collect_set(col("ext"))).as("exts"),
        max(col("arrival_ts")).as("arrival_ts"))
      .filter(col("exts") =!= array(expected.map(lit): _*))
  }
}
