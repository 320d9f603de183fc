package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{PathIO, Warc}
import graft.pipeline.Curation.CurationConfig
import graft.text.TextAnalysis

/** The crawl front door as a STREAMING pipeline: a WARC drop
  * directory (the shape a running crawler produces — one
  * `.warc`/`.warc.gz` file per fetch batch) ingests incrementally
  * instead of re-walking the world per batch run.
  *
  * Shape: Spark's file stream source discovers NEW archive files
  * (checkpoint-tracked, so each file is processed exactly once across
  * restarts) with the `binaryFile` format pruned to `path` +
  * `modificationTime` — file CONTENTS are never shipped through the
  * source; each task opens its archive via [[Warc.pagesFromPath]]
  * (seek-walk for plain, O(record)-memory stream for `.warc.gz`,
  * Hadoop-FS routing for `s3a://`-style drop dirs) and emits page
  * rows. Downstream, [[curated]] runs the per-row curation stages +
  * watermark-bounded streaming dedup of [[StreamCuration]].
  *
  * 100 TB posture: the source state is one entry per SEEN FILE (tiny
  * — the file registry, not the data); per-task memory is O(record);
  * corrupt archives emit a flagged row instead of killing the query
  * (a crawler WILL eventually drop a truncated file). Mixture
  * sampling/packing still belong to the batch snapshot that closes a
  * corpus ([[graft.pipeline.Curation.curate]]), as in the batch
  * twin.
  */
object StreamWarc {

  /** One streamed page: which archive + record it came from, its
    * arrival time (the file's modification time — the watermark
    * clock), and the extracted text. `extracted = false` flags a
    * path no WARC walk accepts (corrupt/truncated drop). */
  final case class StreamedPage(path: String,
      arrival_ts: java.sql.Timestamp, record_idx: Int,
      target_uri: String, http_status: Int, title: String, text: String,
      n_chars: Int, extracted: Boolean)

  /** The page stream over a drop directory. `pathGlob` keeps
    * non-archive files (crawler logs, manifests) out of the source's
    * file registry; the default is SUFFIX-anchored — a crawler's
    * write-then-rename temp (`a.warc.tmp`) must not be registered as
    * a permanent corrupt drop (the registry pins each seen path
    * forever, so a partial write captured once would flag forever). */
  def pages(spark: SparkSession, dropDir: String,
      pathGlob: String = "*.{warc,warc.gz}",
      maxContentBytes: Long = 1L << 22): DataFrame = {
    import spark.implicits._
    val confBc = PathIO.confBroadcast(spark)
    // the binaryFile source's fixed schema, given explicitly — a
    // streaming source must not infer (the drop dir may be empty at
    // start-up, and inference would race arriving files)
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
      // column pruning reaches the source: content is never read
      .select(col("path"), col("modificationTime"))
      .as[(String, java.sql.Timestamp)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (path, mtime) =>
          Warc.pagesFromPath(path, conf, maxContentBytes) match {
            case Some(ps) => ps.iterator.map { case (r, title, text) =>
              StreamedPage(path, mtime, r.recordIdx, r.targetUri,
                r.httpStatus, title, text, text.length, extracted = true)
            }
            case None => Iterator.single(StreamedPage(path, mtime, -1,
              "", -1, "", "", 0, extracted = false))
          }
        }
      }
      .toDF()
  }

  /** One streamed link — [[graft.io.Warc.WarcLink]] under the
    * streaming identity (archive path + arrival time). */
  final case class StreamedLink(path: String,
      arrival_ts: java.sql.Timestamp, record_idx: Int, url: String,
      link_idx: Int, link_path: String, href: String, resolved: String,
      extracted: Boolean)

  /** The LINK stream over the same drop directory — [[pages]]'s twin
    * for [[graft.io.Warc.extractHtmlLinksByPath]]'s walk: each
    * arriving archive emits its outlink rows once (same checkpointed
    * file registry, same flagged-drop contract), feeding an
    * incrementally-maintained host graph
    * ([[graft.io.CrawlGraph.hostEdges]] per batch, folded into a
    * [[graft.store.MatView]]-style running edge count downstream). */
  def links(spark: SparkSession, dropDir: String,
      pathGlob: String = "*.{warc,warc.gz}",
      maxContentBytes: Long = 1L << 22): DataFrame = {
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
          Warc.linksFromPath(path, conf, maxContentBytes) match {
            case Some(ps) => ps.iterator.flatMap { case (r, ls) =>
              ls.zipWithIndex.map { case ((p, h, res), i) =>
                StreamedLink(path, mtime, r.recordIdx, r.targetUri,
                  i, p, h, res, extracted = true)
              }
            }
            case None => Iterator.single(StreamedLink(path, mtime, -1,
              "", -1, "", "", "", extracted = false))
          }
        }
      }
      .toDF()
  }

  /** Pages → curated docs: language-ID each page, then the
    * [[StreamCuration.curateStream]] stages (redact → quality →
    * watermarked exact dedup → decontaminate). `doc_id` is the
    * 64-bit hash of (archive path, record index) — stable across
    * retries, so the checkpointed sink's exactly-once holds.
    * Flagged (corrupt-archive) rows are ROUTED OUT here — surface
    * them from [[pages]] when monitoring a crawler's drop quality.
    */
  def curated(spark: SparkSession, dropDir: String,
      cfg: CurationConfig = CurationConfig(),
      watermarkDelay: String = "1 hour",
      pathGlob: String = "*.{warc,warc.gz}",
      maxContentBytes: Long = 1L << 22): DataFrame = {
    val docs = pages(spark, dropDir, pathGlob, maxContentBytes)
      .filter(col("extracted") && length(col("text")) > 0)
      .select(
        xxhash64(col("path"), col("record_idx")).as(cfg.idCol),
        TextAnalysis.languageId(col("text")).as(cfg.langCol),
        col("text").as(cfg.textCol),
        col("arrival_ts"))
    StreamCuration.curateStream(docs, cfg, "arrival_ts", watermarkDelay)
  }
}
