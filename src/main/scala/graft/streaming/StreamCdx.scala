package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.WarcCdx

/** CDX index arrival as a stream — the third face of the crawl/shard
  * front door ([[StreamWarc]] streams archives, [[StreamShards]]
  * streams training shards, this streams the INDEXES): a drop
  * directory of CDXJ files (the published Common Crawl index layout —
  * `urlkey timestamp {json}` per line, one file per archive batch)
  * parses incrementally into CDX rows.
  *
  * Proportionality is what makes this the right source shape: a CDX
  * index is KILOBYTES per gigabyte of archive, so the text source can
  * ship the lines themselves (unlike the archive streams, whose
  * sources prune to path+mtime and walk per task) — the archives
  * behind the index NEVER transit the stream. Downstream, a filter on
  * the arrived rows (mime/status/urlkey) plus
  * [[graft.io.WarcCdx.hydrateByCdx]] in `foreachBatch` fetches ONLY
  * the selected records by ranged read — "hydrate the English
  * text/html 200s as their indexes land" without ever reading an
  * archive whole.
  *
  * Exactly-once per index FILE across restarts comes from the file
  * source's checkpoint registry, as in the sibling streams; the
  * suffix-anchored glob keeps write-then-rename temps out of the
  * registry. Unparseable lines keep their `line` with null fields
  * (the [[WarcCdx.parseCdxj]] contract) — corrupt index shards stay
  * visible, never kill the query.
  */
object StreamCdx {

  /** The CDX-row stream over an index drop directory. Columns:
    * `line` (the raw CDXJ line), `index_path` (which index file it
    * arrived in), plus the parsed urlkey/timestamp/url/mime/status/
    * digest/length/offset/filename. */
  def entries(spark: SparkSession, dropDir: String,
      pathGlob: String = "*.cdxj"): DataFrame = {
    val lines = spark.readStream
      .format("text")
      .option("pathGlobFilter", pathGlob)
      .load(dropDir)
      .select(col("value").as("line"),
        input_file_name().as("index_path"))
    WarcCdx.parseCdxj(lines, "line")
  }
}
