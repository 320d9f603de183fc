package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import graft.multimodal.Mp4Index

/** The ranged-GET consumer for every byte span the container walkers
  * emit: frame spans ([[graft.multimodal.Multimodal.sampleVideoFramesByPath]]),
  * tar/WebDataset member spans ([[Tar.extractEntriesByPath]],
  * [[graft.streaming.StreamShards]]), WARC record/body spans — all of
  * them address `(path, byte_start, byte_len)` precisely so the BYTES
  * can be fetched later, selectively, at ranged-read cost. This
  * operator is that fetch: open via [[PathIO]] (positioned reads —
  * pread on HDFS, ranged GET on S3A), read exactly the span, emit it
  * as a binary column the decode/feature seams consume.
  *
  * Scale posture: fetching is the FIRST time data bytes move, so the
  * operator is defensive about volume — spans above `maxSpanBytes`
  * (default 64 MB) are refused per row (flagged, not fetched; a
  * "frame" claiming gigabytes is a corrupt index, and one such row
  * must not OOM an executor). Within a partition, consecutive rows
  * for the SAME path reuse one open reader — `sortWithinPartitions
  * (pathCol)` upstream (or the natural clustering of per-file
  * walkers' output) makes a 10k-frame sample of one movie cost one
  * open + 10k preads, not 10k opens. Unreadable paths / out-of-range
  * spans emit the flagged row, keeping the pipeline total.
  */
object SpanFetch {

  /** One fetched span; `fetched = false` flags refusal (oversize
    * span, unreadable path, out-of-range read) with `bytes` empty. */
  final case class FetchedSpan(id: Long, path: String, byte_start: Long,
      byte_len: Long, bytes: Array[Byte], fetched: Boolean)

  def fetchSpans(df: DataFrame, idCol: String, pathCol: String,
      startCol: String, lenCol: String, maxSpanBytes: Long = 1L << 26)(
      implicit spark: SparkSession): Dataset[FetchedSpan] = {
    import spark.implicits._
    require(maxSpanBytes > 0, "maxSpanBytes must be positive")
    val cap = math.min(maxSpanBytes, (Int.MaxValue - 8).toLong)
    val confBc = PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"),
        col(startCol).cast("long"), col(lenCol).cast("long"))
      .as[(Long, String, Long, Long)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        // one open reader, reused while consecutive rows share a path
        var openPath: String = null
        var reader: Mp4Index.RangeReader = null
        def closeReader(): Unit = {
          if (reader != null) {
            try reader.close()
            catch { case scala.util.control.NonFatal(_) => () }
            reader = null; openPath = null
          }
        }
        // the reader is held ACROSS rows, so iterator-drain close is
        // not enough: a limit()/take() or a downstream failure stops
        // pulling mid-partition — the task-completion listener is the
        // close that always runs
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => closeReader()))
        def readerFor(path: String): Mp4Index.RangeReader = {
          if (openPath != path) {
            if (reader != null) {
              try reader.close()
              catch { case scala.util.control.NonFatal(_) => () }
            }
            reader = PathIO.openRange(path, conf)
            openPath = path
          }
          reader
        }
        val out = it.map { case (id, path, start, len) =>
          val bytes =
            try {
              if (start < 0 || len < 0 || len > cap) None
              else Some(readerFor(path).readFully(start, len.toInt))
            } catch {
              case scala.util.control.NonFatal(_) =>
                // a failed reader may be poisoned — drop it so the
                // next row re-opens instead of failing forever
                closeReader()
                None
            }
          bytes match {
            case Some(b) => FetchedSpan(id, path, start, len, b,
              fetched = true)
            case None => FetchedSpan(id, path, start, len,
              Array.empty[Byte], fetched = false)
          }
        }
        // also close on clean drain (local/test paths without a task
        // context still release promptly)
        new Iterator[FetchedSpan] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) closeReader()
            h
          }
          def next(): FetchedSpan = out.next()
        }
      }
  }
}
