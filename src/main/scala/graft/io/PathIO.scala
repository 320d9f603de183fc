package graft.io

import java.io.InputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.SerializableWritable
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

import graft.multimodal.Mp4Index

/** Storage routing for the path-columned container/WARC walkers.
  *
  * The seekable / streaming walks are the >2 GiB story for video and
  * crawl corpora (reference ingests whole files via pandas —
  * `data_extraction.py` reads everything into memory; at 100 TB the
  * header-only walk is the only tenable shape), but a real corpus
  * lives on `s3a://` / `hdfs://`, not a task-local disk. This object
  * is the seam between the walkers and storage:
  *
  *   - a scheme-qualified path (`hdfs://…`, `s3a://…`, `file:///…`)
  *     opens through `org.apache.hadoop.fs.FileSystem`;
  *     [[HadoopRangeReader]] maps [[Mp4Index.RangeReader.readFully]]
  *     onto `FSDataInputStream`'s positioned read — on HDFS a pread,
  *     on S3A a ranged GET — so indexing a 50 GB object still costs
  *     kilobytes of I/O;
  *   - a plain path stays on `java.io` ([[Mp4Index.FileRangeReader]]
  *     / `FileInputStream`) — no filesystem cache init, no Hadoop
  *     classloading on the hot local path.
  *
  * Tasks need the session's Hadoop configuration (credentials,
  * endpoints arrive as `spark.hadoop.*`); [[confBroadcast]] ships it
  * once per job via the public `SerializableWritable` wrapper
  * (`Configuration` is a Hadoop `Writable`). The broadcast copies the
  * conf first — serializing the live session conf races concurrent
  * `set()`s.
  *
  * `FileSystem.get` instances are JVM-cached and shared; readers
  * close only their stream, never the filesystem.
  */
object PathIO {

  /** `true` when `path` is a URI with an explicit scheme — the only
    * shape routed through Hadoop. Both `scheme://host/…` and the
    * normalized no-authority `scheme:/…` form count (Hadoop and the
    * Spark file stream source print local URIs as `file:/tmp/…`).
    * The scheme must be ≥ 2 chars: a single letter + colon is a
    * Windows drive, not a scheme — Hadoop's own Path rule.
    * (`java.net.URI` rejects spaces and other raw-path bytes, so
    * match textually.) */
  def hasScheme(path: String): Boolean =
    SchemeRe.findPrefixOf(path).isDefined

  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]+:/".r

  /** Hadoop-FS RangeReader: positioned reads over `FSDataInputStream`
    * — thread-safe preads that never disturb the stream position, the
    * exact contract [[Mp4Index.RangeReader.readFully]] asks for.
    *
    * The stream opens with DECLARED random-read intent
    * (`fs.option.openfile.read.policy=random`, the Hadoop 3.3+
    * openFile builder): without it, S3A's default `sequential`
    * fadvise aborts and re-opens the HTTP connection on every
    * backward seek — a 10k-span sample would cost 10k connection
    * re-opens; with it, S3A issues true ranged GETs. The known file
    * length rides along (`fs.option.openfile.length`) so S3A skips
    * its own HEAD. Filesystems without the builder (or that reject
    * it) fall back to plain `open` — HDFS preads are positioned
    * either way. */
  final class HadoopRangeReader(path: String, conf: Configuration)
      extends Mp4Index.RangeReader {
    private val p = new Path(path)
    private val fs = p.getFileSystem(conf)
    private val len = fs.getFileStatus(p).getLen
    private val in =
      try fs.openFile(p)
        .opt("fs.option.openfile.read.policy", "random")
        .opt("fs.option.openfile.length", len.toString)
        .build().get()
      catch {
        // a pre-3.3 Hadoop without the openFile builder surfaces as
        // NoSuchMethodError — a LinkageError, which NonFatal does NOT
        // match; without this arm the documented fallback never
        // engages and every task on an old cluster crashes instead
        case _: LinkageError => fs.open(p)
        case _: InterruptedException =>
          // fall back FIRST, then restore the flag: interrupt-aware
          // filesystems would refuse the open with the flag set, and
          // the task still sees the interrupt right after
          val s = fs.open(p); Thread.currentThread().interrupt(); s
        case scala.util.control.NonFatal(_) => fs.open(p)
      }
    def length: Long = len
    def readFully(at: Long, len: Int): Array[Byte] = {
      val out = new Array[Byte](len)
      in.readFully(at, out, 0, len)
      out
    }
    def close(): Unit = in.close()
  }

  /** A RangeReader for `path`: Hadoop when scheme-qualified, local
    * `RandomAccessFile` otherwise. */
  def openRange(path: String, conf: Configuration): Mp4Index.RangeReader =
    if (hasScheme(path)) new HadoopRangeReader(path, conf)
    else new Mp4Index.FileRangeReader(path)

  /** A plain forward InputStream over `path` from offset 0 — the
    * streaming (gzip) walks, which cannot seek anyway. */
  def openStream(path: String, conf: Configuration): InputStream =
    if (hasScheme(path)) {
      val p = new Path(path)
      p.getFileSystem(conf).open(p)
    } else new java.io.FileInputStream(path)

  /** The session's Hadoop conf, copied and broadcast for task-side
    * [[openRange]]/[[openStream]] calls. */
  def confBroadcast(spark: SparkSession)
      : Broadcast[SerializableWritable[Configuration]] =
    spark.sparkContext.broadcast(new SerializableWritable(
      new Configuration(spark.sparkContext.hadoopConfiguration)))
}
