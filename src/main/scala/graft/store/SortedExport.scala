package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed total-order export + manifest-served pagination — the
  * scalable form of the reference's OFFSET/LIMIT pagination
  * (`data_loader.py:777-787`, SURVEY §2.6 O4, previously a documented
  * drop because a naive global sort per page cannot survive 100 TB).
  *
  * The layout is written ONCE: `repartitionByRange` on the sort key
  * gives disjoint, ordered key ranges per partition,
  * `sortWithinPartitions` orders rows inside each, and every task
  * writes exactly one file — so the file sequence, in partition-id
  * order, IS the global order. A driver-sized manifest records each
  * file's row count and key bounds; a page at any offset then reads
  * ONLY the files overlapping [offset, offset+limit) (found by prefix
  * sums on the manifest) and applies a local residual skip — no sort,
  * no scan of the other files, O(files) driver work. Page cost is
  * proportional to the page, not to the offset, and any page depth is
  * reachable — the two properties a Spark-side
  * `orderBy().offset().limit()` per page lacks.
  */
object SortedExport {

  /** Write `df` totally ordered by `sortCols` into `nFiles` range
    * files under `path`; returns the manifest (also persisted at
    * `<path>__pages` for [[page]] calls in later sessions).
    * Pages are deterministic when `sortCols` has a unique prefix
    * (include a row id as the last sort column otherwise) — with
    * ties, rows are totally ordered only up to the tie, the same
    * contract as any ORDER BY/OFFSET pagination.
    */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
      nFiles: Int): DataFrame = {
    require(sortCols.nonEmpty && nFiles > 0)
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    val manifest = buildManifest(spark, path, sortCols)
    manifest.coalesce(1).write.mode("overwrite").parquet(s"${path}__pages")
    spark.read.parquet(s"${path}__pages")
  }

  /** One manifest row per data file: its row count and sort-key
    * bounds. File order (lexicographic part names = partition id
    * order) is the global sort order by the range-partition invariant.
    */
  def buildManifest(spark: SparkSession, path: String,
      sortCols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(struct(sortCols.map(col): _*)).as("lo"),
        max(struct(sortCols.map(col): _*)).as("hi"))
      .orderBy("file")

  /** Serve rows [offset, offset+limit) of the global order. Reads
    * only the overlapping files; the residual skip happens after an
    * in-memory sort of JUST those files' rows (bounded by
    * limit + one file's rows).
    */
  def page(spark: SparkSession, path: String, sortCols: Seq[String],
      offset: Long, limit: Int): DataFrame = {
    require(offset >= 0 && limit > 0)
    val manifest = spark.read.parquet(s"${path}__pages")
      .select("file", "n_rows").orderBy("file")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // prefix sums locate the page's file span — O(files), driver-sized
    var cum = 0L
    val spans = manifest.map { case (f, n) =>
      val start = cum; cum += n; (f, start, cum)
    }
    val hit = spans.filter { case (_, s, e) =>
      e > offset && s < offset + limit
    }
    if (hit.isEmpty)
      return spark.read.parquet(path).limit(0)
    val localSkip = offset - hit.head._2
    val base = spark.read.parquet(hit.map(_._1).toSeq: _*)
      .orderBy(sortCols.map(col): _*)
    offsetLong(base, localSkip).limit(limit)
  }

  /** `Dataset.offset` takes an Int; a page landing more than 2³¹ rows
    * into ONE range file (a >2B-row file, or a monster limit) would
    * silently truncate. Chain Int-sized Offset nodes instead — Spark
    * composes `Offset(Offset(p, a), b)` as a skip of a + b.
    */
  private[store] def offsetLong(df: DataFrame, skip: Long,
      chunk: Int = Int.MaxValue): DataFrame =
    offsetChunks(skip, chunk).foldLeft(df)((d, c) => d.offset(c))

  /** Decompose a Long skip into `chunk`-sized Int pieces summing to
    * `skip` (chunk parameterized so the chained-offset equivalence is
    * testable without materializing 2³¹ rows).
    */
  private[store] def offsetChunks(skip: Long,
      chunk: Int = Int.MaxValue): Seq[Int] = {
    require(skip >= 0, s"negative skip: $skip")
    require(chunk > 0)
    val full = Seq.fill((skip / chunk).toInt)(chunk)
    val rest = (skip % chunk).toInt
    if (rest > 0 || full.isEmpty) full :+ rest else full
  }
}
