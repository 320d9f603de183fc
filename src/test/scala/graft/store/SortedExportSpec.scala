package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[SortedExport]]: the range-partitioned layout serves any page of
  * the global order exactly, reading only the files that overlap it.
  */
class SortedExportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir =
    Files.createTempDirectory("sorted_exp").toString + "/t"
  private lazy val full: Seq[(Long, String)] = {
    // shuffled unique keys so the export has real sorting work
    val df = spark.range(1000)
      .select((col("id") * 977 % 1000).as("k"),
        concat(lit("v"), col("id")).as("s"))
    SortedExport.writeSorted(df, dir, Seq("k"), nFiles = 8)
    df.orderBy("k").as[(Long, String)].collect().toSeq
  }

  test("pages concatenated reproduce the full global order") {
    val expected = full // forces the export write (lazy)
    val pages = (0L until 1000L by 150L).flatMap(off =>
      SortedExport.page(spark, dir, Seq("k"), off, 150)
        .as[(Long, String)].collect())
    assert(pages === expected)
  }

  test("arbitrary offsets equal the orderBy slice; deep pages cost the same") {
    val expected = full
    Seq((0L, 10), (997L, 10), (463L, 37), (999L, 1)).foreach {
      case (off, lim) =>
        val got = SortedExport.page(spark, dir, Seq("k"), off, lim)
          .as[(Long, String)].collect().toSeq
        assert(got === expected.slice(off.toInt, off.toInt + lim),
          s"page($off, $lim) mismatch")
    }
  }

  test("a page reads only its overlapping files, not the layout") {
    full
    val page = SortedExport.page(spark, dir, Seq("k"), 400L, 50)
    // 1000 rows over 8 range files ≈ 125 rows/file: 50 rows span ≤ 2 files
    assert(page.inputFiles.length <= 2,
      s"page read ${page.inputFiles.length} of 8 files")
  }

  test("within-span skips beyond 2³¹ decompose exactly (no Int truncation)") {
    // pure decomposition: the chunks must sum to the skip
    assert(SortedExport.offsetChunks(0L) === Seq(0))
    assert(SortedExport.offsetChunks(5L) === Seq(5))
    assert(SortedExport.offsetChunks(Int.MaxValue.toLong) ===
      Seq(Int.MaxValue))
    val big = 5000000000L // > 2³¹: the old .toInt path corrupted this
    val chunks = SortedExport.offsetChunks(big)
    assert(chunks.map(_.toLong).sum === big)
    assert(chunks === Seq(Int.MaxValue, Int.MaxValue, 705032706))
    // chained Offset nodes equal one big offset on real ordered data
    val df = spark.range(100).toDF("id").orderBy("id")
    val chained = SortedExport.offsetLong(df, 37L, chunk = 10)
      .limit(5).as[Long].collect().toSeq
    assert(chained === (37L until 42L).toSeq)
  }

  test("past-the-end page is empty; schema preserved") {
    full
    val empty = SortedExport.page(spark, dir, Seq("k"), 5000L, 10)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("k", "s"))
  }
}
