package graft.streaming

import graft.SparkSpec
import graft.io.Warc
import graft.pipeline.Curation.CurationConfig
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger

/** The streaming WARC front door ([[StreamWarc]]): checkpointed
  * exactly-once ingest over two arrival batches, the flagged-row path
  * for corrupt drops, and the composed curation stream.
  */
class StreamWarcSpec extends SparkSpec {
  import spark.implicits._

  private val prose1 = "the cat and the dog are in the house with a mouse " +
    "and it is warm that day for all of us on the hill"
  private val prose2 = "a bird was on the roof and the wind is soft with " +
    "rain that falls to the ground for hours in the night"

  private def htmlResponse(text: String): Array[Byte] =
    Warc.httpResponse(200, "OK", Seq(("Content-Type", "text/html")),
      s"<html><body><p>$text</p></body></html>".getBytes("UTF-8"))

  private def warcOf(texts: String*): Array[Byte] =
    Warc.encodeSynthetic(texts.map(t =>
      ("response", s"http://x.example/${t.hashCode}",
        "application/http; msgtype=response", htmlResponse(t))))

  private def runToParquet(df: org.apache.spark.sql.DataFrame,
      out: String, ckpt: String): Unit = {
    val q = df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("pages: exactly-once over two arrival batches + flagged corrupt drop") {
    val drop = Files.createTempDirectory("warc_drop").toString
    val out = Files.createTempDirectory("warc_out").toString
    val ckpt = Files.createTempDirectory("warc_ckpt").toString
    // batch 1: one plain archive (2 pages) + one corrupt drop
    Files.write(Paths.get(drop, "a.warc"), warcOf(prose1, prose2))
    Files.write(Paths.get(drop, "bad.warc"), Array[Byte](9, 9, 9, 9))
    runToParquet(StreamWarc.pages(spark, drop), out, ckpt)
    val r1 = spark.read.parquet(out).collect()
    assert(r1.count(_.getAs[Boolean]("extracted")) === 2)
    val flagged = r1.filter(!_.getAs[Boolean]("extracted"))
    assert(flagged.length === 1 &&
      flagged.head.getAs[String]("path").endsWith("bad.warc"))
    assert(r1.filter(_.getAs[Boolean]("extracted"))
      .map(_.getAs[String]("text")).toSet === Set(prose1, prose2))

    // batch 2: a NEW gzipped archive arrives; the same checkpoint
    // processes ONLY it — batch-1 files are not re-emitted
    val gz = {
      val mem = warcOf("new arrival page with the words of the day and " +
        "a light wind from the sea for all the folk")
      val rec = Warc.recordIndex(mem).get.head
      Warc.gzipPerRecord(Seq(java.util.Arrays.copyOfRange(mem,
        rec.byteStart.toInt, (rec.byteStart + rec.byteLen).toInt)))
    }
    Files.write(Paths.get(drop, "b.warc.gz"), gz)
    runToParquet(StreamWarc.pages(spark, drop), out, ckpt)
    val r2 = spark.read.parquet(out).collect()
    assert(r2.length === r1.length + 1, "exactly one new page row")
    assert(r2.count(_.getAs[String]("path").endsWith("b.warc.gz")) === 1)
    // a third run with NOTHING new appends NOTHING (exactly-once)
    runToParquet(StreamWarc.pages(spark, drop), out, ckpt)
    assert(spark.read.parquet(out).count() === r2.length.toLong)
  }

  test("pathGlobFilter keeps non-archive drops out of the file registry") {
    val drop = Files.createTempDirectory("warc_drop2").toString
    val out = Files.createTempDirectory("warc_out2").toString
    val ckpt = Files.createTempDirectory("warc_ckpt2").toString
    Files.write(Paths.get(drop, "a.warc"), warcOf(prose1))
    Files.write(Paths.get(drop, "crawler.log"),
      "not an archive".getBytes("UTF-8"))
    // an in-flight write-then-rename temp must NOT enter the file
    // registry — once captured, its path would be pinned as a
    // corrupt drop forever
    Files.write(Paths.get(drop, "b.warc.tmp"), Array[Byte](1, 2))
    runToParquet(StreamWarc.pages(spark, drop), out, ckpt)
    val rows = spark.read.parquet(out).collect()
    assert(rows.length === 1 && rows.head.getAs[Boolean]("extracted"))
  }

  test("curated: streaming dedup drops a cross-batch duplicate page") {
    val drop = Files.createTempDirectory("warc_drop3").toString
    val out = Files.createTempDirectory("warc_out3").toString
    val ckpt = Files.createTempDirectory("warc_ckpt3").toString
    val cfg = CurationConfig()
    Files.write(Paths.get(drop, "a.warc"), warcOf(prose1, prose2))
    runToParquet(StreamWarc.curated(spark, drop, cfg), out, ckpt)
    assert(spark.read.parquet(out).count() === 2)
    // batch 2 re-crawls prose1 (same text, different URL/file) and
    // finds one genuinely new page: only the new page survives dedup
    val fresh = "a new page with many of the small words that are in " +
      "the meadow and the brook by the old mill"
    Files.write(Paths.get(drop, "b.warc"), warcOf(prose1, fresh))
    runToParquet(StreamWarc.curated(spark, drop, cfg), out, ckpt)
    val rows = spark.read.parquet(out).collect()
    assert(rows.length === 3, rows.map(_.getAs[String]("text")).mkString("|"))
    assert(rows.map(_.getAs[String]("text")).toSet ===
      Set(prose1, prose2, fresh))
    // doc ids are stable hashes of (path, record_idx): all distinct
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === 3)
  }

  test("links: exactly-once outlink rows; batch edges fold incrementally") {
    val drop = Files.createTempDirectory("link_drop").toString
    val out = Files.createTempDirectory("link_out").toString
    val ckpt = Files.createTempDirectory("link_ckpt").toString
    def linkPage(uri: String, hrefs: String*): Array[Byte] =
      Warc.encodeSynthetic(Seq(
        ("response", uri, "application/http; msgtype=response",
          Warc.httpResponse(200, "OK",
            Seq(("Content-Type", "text/html")),
            ("<html><body>" + hrefs.map(h =>
              s"""<a href="$h">x</a>""").mkString +
              "</body></html>").getBytes("UTF-8")))))
    Files.write(Paths.get(drop, "a.warc"),
      linkPage("http://en.example/p1", "https://other.example/x",
        "rel/y"))
    runToParquet(StreamWarc.links(spark, drop), out, ckpt)
    val r1 = spark.read.parquet(out).collect()
    assert(r1.count(_.getAs[Boolean]("extracted")) === 2)
    assert(r1.map(_.getAs[String]("resolved")).toSet ===
      Set("https://other.example/x", "http://en.example/rel/y"))
    // second arrival: only the NEW archive's links append, and the
    // batch folds to host edges downstream
    Files.write(Paths.get(drop, "b.warc"),
      linkPage("http://de.example/p2", "https://other.example/z"))
    runToParquet(StreamWarc.links(spark, drop), out, ckpt)
    val r2 = spark.read.parquet(out)
    assert(r2.count() === 3)
    val edges = graft.io.CrawlGraph.hostEdges(
      r2.filter(org.apache.spark.sql.functions.col("extracted")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e._1, e._2)).toSeq
    assert(edges === Seq(
      ("de.example", "other.example", 1L),
      ("en.example", "en.example", 1L),
      ("en.example", "other.example", 1L)))
  }
}
