package graft.streaming

import graft.SparkSpec
import graft.io.{Warc, WarcCdx}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions.col

/** The CDX index-arrival stream ([[StreamCdx]]): checkpointed
  * exactly-once line parsing over two arrival batches, corrupt-line
  * visibility, and the full landing-to-hydration composition —
  * filtered rows fetch ONLY their gzip members from the archive the
  * index describes.
  */
class StreamCdxSpec extends SparkSpec {
  import spark.implicits._

  private def resp(uri: String, date: String, body: String,
      ct: String, status: Int): Array[Byte] =
    Warc.encodeSyntheticHeaders(Seq((Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:uuid:$uri>",
      "WARC-Date" -> date,
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=response"),
      Warc.httpResponse(status, "OK",
        Seq("Content-Type" -> s"$ct; charset=utf-8"),
        body.getBytes("UTF-8")))))

  private def runToParquet(df: org.apache.spark.sql.DataFrame,
      out: String, ckpt: String): Unit = {
    val q = df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("entries: exactly-once over two arrivals; corrupt lines visible") {
    val archives = Files.createTempDirectory("cdx_archives")
    val drop = Files.createTempDirectory("cdx_drop").toString
    val out = Files.createTempDirectory("cdx_out").toString
    val ckpt = Files.createTempDirectory("cdx_ckpt").toString
    // archive 1 + its index file
    val gz1 = Warc.gzipPerRecord(Seq(
      resp("http://a.example/one", "2024-03-05T06:07:08Z",
        "<html><head><title>One</title></head><body><p>First page." +
          "</p></body></html>", "text/html", 200),
      resp("http://a.example/pic.gif", "2024-03-05T06:07:09Z",
        "GIF89a", "image/gif", 200)))
    Files.write(archives.resolve("a.warc.gz"), gz1)
    val cdx1 = WarcCdx.cdxIndex(gz1).get
    val lines1 = cdx1.map(e => WarcCdx.cdxjLine(
      WarcCdx.CdxRow(1L, e.recordIdx, e.urlkey, e.timestamp, e.url,
        e.mime, e.status, e.digest, e.payloadDigest, e.offset, e.length,
        e.uncompLen, e.warcType, e.parsed, indexed = true), "a.warc.gz"))
    // corrupt shapes a real index shard can carry: a line with
    // spaces, a space-less line (ANSI element_at would have thrown
    // on this one), and a blank line — all must arrive flagged, not
    // kill the stream
    Files.write(Paths.get(drop, "batch1.cdxj"),
      (lines1 ++ Seq("this is not a cdxj line", "", "garbage"))
        .mkString("\n").getBytes("UTF-8"))
    Files.write(Paths.get(drop, "ignored.cdxj.tmp"), Array[Byte](1))
    runToParquet(StreamCdx.entries(spark, drop), out, ckpt)
    val r1 = spark.read.parquet(out).collect()
    assert(r1.length === 5) // 2 records + the 3 corrupt lines
    assert(!r1.exists(_.getAs[String]("index_path").endsWith(".tmp")))
    val good = r1.filter(_.getAs[String]("urlkey") != null)
      .filter(r => r.getAs[String]("filename") != null)
    assert(good.length === 2)
    assert(good.map(_.getAs[String]("mime")).toSet ===
      Set("text/html", "image/gif"))
    // corrupt lines keep their text, fields null
    val bad = r1.filter(_.getAs[String]("filename") == null)
    assert(bad.map(_.getAs[String]("line")).toSet ===
      Set("this is not a cdxj line", "garbage", ""))
    assert(bad.forall(_.getAs[String]("urlkey") == null))

    // batch 2: a second index file; same checkpoint processes ONLY it
    val gz2 = Warc.gzipPerRecord(Seq(
      resp("http://b.example/two", "2024-03-06T00:00:00Z",
        "<html><body><p>Second.</p></body></html>", "text/html", 200)))
    Files.write(archives.resolve("b.warc.gz"), gz2)
    val cdx2 = WarcCdx.cdxIndex(gz2).get
    Files.write(Paths.get(drop, "batch2.cdxj"),
      cdx2.map(e => WarcCdx.cdxjLine(
        WarcCdx.CdxRow(2L, e.recordIdx, e.urlkey, e.timestamp, e.url,
          e.mime, e.status, e.digest, e.payloadDigest, e.offset, e.length,
          e.uncompLen, e.warcType, e.parsed, indexed = true), "b.warc.gz"))
        .mkString("\n").getBytes("UTF-8"))
    runToParquet(StreamCdx.entries(spark, drop), out, ckpt)
    assert(spark.read.parquet(out).count() === 6L)
    // a third run with nothing new appends nothing
    runToParquet(StreamCdx.entries(spark, drop), out, ckpt)
    assert(spark.read.parquet(out).count() === 6L)
  }

  test("arrived index rows hydrate ONLY the filtered records") {
    val archives = Files.createTempDirectory("cdx_archives2")
    val drop = Files.createTempDirectory("cdx_drop2").toString
    val ckpt = Files.createTempDirectory("cdx_ckpt2").toString
    val gz = Warc.gzipPerRecord(Seq(
      resp("http://a.example/one", "2024-03-05T06:07:08Z",
        "<html><head><title>One</title></head><body><p>First page." +
          "</p></body></html>", "text/html", 200),
      resp("http://a.example/pic.gif", "2024-03-05T06:07:09Z",
        "GIF89a", "image/gif", 200),
      resp("http://a.example/gone", "2024-03-05T06:07:10Z",
        "<html><body>gone</body></html>", "text/html", 404)))
    Files.write(archives.resolve("a.warc.gz"), gz)
    val cdx = WarcCdx.cdxIndex(gz).get
    Files.write(Paths.get(drop, "a.cdxj"),
      cdx.map(e => WarcCdx.cdxjLine(
        WarcCdx.CdxRow(1L, e.recordIdx, e.urlkey, e.timestamp, e.url,
          e.mime, e.status, e.digest, e.payloadDigest, e.offset, e.length,
          e.uncompLen, e.warcType, e.parsed, indexed = true), "a.warc.gz"))
        .mkString("\n").getBytes("UTF-8"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = StreamCdx.entries(spark, drop).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = batch.sparkSession
        // the consumption pattern, streaming edition: filter the
        // arrived INDEX rows, resolve filename against the archive
        // root, ranged-fetch only the matching members
        val wanted = batch
          .filter(col("mime") === "text/html" && col("status") === 200)
          .withColumn("path", org.apache.spark.sql.functions
            .concat(org.apache.spark.sql.functions.lit(
              archives.toString + "/"), col("filename")))
        val hydrated = WarcCdx.hydrateByCdx(wanted, "offset", "path",
          "offset", "length")(s).collect()
        got ++= hydrated.filter(_.hydrated).map(h => (h.url, h.text))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // exactly the 200 text/html record hydrated — not the GIF, not
    // the 404
    assert(got.toList === List(
      ("http://a.example/one", "First page.")))
  }
}
