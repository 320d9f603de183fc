package graft.io

import graft.SparkSpec
import graft.multimodal.{MkvIndex, Mp4Index, Multimodal}

/** Hadoop-FS routing for the path-columned walkers ([[PathIO]]): a
  * scheme-qualified `file:///` URI must index identically to the
  * plain local path — the WarehouseSpec posture: prove the Hadoop
  * seam end-to-end on the one scheme the sandbox has, so `s3a://` /
  * `hdfs://` corpora differ only in the FileSystem implementation
  * Hadoop resolves.
  */
class PathIOSpec extends SparkSpec {
  implicit private def s = spark
  import spark.implicits._

  test("hasScheme routes URIs to Hadoop and plain paths to java.io") {
    assert(PathIO.hasScheme("file:///tmp/a.mp4"))
    assert(PathIO.hasScheme("s3a://bucket/key.warc.gz"))
    assert(PathIO.hasScheme("hdfs://nn:8020/crawl/a.warc"))
    // the normalized no-authority form the Spark file stream source
    // and Hadoop Path.toString print
    assert(PathIO.hasScheme("file:/tmp/a.warc"))
    assert(!PathIO.hasScheme("/tmp/a.mp4"))
    assert(!PathIO.hasScheme("relative/clip.webm"))
    // a Windows-ish drive letter or a colon without slashes is a
    // plain path, not a scheme (the Hadoop Path rule: 1-char scheme
    // = drive letter)
    assert(!PathIO.hasScheme("C:\\clips\\a.mp4"))
    assert(!PathIO.hasScheme("C:/clips/a.mp4"))
    assert(!PathIO.hasScheme("host:port"))
  }

  test("HadoopRangeReader serves positioned reads over file:// with bounds") {
    val f = java.io.File.createTempFile("graft-pathio", ".bin")
    try {
      val bytes = Array.tabulate[Byte](4096)(i => (i * 31 & 0xff).toByte)
      java.nio.file.Files.write(f.toPath, bytes)
      val conf = spark.sparkContext.hadoopConfiguration
      val r = PathIO.openRange("file://" + f.getPath, conf)
      try {
        assert(r.isInstanceOf[PathIO.HadoopRangeReader])
        assert(r.length === 4096L)
        assert(r.readFully(0, 16).toSeq === bytes.take(16).toSeq)
        assert(r.readFully(4090, 6).toSeq === bytes.drop(4090).toSeq)
        // out-of-range positioned reads must throw, not zero-fill —
        // the walkers catch and emit the flagged row
        intercept[Exception](r.readFully(4090, 7))
      } finally r.close()
      // plain path stays on RandomAccessFile
      val lr = PathIO.openRange(f.getPath, conf)
      try assert(lr.isInstanceOf[Mp4Index.FileRangeReader]) finally lr.close()
    } finally f.delete()
  }

  test("extractRecordsByPath over file:// URIs matches the in-memory index") {
    val plain = Warc.encodeSynthetic(Seq(
      ("warcinfo", "", "application/warc-fields",
        "software: graft\r\n".getBytes("ISO-8859-1")),
      ("response", "http://a.example/", "application/http; msgtype=response",
        Warc.httpResponse(200, "OK", Seq(("Content-Type", "text/html")),
          "<html><body><p>Hadoop seam</p></body></html>".getBytes("UTF-8")))))
    val mem = Warc.recordIndex(plain).get
    val members = mem.map(r => java.util.Arrays.copyOfRange(plain,
      r.byteStart.toInt, (r.byteStart + r.byteLen).toInt))
    val fp = java.io.File.createTempFile("graft-pathio", ".warc")
    val fg = java.io.File.createTempFile("graft-pathio", ".warc.gz")
    try {
      java.nio.file.Files.write(fp.toPath, plain)
      java.nio.file.Files.write(fg.toPath, Warc.gzipPerRecord(members))
      val df = Seq(
        (1L, "file://" + fp.getPath),   // seekable walk via Hadoop
        (2L, "file://" + fg.getPath),   // streaming gzip walk via Hadoop
        (3L, "file:///nonexistent/x.warc"),
        (4L, "s3a://no-such-bucket-graft/x.warc") // unusable FS → flagged
      ).toDF("id", "path")
      val rows = Warc.extractRecordsByPath(df, "id", "path").collect()
        .sortBy(r => (r.asset_id, r.record_idx))
      for (id <- Seq(1L, 2L)) {
        val rs = rows.filter(_.asset_id == id)
        assert(rs.map(r => (r.record_idx, r.byte_start, r.warc_type)).toSeq
          === mem.map(r => (r.recordIdx, r.byteStart, r.warcType)),
          s"asset $id")
      }
      assert(rows.count(r => r.asset_id == 3L && !r.indexed) === 1)
      assert(rows.count(r => r.asset_id == 4L && !r.indexed) === 1)
    } finally { fp.delete(); fg.delete() }
  }

  test("seekable video indexing over file:// URIs (MP4 + WebM + tar)") {
    val ss = Seq(7, 14, 3).map(n => Array.tabulate[Byte](n)(_.toByte))
    val mp4 = Mp4Index.encodeSynthetic(ss, syncSamples = Seq(1, 3))
    val webm = MkvIndex.encodeSynthetic(Seq(
      (Array.tabulate[Byte](5)(_.toByte), true),
      (Array.tabulate[Byte](7)(_.toByte), false)))
    val fm = java.io.File.createTempFile("graft-pathio", ".mp4")
    val fw = java.io.File.createTempFile("graft-pathio", ".webm")
    val ft = java.io.File.createTempFile("graft-pathio", ".tar")
    try {
      java.nio.file.Files.write(fm.toPath, mp4)
      java.nio.file.Files.write(fw.toPath, webm)
      val rows = Multimodal.sampleVideoFramesByPath(
        Seq((1L, "file://" + fm.getPath), (2L, "file://" + fw.getPath))
          .toDF("id", "path"),
        "id", "path", stride = 1, maxFrames = 10)
        .collect().sortBy(r => (r.asset_id, r.frame_idx))
      assert(rows.filter(_.asset_id == 1L).map(_.byte_len).toSeq
        === Seq(7L, 14L, 3L))
      assert(rows.filter(_.asset_id == 2L).map(_.byte_len).toSeq
        === Seq(5L, 7L))
      assert(rows.forall(_.indexed))
      // the tar shard walk takes the same route
      val tar = Tar.encodeSynthetic(Seq(
        ("a.txt", "alpha".getBytes("UTF-8"), 1000L),
        ("b/c.json", "{}".getBytes("UTF-8"), 2000L)))
      java.nio.file.Files.write(ft.toPath, tar)
      val trows = Tar.extractEntriesByPath(
        Seq((1L, "file://" + ft.getPath)).toDF("id", "path"), "id", "path")
        .collect().sortBy(_.entry_idx)
      assert(trows.map(_.name).toSeq === Seq("a.txt", "b/c.json"))
      assert(trows.forall(_.indexed))
    } finally { fm.delete(); fw.delete(); ft.delete() }
  }
}
