package graft.io

import graft.SparkSpec
import graft.multimodal.Mp4Index

/** The ranged-GET span consumer ([[SpanFetch]]): fetched bytes equal
  * direct slices, oversize/invalid spans flag instead of fetching,
  * readers are reused per path, and both path routes (plain +
  * `file://`) work.
  */
class SpanFetchSpec extends SparkSpec {
  implicit private def s = spark
  import spark.implicits._

  test("fetched spans equal the walkers' direct slices; flags on refusal") {
    val frames = Seq(11, 7, 19).map(n =>
      Array.tabulate[Byte](n)(j => ((n * 31 + j) & 0x7f).toByte))
    val mp4 = Mp4Index.encodeSynthetic(frames, syncSamples = Seq(1))
    val tar = Tar.encodeSynthetic(Seq(
      ("a.txt", "alpha-body".getBytes("UTF-8"), 0L),
      ("b.bin", Array.tabulate[Byte](600)(_.toByte), 0L)))
    val f1 = java.io.File.createTempFile("graft-span", ".mp4")
    val f2 = java.io.File.createTempFile("graft-span", ".tar")
    try {
      java.nio.file.Files.write(f1.toPath, mp4)
      java.nio.file.Files.write(f2.toPath, tar)
      // spans from the real walkers: video frames + tar members
      val spans = Mp4Index.frameIndex(mp4).get.map(sp =>
        (f1.getPath, sp.byteStart.toLong, sp.byteLen.toLong)) ++
        Tar.entryIndex(tar).get.map(e =>
          ("file://" + f2.getPath, e.dataStart, e.dataLen))
      val df = spans.zipWithIndex.map { case ((p, st, ln), i) =>
        (i.toLong, p, st, ln)
      }.toDF("id", "path", "byte_start", "byte_len")
      val got = SpanFetch.fetchSpans(df, "id", "path", "byte_start",
        "byte_len").collect().sortBy(_.id)
      assert(got.forall(_.fetched))
      // frame bytes match the encoder's frames; member bytes match
      assert(got.take(3).map(_.bytes.toSeq) === frames.map(_.toSeq))
      assert(new String(got(3).bytes, "UTF-8") === "alpha-body")
      assert(got(4).bytes.length === 600)
      // refusals: oversize span, negative span, bad path, out-of-range
      val bad = SpanFetch.fetchSpans(Seq(
        (1L, f1.getPath, 0L, 100L),
        (2L, f1.getPath, -1L, 4L),
        (3L, "/nonexistent/x.bin", 0L, 4L),
        (4L, f1.getPath, mp4.length.toLong - 2, 10L)
      ).toDF("id", "path", "byte_start", "byte_len"),
        "id", "path", "byte_start", "byte_len",
        maxSpanBytes = 50L).collect().sortBy(_.id)
      assert(bad.map(_.fetched).toSeq ===
        Seq(false, false, false, false))
      assert(bad.forall(_.bytes.isEmpty))
    } finally { f1.delete(); f2.delete() }
  }

  test("consecutive same-path rows reuse one reader; a failure re-opens") {
    val data = Array.tabulate[Byte](4096)(i => (i & 0x7f).toByte)
    val f = java.io.File.createTempFile("graft-span2", ".bin")
    try {
      java.nio.file.Files.write(f.toPath, data)
      // interleave a bad row: the rows after it must still fetch
      val df = Seq(
        (1L, f.getPath, 0L, 16L),
        (2L, f.getPath, 100L, 16L),
        (3L, f.getPath, 5000L, 16L), // out of range -> flagged
        (4L, f.getPath, 200L, 16L)
      ).toDF("id", "path", "byte_start", "byte_len").coalesce(1)
      val got = SpanFetch.fetchSpans(df, "id", "path", "byte_start",
        "byte_len").collect().sortBy(_.id)
      assert(got.map(_.fetched).toSeq === Seq(true, true, false, true))
      assert(got(3).bytes.toSeq ===
        java.util.Arrays.copyOfRange(data, 200, 216).toSeq)
      // partial consumption (limit) must not wedge on the held
      // reader — the task-completion listener owns the close
      val one = SpanFetch.fetchSpans(df, "id", "path", "byte_start",
        "byte_len").limit(1).collect()
      assert(one.length === 1 && one.head.fetched)
    } finally f.delete()
  }
}
