package graft.streaming

import graft.SparkSpec
import graft.multimodal.{MkvIndex, Mp4Index, Multimodal, OggIndex}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger

/** The media-drop stream ([[StreamMedia]]): checkpointed exactly-once
  * profile rows over two arrival batches, all three container routes
  * (mp4 / mkv / ogg), kernel agreement with the batch codec-config
  * operator, flagged corrupt drops, and temp-file exclusion.
  */
class StreamMediaSpec extends SparkSpec {
  import spark.implicits._

  private def runToParquet(df: org.apache.spark.sql.DataFrame,
      out: String, ckpt: String): Unit = {
    val q = df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("profiles: three containers, exactly-once arrivals, corrupt + temp drops") {
    val drop = Files.createTempDirectory("media_drop").toString
    val out = Files.createTempDirectory("media_out").toString
    val ckpt = Files.createTempDirectory("media_ckpt").toString
    val mp4 = Mp4Index.encodeSynthetic(
      Seq(Array.fill[Byte](9)(1), Array.fill[Byte](7)(2),
        Array.fill[Byte](5)(3)), syncSamples = Seq(1, 3))
    val mkv = MkvIndex.encodeSynthetic(
      Seq((Array.fill[Byte](5)(1), true), (Array.fill[Byte](4)(2), false)),
      codecId = "V_VP9")
    val ogg = OggIndex.encodeSynthetic(Seq(
      (Seq("OpusHead".getBytes("UTF-8")), 0L, true, false),
      (Seq(Array.fill[Byte](20)(7)), 960L, false, true)))
    Files.write(Paths.get(drop, "a.mp4"), mp4)
    Files.write(Paths.get(drop, "b.mkv"), mkv)
    Files.write(Paths.get(drop, "c.ogg"), ogg)
    Files.write(Paths.get(drop, "bad.mp4"), Array[Byte](9, 9, 9))
    Files.write(Paths.get(drop, "d.mp4.tmp"), Array[Byte](1))
    runToParquet(StreamMedia.profiles(spark, drop), out, ckpt)
    val r1 = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("path").split('/').last, r)).toMap
    assert(r1.size === 4)
    assert(!r1.contains("d.mp4.tmp"))

    // mp4 route: frame/keyframe counts from the sample table, codec
    // config profile/level/bit depth agreeing with the BATCH operator
    // over the same bytes (one kernel — videoCodecFactsSeekable)
    val a = r1("a.mp4")
    assert(a.getAs[Boolean]("indexed"))
    assert(a.getAs[String]("container") === "mp4")
    assert(a.getAs[Int]("n_units") === 3 && a.getAs[Int]("n_sync") === 2)
    val batchRow = Multimodal.videoCodecConfigs(
      Seq((1L, mp4)).toDF("id", "bytes"), "id", "bytes")(spark)
      .collect().head
    assert(a.getAs[String]("codec") === batchRow.codec)
    assert(a.getAs[String]("config_kind") === batchRow.kind)
    assert(a.getAs[Int]("profile") === batchRow.profile)
    assert(a.getAs[Int]("level") === batchRow.level)
    assert(a.getAs[Int]("bit_depth") === batchRow.bit_depth)

    // mkv route: V_VP9 with no CodecPrivate -> config columns -1
    val b = r1("b.mkv")
    assert(b.getAs[String]("container") === "mkv")
    assert(b.getAs[String]("codec") === "V_VP9")
    assert(b.getAs[Int]("n_units") === 2 && b.getAs[Int]("n_sync") === 1)
    assert(b.getAs[Int]("profile") === -1)

    // ogg route: page count, no keyframe notion
    val c = r1("c.ogg")
    assert(c.getAs[String]("container") === "ogg")
    assert(c.getAs[Int]("n_units") === 2 && c.getAs[Int]("n_sync") === -1)

    // corrupt drop: flagged row, not a task kill
    val bad = r1("bad.mp4")
    assert(!bad.getAs[Boolean]("indexed"))
    assert(bad.getAs[String]("container") === "")

    // batch 2: one new arrival; the same checkpoint processes ONLY it
    Files.write(Paths.get(drop, "e.mkv"), mkv)
    runToParquet(StreamMedia.profiles(spark, drop), out, ckpt)
    assert(spark.read.parquet(out).count() === 5L)
    // a third run with nothing new appends nothing
    runToParquet(StreamMedia.profiles(spark, drop), out, ckpt)
    assert(spark.read.parquet(out).count() === 5L)
  }
}
