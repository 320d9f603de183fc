package graft.streaming

import graft.SparkSpec
import graft.io.Tar
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger

/** The shard-drop stream ([[StreamShards]]): checkpointed
  * exactly-once member indexing over two arrival batches, flagged
  * corrupt drops, temp-file exclusion, and per-batch completeness.
  */
class StreamShardsSpec extends SparkSpec {
  import spark.implicits._

  private def shard(samples: (String, String)*): Array[Byte] =
    Tar.encodeSynthetic(samples.map { case (name, body) =>
      (name, body.getBytes("UTF-8"), 1700000000L)
    })

  private def runToParquet(df: org.apache.spark.sql.DataFrame,
      out: String, ckpt: String): Unit = {
    val q = df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("members: exactly-once over two arrivals; corrupt + temp drops handled") {
    val drop = Files.createTempDirectory("shard_drop").toString
    val out = Files.createTempDirectory("shard_out").toString
    val ckpt = Files.createTempDirectory("shard_ckpt").toString
    Files.write(Paths.get(drop, "000001.tar"), shard(
      ("s1.jpg", "IMG1"), ("s1.txt", "a cat"),
      ("s2.jpg", "IMG2"), ("s2.txt", "a dog")))
    Files.write(Paths.get(drop, "bad.tar"), Array[Byte](9, 9, 9))
    Files.write(Paths.get(drop, "000002.tar.tmp"), Array[Byte](1))
    runToParquet(StreamShards.members(spark, drop), out, ckpt)
    val r1 = spark.read.parquet(out).collect()
    assert(r1.count(_.getAs[Boolean]("indexed")) === 4)
    assert(r1.count(r => !r.getAs[Boolean]("indexed") &&
      r.getAs[String]("path").endsWith("bad.tar")) === 1)
    assert(!r1.exists(_.getAs[String]("path").endsWith(".tmp")))
    assert(r1.filter(_.getAs[Boolean]("indexed"))
      .map(r => (r.getAs[String]("sample_key"), r.getAs[String]("ext")))
      .toSet === Set(("s1", "jpg"), ("s1", "txt"),
      ("s2", "jpg"), ("s2", "txt")))

    // batch 2: a new shard; same checkpoint processes ONLY it
    Files.write(Paths.get(drop, "000002.tar"), shard(("s3.jpg", "IMG3")))
    runToParquet(StreamShards.members(spark, drop), out, ckpt)
    val r2 = spark.read.parquet(out)
    assert(r2.count() === r1.length + 1L)
    // and a third run with nothing new appends nothing
    runToParquet(StreamShards.members(spark, drop), out, ckpt)
    assert(spark.read.parquet(out).count() === r1.length + 1L)
  }

  test("member spans feed SpanFetch: streamed WebDataset samples load end-to-end") {
    val drop = Files.createTempDirectory("shard_drop3").toString
    val ckpt = Files.createTempDirectory("shard_ckpt3").toString
    Files.write(Paths.get(drop, "000001.tar"), shard(
      ("s1.jpg", "IMAGEBYTES-1"), ("s1.txt", "a cat sat")))
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = StreamShards.members(spark, drop).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the arrival batch's member spans -> ranged fetch -> bytes:
        // exactly the shard-sample loading path, no full-shard read
        val members = batch
          .filter(org.apache.spark.sql.functions.col("indexed"))
        val fetched = graft.io.SpanFetch.fetchSpans(members,
          "entry_idx", "path", "data_start", "data_len")(
          batch.sparkSession).collect()
        val nameById = members.select("entry_idx", "name").collect()
          .map(r => (r.getInt(0).toLong, r.getString(1))).toMap
        assert(fetched.forall(_.fetched))
        got ++= fetched.map(f =>
          (nameById(f.id), new String(f.bytes, "UTF-8")))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(got.toMap === Map(
      "s1.jpg" -> "IMAGEBYTES-1", "s1.txt" -> "a cat sat"))
  }

  test("incompleteSamples surfaces missing modalities per arrival") {
    val drop = Files.createTempDirectory("shard_drop2").toString
    val ckpt = Files.createTempDirectory("shard_ckpt2").toString
    Files.write(Paths.get(drop, "000001.tar"), shard(
      ("a.jpg", "I"), ("a.txt", "t"),
      ("b.jpg", "I"),                  // missing b.txt
      ("c.jpg", "I"), ("c.txt", "t"), ("c.json", "{}"))) // extra c.json
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    val q = StreamShards.members(spark, drop).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= StreamShards.incompleteSamples(batch, Seq("jpg", "txt"))
          .select("sample_key", "exts")
          .as[(String, Seq[String])](
            org.apache.spark.sql.Encoders.product[(String, Seq[String])])
          .collect()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(got.sortBy(_._1).toSeq === Seq(
      ("b", Seq("jpg")), ("c", Seq("jpg", "json", "txt"))))
  }
}
