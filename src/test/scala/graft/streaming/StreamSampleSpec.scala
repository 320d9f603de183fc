package graft.streaming

import graft.SparkSpec
import graft.profile.Sampling
import graft.store.Warehouse
import java.nio.file.Files

class StreamSampleSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[(Long, Double)] =
    (1L to 300L).map(i => (i, (i % 11 + 1).toDouble))

  private def sampleIds(wh: Warehouse, name: String, k: Int): Set[Long] =
    StreamSample.currentSample(wh, name, "id", "w", k)
      .select("id").as[Long].collect().toSet

  test("streamed sample over arriving batches ≡ batch weightedSample of the union") {
    val wh = new Warehouse(spark, Files.createTempDirectory("ss_wh").toString)
    val in = Files.createTempDirectory("ss_in").toString
    val ckpt = Files.createTempDirectory("ss_ckpt").toString

    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = StreamIngest.readFileStream(spark, in, schema)
      StreamSample.weightedSampleStream(wh, "wsx", stream, "id", "w",
        k = 25, checkpoint = ckpt).awaitTermination()
    }

    // three arrival waves, interleaved id ranges (order must not matter)
    rows.filter(_._1 % 3 == 0).toDF("id", "w")
      .coalesce(1).write.mode("append").parquet(in)
    drain()
    rows.filter(_._1 % 3 == 1).toDF("id", "w")
      .coalesce(1).write.mode("append").parquet(in)
    drain()
    rows.filter(_._1 % 3 == 2).toDF("id", "w")
      .coalesce(1).write.mode("append").parquet(in)
    drain()

    val expected = Sampling.weightedSample(rows.toDF("id", "w"), "id", "w", 25)
      .select("id").as[Long].collect().toSet
    assert(sampleIds(wh, "wsx", 25) === expected)
    // candidates stay bounded: ≤ k per drained batch
    assert(wh.read(StreamSample.candidatesTable("wsx")).count() <= 3 * 25)
  }

  test("replay after checkpoint loss re-delivers without duplicating candidates") {
    val wh = new Warehouse(spark, Files.createTempDirectory("ss_wh2").toString)
    val in = Files.createTempDirectory("ss_in2").toString

    def drainFreshCkpt(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = StreamIngest.readFileStream(spark, in, schema)
      StreamSample.weightedSampleStream(wh, "wsy", stream, "id", "w",
        k = 10,
        checkpoint = Files.createTempDirectory("ss_ckpt2").toString)
        .awaitTermination()
    }

    rows.take(100).toDF("id", "w").coalesce(1).write.mode("append").parquet(in)
    drainFreshCkpt()
    val first = sampleIds(wh, "wsy", 10)
    val nCand = wh.read(StreamSample.candidatesTable("wsy")).count()
    // checkpoint lost → the whole input replays; the deterministic draw
    // + keyed-idempotent append make it a no-op
    drainFreshCkpt()
    assert(sampleIds(wh, "wsy", 10) === first)
    assert(wh.read(StreamSample.candidatesTable("wsy")).count() === nCand)
  }
}
