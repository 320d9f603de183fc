package graft.transform

import graft.SparkSpec
import java.sql.Timestamp

class InterpolateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private def interp(rows: Seq[(Long, Timestamp, Option[Double])]) =
    Transforms.interpolateLinear(
        rows.toDF("e", "ts", "v"), "e", "ts", "v")
      .orderBy("ts")
      .select("v_interp").as[Option[Double]].collect().toSeq

  test("interior gap takes the time-weighted line between neighbors") {
    // 10.0 at t=0, NULL at t=10, NULL at t=30, 50.0 at t=40
    val got = interp(Seq(
      (1L, ts(0), Some(10.0)), (1L, ts(10), None),
      (1L, ts(30), None), (1L, ts(40), Some(50.0))))
    assert(got === Seq(Some(10.0), Some(20.0), Some(40.0), Some(50.0)))
  }

  test("leading gap backfills, trailing gap carries forward, all-null stays null") {
    assert(interp(Seq((1L, ts(0), None), (1L, ts(5), Some(7.0)),
      (1L, ts(9), None))) === Seq(Some(7.0), Some(7.0), Some(7.0)))
    assert(interp(Seq((1L, ts(0), None), (1L, ts(5), None)))
      === Seq(None, None))
  }

  test("entities interpolate independently") {
    val got = Transforms.interpolateLinear(
      Seq((1L, ts(0), Some(0.0)), (1L, ts(10), None), (1L, ts(20), Some(10.0)),
        (2L, ts(10), Some(100.0))).toDF("e", "ts", "v"), "e", "ts", "v")
      .orderBy("e", "ts")
      .select("v_interp").as[Double].collect().toSeq
    assert(got === Seq(0.0, 5.0, 10.0, 100.0))
  }

  test("streaming history records micro-batch progress") {
    import graft.ops.EngineOps
    import graft.streaming.StreamIngest
    val h = EngineOps.installStreamingHistory(spark)
    try {
      val in = java.nio.file.Files.createTempDirectory("sh_in").toString
      Seq((ts(0), "a", 1.0)).toDF("ts", "entity", "value")
        .write.mode("append").parquet(in)
      val schema = spark.read.parquet(in).schema
      StreamIngest.runToMemory(spark,
        StreamIngest.readFileStream(spark, in, schema), "sh_t")
      val deadline = System.currentTimeMillis() + 10000
      while (h.history.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(h.history.nonEmpty)
      assert(h.history.exists(_.numInputRows === 1L))
    } finally spark.streams.removeListener(h)
  }
}
