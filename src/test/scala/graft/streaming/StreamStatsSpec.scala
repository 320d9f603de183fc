package graft.streaming

import graft.SparkSpec
import graft.store.Warehouse
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamStatsSpec extends SparkSpec {
  import spark.implicits._

  // two groups with known exact trends: g=a is y = 2x + 1, g=b is
  // y = -0.5x + 10; OLS must recover them exactly (zero residual)
  private val rows: Seq[(String, Long, Double)] =
    (0L until 50L).flatMap(x =>
      Seq(("a", x, 2.0 * x + 1.0), ("b", x, -0.5 * x + 10.0)))

  private def batchModel(data: Seq[(String, Long, Double)]) = {
    val df = data.toDF("g", "x", "y")
      .groupBy($"g")
      .agg(count(lit(1)).as("n"),
        sum($"x".cast("decimal(38,0)")).cast("double").as("sx"),
        sum($"y".cast("decimal(20,4)")).cast("double").as("sy"),
        sum(($"x" * $"x").cast("decimal(38,0)")).cast("double").as("sxx"),
        sum(($"x" * $"y").cast("decimal(30,4)")).cast("double").as("sxy"))
    val slope = ($"n" * $"sxy" - $"sx" * $"sy") /
      ($"n" * $"sxx" - $"sx" * $"sx")
    df.select($"g", $"n", slope.as("slope"),
        (($"sy" - slope * $"sx") / $"n").as("intercept"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("streamed partials across waves ≡ one-shot batch OLS, bit for bit") {
    val wh = new Warehouse(spark, Files.createTempDirectory("so_wh").toString)
    val in = Files.createTempDirectory("so_in").toString
    val ckpt = Files.createTempDirectory("so_ckpt").toString

    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = StreamIngest.readFileStream(spark, in, schema)
      StreamStats.olsStream(wh, "trend", stream, "g", "x", "y",
        checkpoint = ckpt).awaitTermination()
    }

    val (w1, w2) = rows.partition(_._2 < 20)
    w1.toDF("g", "x", "y").coalesce(1).write.mode("append").parquet(in)
    drain()
    w2.toDF("g", "x", "y").coalesce(1).write.mode("append").parquet(in)
    drain()

    val got = StreamStats.currentModel(wh, "trend")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === batchModel(rows)) // exact double equality, not approx
    assert(got("a")._2 === 2.0 && got("a")._3 === 1.0)
    assert(got("b")._2 === -0.5 && got("b")._3 === 10.0)
    // one partials row per (group, batch)
    assert(wh.read(StreamStats.statsTable("trend")).count() === 4)

    // re-drain with nothing new: a no-op, partials unchanged
    drain()
    assert(wh.read(StreamStats.statsTable("trend")).count() === 4)
  }

  test("checkpoint LOSS mid-stream: restarted query rebuilds the model bit-exact") {
    val wh = new Warehouse(spark, Files.createTempDirectory("sl_wh").toString)
    val in = Files.createTempDirectory("sl_in").toString
    val ckptA = Files.createTempDirectory("sl_ckptA").toString
    val ckptB = Files.createTempDirectory("sl_ckptB").toString

    def drain(ckpt: String): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = StreamIngest.readFileStream(spark, in, schema)
      StreamStats.olsStream(wh, "trend", stream, "g", "x", "y",
        checkpoint = ckpt).awaitTermination()
    }
    val (w1, rest) = rows.partition(_._2 < 15)
    val (w2, w3) = rest.partition(_._2 < 35)
    w1.toDF("g", "x", "y").coalesce(1).write.mode("append").parquet(in)
    drain(ckptA)
    w2.toDF("g", "x", "y").coalesce(1).write.mode("append").parquet(in)
    drain(ckptA)
    assert(wh.read(StreamStats.statsTable("trend")).count() === 4)
    // checkpoint dies (fresh dir = lost): the restarted query re-reads
    // the retained source from scratch with batch ids back at 0 —
    // batch 0's `>= 0` delete clears the stale partials, so the
    // re-delivery cannot double-count them
    w3.toDF("g", "x", "y").coalesce(1).write.mode("append").parquet(in)
    drain(ckptB)
    val got = StreamStats.currentModel(wh, "trend")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === batchModel(rows), "recovered model diverged from batch")
    assert(got("a")._1 === 50L) // every row counted exactly once
  }

  test("streamed seasonal means ≡ batch per-group means, updated across waves") {
    val wh = new Warehouse(spark, Files.createTempDirectory("sm_wh").toString)
    val in = Files.createTempDirectory("sm_in").toString
    val ckpt = Files.createTempDirectory("sm_ckpt").toString
    // (type, hour) grid with exact decimal-friendly values
    val data = for {
      t <- Seq("click", "view"); h <- 0 until 4; i <- 1 to 5
    } yield (t, h, (h * 10 + i).toDouble)

    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = StreamIngest.readFileStream(spark, in, schema)
      StreamStats.meanStream(wh, "profile", stream, Seq("event_type", "hour"),
        "value", checkpoint = ckpt).awaitTermination()
    }

    val (w1, w2) = data.splitAt(25)
    w1.toDF("event_type", "hour", "value")
      .coalesce(1).write.mode("append").parquet(in)
    drain()
    w2.toDF("event_type", "hour", "value")
      .coalesce(1).write.mode("append").parquet(in)
    drain()

    val got = StreamStats.currentMeans(wh, "profile", Seq("event_type", "hour"))
      .as[(String, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val exp = data.groupBy(d => (d._1, d._2)).map { case (k, vs) =>
      k -> ((vs.size.toLong, vs.map(_._3).sum / vs.size))
    }
    assert(got === exp) // n=5 per cell; means exact
  }

  test("streamed HLL partials union ≡ identically-batched union; estimate in bound") {
    val wh = new Warehouse(spark, Files.createTempDirectory("sh_wh").toString)
    val in = Files.createTempDirectory("sh_in").toString
    val ckpt = Files.createTempDirectory("sh_ckpt").toString
    // two groups; overlapping keys across waves so union ≠ sum
    val w1 = (0 until 400).map(i => ("a", i.toLong)) ++
      (0 until 150).map(i => ("b", i.toLong))
    val w2 = (200 until 600).map(i => ("a", i.toLong)) ++
      (100 until 300).map(i => ("b", i.toLong))

    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = StreamIngest.readFileStream(spark, in, schema)
      StreamStats.hllStream(wh, "card", stream, Seq("g"), "k",
        checkpoint = ckpt).awaitTermination()
    }
    w1.toDF("g", "k").coalesce(1).write.mode("append").parquet(in)
    drain()
    w2.toDF("g", "k").coalesce(1).write.mode("append").parquet(in)
    drain()

    val got = StreamStats.currentDistinct(wh, "card", Seq("g"))
      .as[(String, Long)].collect().toMap

    // batch twin with the SAME wave partition: per-wave sketches unioned
    val batchTwin = Seq(w1, w2).zipWithIndex
      .map { case (w, i) => w.toDF("g", "k").withColumn("b", lit(i)) }
      .reduce(_ unionByName _)
      .groupBy($"g", $"b")
      .agg(call_function("hll_sketch_agg", $"k", lit(12)).as("sk"))
      .groupBy($"g")
      .agg(call_function("hll_sketch_estimate",
        call_function("hll_union_agg", $"sk")).as("est"))
      .as[(String, Long)].collect().toMap
    assert(got === batchTwin) // sketch-level parity, exact

    val exact = (w1 ++ w2).groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    got.foreach { case (g, est) =>
      assert(math.abs(est - exact(g)).toDouble <= 0.05 * exact(g),
        s"group $g: est $est vs exact ${exact(g)}")
    }

    drain() // nothing new: partials unchanged
    assert(wh.read(StreamStats.hllTable("card")).count() === 4)
  }
}
