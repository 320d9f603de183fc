package graft.streaming

import graft.SparkSpec
import graft.store.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Stream ≡ batch parity for the stream-stream interval join: clicks
  * and purchases fed through file streams in waves must attribute
  * exactly like the static interval join over the full data — with
  * cross-micro-batch matches (a purchase arriving a wave after its
  * click) and watermark-late drops exercised explicitly.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // clicks: (click_id, user_id, ts); purchases: (purchase_id, user_id, ts)
  private val clicksW1 = Seq(
    (1L, 10L, "2024-01-01 10:00:00"),
    (2L, 11L, "2024-01-01 10:05:00"),
    (3L, 12L, "2024-01-01 10:10:00"))
  private val purchasesW1 = Seq(
    (100L, 10L, "2024-01-01 10:04:00"), // matches click 1 (+4 min)
    (101L, 12L, "2024-01-01 10:09:00")) // BEFORE click 3 → no match
  private val clicksW2 = Seq(
    (4L, 13L, "2024-01-01 10:30:00"))
  private val purchasesW2 = Seq(
    (102L, 11L, "2024-01-01 10:12:00"), // matches click 2 ACROSS waves
    (103L, 13L, "2024-01-01 10:39:00"), // matches click 4 (+9 min)
    (104L, 10L, "2024-01-01 10:20:00")) // click 1 +20 min → outside span

  private def writeWave(dir: String, rows: Seq[(Long, Long, String)],
      idName: String): Unit =
    rows.toDF(idName, "user_id", "s")
      .select(col(idName), col("user_id"), to_timestamp(col("s")).as("ts"))
      .coalesce(1).write.mode("append").parquet(dir)

  private def staticDf(rows: Seq[(Long, Long, String)], idName: String): DataFrame =
    rows.toDF(idName, "user_id", "s")
      .select(col(idName), col("user_id"), to_timestamp(col("s")).as("ts"))

  test("streamed waves ≡ static interval join, including cross-wave matches") {
    val wh = new Warehouse(spark, Files.createTempDirectory("sj_wh").toString)
    val cDir = Files.createTempDirectory("sj_c").toString
    val pDir = Files.createTempDirectory("sj_p").toString
    val ckpt = Files.createTempDirectory("sj_ckpt").toString

    def drain(): Unit = {
      val cs = spark.read.parquet(cDir).schema
      val ps = spark.read.parquet(pDir).schema
      val joined = StreamJoin.intervalJoin(
        StreamIngest.readFileStream(spark, cDir, cs),
        StreamIngest.readFileStream(spark, pDir, ps),
        key = "user_id", leftTime = "ts", rightTime = "ts",
        span = "10 minutes", delay = "2 hours")
      StreamJoin.intervalJoinStream(wh, "attributed", joined,
        "l_click_id", "r_purchase_id", ckpt).awaitTermination()
    }

    writeWave(cDir, clicksW1, "click_id")
    writeWave(pDir, purchasesW1, "purchase_id")
    drain()
    def sink(): Set[(Long, Long)] = wh.read("attributed")
      .select(col("l_click_id"), col("r_purchase_id"))
      .as[(Long, Long)].collect().toSet
    assert(sink() === Set((1L, 100L)))

    writeWave(cDir, clicksW2, "click_id")
    writeWave(pDir, purchasesW2, "purchase_id")
    drain()
    val streamed = sink()

    val c = staticDf(clicksW1 ++ clicksW2, "click_id")
    val p = staticDf(purchasesW1 ++ purchasesW2, "purchase_id")
    val batch = c.alias("c").join(p.alias("p"),
        col("c.user_id") === col("p.user_id") &&
          col("p.ts") >= col("c.ts") &&
          col("p.ts") <= col("c.ts") + expr("INTERVAL 10 minutes"))
      .select(col("c.click_id"), col("p.purchase_id"))
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch, s"stream $streamed != batch $batch")
    assert(streamed === Set((1L, 100L), (2L, 102L), (4L, 103L)))
  }

  test("replay with no new files adds nothing") {
    val wh = new Warehouse(spark, Files.createTempDirectory("sj_wh2").toString)
    val cDir = Files.createTempDirectory("sj_c2").toString
    val pDir = Files.createTempDirectory("sj_p2").toString
    val ckpt = Files.createTempDirectory("sj_ckpt2").toString
    writeWave(cDir, clicksW1, "click_id")
    writeWave(pDir, purchasesW1, "purchase_id")
    def drain(): Unit = {
      val cs = spark.read.parquet(cDir).schema
      val ps = spark.read.parquet(pDir).schema
      val joined = StreamJoin.intervalJoin(
        StreamIngest.readFileStream(spark, cDir, cs),
        StreamIngest.readFileStream(spark, pDir, ps),
        key = "user_id", leftTime = "ts", rightTime = "ts",
        span = "10 minutes", delay = "2 hours")
      StreamJoin.intervalJoinStream(wh, "attributed", joined,
        "l_click_id", "r_purchase_id", ckpt).awaitTermination()
    }
    drain()
    val first = wh.read("attributed").count()
    drain()
    assert(wh.read("attributed").count() === first)
  }

  test("rows later than the watermark are dropped from the join state") {
    val wh = new Warehouse(spark, Files.createTempDirectory("sj_wh3").toString)
    val cDir = Files.createTempDirectory("sj_c3").toString
    val pDir = Files.createTempDirectory("sj_p3").toString
    val ckpt = Files.createTempDirectory("sj_ckpt3").toString
    def drain(delay: String): Unit = {
      val cs = spark.read.parquet(cDir).schema
      val ps = spark.read.parquet(pDir).schema
      val joined = StreamJoin.intervalJoin(
        StreamIngest.readFileStream(spark, cDir, cs),
        StreamIngest.readFileStream(spark, pDir, ps),
        key = "user_id", leftTime = "ts", rightTime = "ts",
        span = "10 minutes", delay = delay)
      StreamJoin.intervalJoinStream(wh, "attributed", joined,
        "l_click_id", "r_purchase_id", ckpt).awaitTermination()
    }
    // wave 1 pushes the watermark to ~10:00 with a tight 1-minute delay
    writeWave(cDir, Seq((1L, 10L, "2024-01-01 10:00:00"),
      (9L, 99L, "2024-01-01 12:00:00")), "click_id")
    writeWave(pDir, Seq((900L, 99L, "2024-01-01 12:01:00")), "purchase_id")
    drain("1 minute")
    // wave 2: a purchase matching click 1 but hours behind the
    // watermark — the state store must have evicted click 1
    writeWave(pDir, Seq((100L, 10L, "2024-01-01 10:04:00")), "purchase_id")
    drain("1 minute")
    val got = wh.read("attributed")
      .select(col("l_click_id"), col("r_purchase_id"))
      .as[(Long, Long)].collect().toSet
    assert(got === Set((9L, 900L)))
  }
}
