package graft.streaming

import graft.SparkSpec
import graft.store.Warehouse
import graft.transform.TemporalJoins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Stream ≡ batch parity for the as-of enrichment stream: the same
  * events fed through micro-batches against a static versioned
  * dimension must produce exactly the rows the batch as-of join
  * produces over the full event set — plus replay stability.
  */
class StreamEnrichSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val dim = Seq(
    // user 1: three versions; user 2: one; user 3: none (null enrich)
    (1L, ts("2024-01-01 00:00:00"), "bronze"),
    (1L, ts("2024-01-10 00:00:00"), "silver"),
    (1L, ts("2024-01-20 00:00:00"), "gold"),
    (2L, ts("2024-01-05 00:00:00"), "bronze")
  ).toDF("user_id", "vts", "tier")

  private val batch1 = Seq(
    (100L, 1L, "2024-01-03 12:00:00", 10.0), // → bronze
    (101L, 1L, "2024-01-10 00:00:00", 11.0), // boundary: inclusive → silver
    (102L, 2L, "2024-01-02 00:00:00", 12.0)) // before any version → null
  private val batch2 = Seq(
    (200L, 1L, "2024-01-25 00:00:00", 20.0), // → gold
    (201L, 2L, "2024-02-01 00:00:00", 21.0), // → bronze
    (202L, 3L, "2024-01-15 00:00:00", 22.0)) // keyless user → null

  private def toEvents(rows: Seq[(Long, Long, String, Double)]): DataFrame =
    rows.toDF("event_id", "user_id", "ts_s", "value")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("ts_s")).as("ts"), col("value"))

  private def collectSink(wh: Warehouse): Set[(Long, Long, Option[String])] =
    wh.read("enriched")
      .select(col("event_id"), col("user_id"), col("asof_tier"))
      .as[(Long, Long, Option[String])].collect().toSet

  test("streamed micro-batches ≡ batch asofJoinBackward over all events") {
    val wh = new Warehouse(spark, Files.createTempDirectory("se_wh").toString)
    val in = Files.createTempDirectory("se_in").toString
    val ckpt = Files.createTempDirectory("se_ckpt").toString

    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamEnrich.asofStream(wh, "enriched",
        StreamIngest.readFileStream(spark, in, schema), dim,
        keys = Seq("user_id"), idCol = "event_id",
        leftTime = "ts", rightTime = "vts", payload = Seq("tier"),
        checkpoint = ckpt).awaitTermination()
    }

    toEvents(batch1).coalesce(1).write.mode("append").parquet(in)
    drain()
    assert(collectSink(wh) === Set(
      (100L, 1L, Some("bronze")), (101L, 1L, Some("silver")),
      (102L, 2L, None)))

    toEvents(batch2).coalesce(1).write.mode("append").parquet(in)
    drain()
    val streamed = collectSink(wh)

    val batch = TemporalJoins.asofJoinBackward(
      toEvents(batch1 ++ batch2), dim, Seq("user_id"), "ts", "vts",
      Seq("tier"), tiebreakCols = Seq("vts"))
      .select(col("event_id"), col("user_id"), col("asof_tier"))
      .as[(Long, Long, Option[String])].collect().toSet
    assert(streamed === batch, s"stream $streamed != batch $batch")

    // full output schema carries the original row + prefixed payload
    assert(wh.read("enriched").columns.sorted ===
      Array("asof_tier", "asof_vts", "event_id", "ts", "user_id", "value"))
  }

  test("replay with same checkpoint and no new files adds nothing") {
    val wh = new Warehouse(spark, Files.createTempDirectory("se_wh2").toString)
    val in = Files.createTempDirectory("se_in2").toString
    val ckpt = Files.createTempDirectory("se_ckpt2").toString
    toEvents(batch1).coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def drain(): Unit =
      StreamEnrich.asofStream(wh, "enriched",
        StreamIngest.readFileStream(spark, in, schema), dim,
        keys = Seq("user_id"), idCol = "event_id",
        leftTime = "ts", rightTime = "vts", payload = Seq("tier"),
        checkpoint = ckpt).awaitTermination()
    drain()
    val first = collectSink(wh)
    drain() // no new files
    assert(collectSink(wh) === first)
    assert(wh.read("enriched").count() === 3L)
  }

  test("re-delivered batch after checkpoint loss inserts no duplicate rows") {
    val wh = new Warehouse(spark, Files.createTempDirectory("se_wh3").toString)
    val in = Files.createTempDirectory("se_in3").toString
    toEvents(batch1).coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    // two runs with FRESH checkpoints: the second re-delivers batch1
    // whole; the keyed-idempotent append must drop every row
    for (_ <- 1 to 2)
      StreamEnrich.asofStream(wh, "enriched",
        StreamIngest.readFileStream(spark, in, schema), dim,
        keys = Seq("user_id"), idCol = "event_id",
        leftTime = "ts", rightTime = "vts", payload = Seq("tier"),
        checkpoint = Files.createTempDirectory("se_ckpt3").toString)
        .awaitTermination()
    assert(wh.read("enriched").count() === 3L)
  }
}
