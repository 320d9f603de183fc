package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Stream-static enrichment and streaming heavy hitters. */
class StreamEnrichSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeBatch(dir: String,
      rows: Seq[(Timestamp, String, Double)]): Unit =
    rows.toDF("ts", "entity", "value").coalesce(1)
      .write.mode("append").parquet(dir)

  test("enrichStream decorates micro-batches from a broadcast dimension") {
    val in = Files.createTempDirectory("enrich_in").toString
    writeBatch(in, Seq(
      (ts("2024-01-01 00:00:00"), "a", 1.0),
      (ts("2024-01-01 00:10:00"), "b", 2.0),
      (ts("2024-01-01 00:20:00"), "zz", 3.0))) // no dim row
    val dim = Seq(("a", "alpha"), ("b", "beta"), ("c", "gamma"))
      .toDF("entity", "label")
    val schema = spark.read.parquet(in).schema
    val stream = StreamIngest.readFileStream(spark, in, schema)
    val rows = StreamIngest.runToMemory(spark,
      StreamIngest.enrichStream(stream, dim, Seq("entity")), "enrich_t")
    // inner join semantics, batch parity
    assert(rows.map(r => (r.getAs[String]("entity"), r.getAs[String]("label")))
      .toSet === Set("a" -> "alpha", "b" -> "beta"))
    // the static side must ride a broadcast, not force a stream shuffle
    // (assert on the batch twin of the same plan shape)
    val joined = StreamIngest.enrichStream(
      spark.read.parquet(in), dim, Seq("entity"))
    assert(joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("left-outer interval join emits unmatched lefts once the watermark finalizes them") {
    val evDir = Files.createTempDirectory("ssjo_ev").toString
    val sgDir = Files.createTempDirectory("ssjo_sg").toString
    // batch 1 file: one matched event (a), one unmatched (b)
    writeBatch(evDir, Seq(
      (ts("2024-01-01 10:30:00"), "a", 1.0),
      (ts("2024-01-01 10:30:00"), "b", 3.0)))
    // batch 2 file: far-future sentinel pushes the watermark past b's slot
    writeBatch(evDir, Seq((ts("2024-01-02 00:00:00"), "zz", 0.0)))
    Seq((ts("2024-01-01 10:00:00"), "a"),
      (ts("2024-01-02 00:00:00"), "zz"))
      .toDF("r_ts", "r_entity").coalesce(1).write.mode("append").parquet(sgDir)
    val evSchema = spark.read.parquet(evDir).schema
    val sgSchema = spark.read.parquet(sgDir).schema
    // one file per trigger so the sentinel advances the watermark in a
    // LATER micro-batch (outer results only finalize between batches)
    val joined = StreamIngest.streamIntervalJoinLeftOuter(
      StreamIngest.readFileStream(spark, evDir, evSchema,
        maxFilesPerTrigger = 1),
      StreamIngest.readFileStream(spark, sgDir, sgSchema,
        maxFilesPerTrigger = 1),
      leftTime = "ts", rightTime = "r_ts",
      keyExpr = "entity = r_entity", lookback = "1 hour",
      watermark = "10 minutes")
    val rows = StreamIngest.runToMemory(spark, joined, "ssjo_t")
      .map(r => (r.getAs[String]("entity"),
        Option(r.getAs[String]("r_entity")))).toSet
    assert(rows.contains(("a", Some("a"))), s"matched pair missing: $rows")
    assert(rows.contains(("b", None)), s"unmatched left not emitted: $rows")
  }

  test("windowedTopK: Space-Saving state per window, exact when keys fit") {
    val in = Files.createTempDirectory("topk_in").toString
    // window 1: a×3, b×2, c×1 ; window 2: b×2, c×1 ; late row advances watermark
    writeBatch(in, Seq(
      (ts("2024-01-01 00:01:00"), "a", 0), (ts("2024-01-01 00:02:00"), "a", 0),
      (ts("2024-01-01 00:03:00"), "a", 0), (ts("2024-01-01 00:04:00"), "b", 0),
      (ts("2024-01-01 00:05:00"), "b", 0), (ts("2024-01-01 00:06:00"), "c", 0),
      (ts("2024-01-01 01:01:00"), "b", 0), (ts("2024-01-01 01:02:00"), "b", 0),
      (ts("2024-01-01 01:03:00"), "c", 0),
      (ts("2024-01-01 09:00:00"), "x", 0)).map { case (t, e, v) => (t, e, v.toDouble) })
    val schema = spark.read.parquet(in).schema
    val stream = StreamIngest.readFileStream(spark, in, schema)
    val rows = StreamIngest.runToMemory(spark,
      StreamIngest.windowedTopK(stream, "ts", "entity", k = 8,
        windowLen = "1 hour", watermarkDelay = "10 minutes"), "topk_t")
    val byWindow = rows.groupBy(_.getAs[Timestamp]("window_start"))
    val w1 = byWindow(ts("2024-01-01 00:00:00"))
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("est")).toMap
    val w2 = byWindow(ts("2024-01-01 01:00:00"))
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("est")).toMap
    // k=8 > 3 distinct keys -> no eviction -> estimates are exact counts
    assert(w1 === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    assert(w2 === Map("b" -> 2L, "c" -> 1L))
    assert(rows.forall(_.getAs[Long]("err") === 0L))
  }

  test("windowedTopK fails fast with a clear message without GraftExtensions") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    // a sibling session whose registry lacks the native function —
    // the shape of a session built without GraftExtensions
    val bare = spark.newSession()
    bare.sessionState.functionRegistry
      .dropFunction(FunctionIdentifier("space_saving_topk"))
    val df = bare.range(1).selectExpr(
      "timestamp'2024-01-01 00:00:00' AS ts", "'k' AS entity")
    val err = intercept[IllegalArgumentException] {
      StreamIngest.windowedTopK(df, "ts", "entity", k = 4)
    }
    assert(err.getMessage.contains("GraftExtensions"),
      s"unhelpful error: ${err.getMessage}")
  }
}
