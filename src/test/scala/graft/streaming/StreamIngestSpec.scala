package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeBatch(dir: String, name: String,
      rows: Seq[(Timestamp, String, Double)]): Unit =
    rows.toDF("ts", "entity", "value").coalesce(1)
      .write.mode("append").parquet(dir)

  test("file-stream ingest with AvailableNow processes all pending files") {
    val in = Files.createTempDirectory("stream_in").toString
    val out = Files.createTempDirectory("stream_out").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString
    writeBatch(in, "b1", Seq(
      (ts("2024-01-01 00:00:00"), "a", 1.0),
      (ts("2024-01-01 00:10:00"), "b", 2.0)))
    val schema = spark.read.parquet(in).schema
    val stream = StreamIngest.readFileStream(spark, in, schema)
    StreamIngest.ingestAvailableNow(stream, out, ckpt)
    assert(spark.read.parquet(out).count() === 2)

    // second batch lands; re-run picks up ONLY the new file (checkpoint)
    writeBatch(in, "b2", Seq((ts("2024-01-01 00:20:00"), "c", 3.0)))
    val stream2 = StreamIngest.readFileStream(spark, in, schema)
    StreamIngest.ingestAvailableNow(stream2, out, ckpt)
    assert(spark.read.parquet(out).count() === 3)
  }

  test("dedupStream drops duplicate keys within the watermark") {
    val in = Files.createTempDirectory("dedup_in").toString
    writeBatch(in, "b", Seq(
      (ts("2024-01-01 00:00:00"), "a", 1.0),
      (ts("2024-01-01 00:00:00"), "a", 99.0), // dup key (ts, entity)
      (ts("2024-01-01 00:05:00"), "a", 2.0)))
    val schema = spark.read.parquet(in).schema
    val stream = StreamIngest.readFileStream(spark, in, schema)
    val deduped = StreamIngest.dedupStream(stream, "ts", Seq("ts", "entity"))
    val rows = StreamIngest.runToMemory(spark, deduped, "dedup_t")
    assert(rows.length === 2)
  }

  test("windowedAgg emits finalized tumbling windows") {
    val in = Files.createTempDirectory("win_in").toString
    writeBatch(in, "b", Seq(
      (ts("2024-01-01 00:10:00"), "a", 1.0),
      (ts("2024-01-01 00:20:00"), "a", 2.0),
      (ts("2024-01-01 01:10:00"), "a", 4.0),
      (ts("2024-01-01 05:00:00"), "a", 0.0))) // advances watermark
    val schema = spark.read.parquet(in).schema
    val stream = StreamIngest.readFileStream(spark, in, schema)
    val agg = StreamIngest.windowedAgg(stream, "ts", "entity", "value",
      "1 hour", "30 minutes")
    val rows = StreamIngest.runToMemory(spark, agg, "win_t")
      .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value")))
    val byWindow = rows.map(r => r._1.toString -> ((r._2, r._3))).toMap
    assert(byWindow("2024-01-01 00:00:00.0") === ((2L, 3.0)))
    assert(byWindow("2024-01-01 01:00:00.0") === ((1L, 4.0)))
  }

  test("flatMapGroupsWithState running totals accumulate across batches") {
    implicit val s = spark
    val in = Files.createTempDirectory("st_in").toString
    val ckpt = Files.createTempDirectory("st_ck").toString
    writeBatch(in, "b1", Seq(
      (ts("2024-01-01 00:00:00"), "a", 30.0),
      (ts("2024-01-01 00:01:00"), "a", 30.0),
      (ts("2024-01-01 00:02:00"), "b", 10.0)))
    val out = Files.createTempDirectory("st_out").toString
    val schema = spark.read.parquet(in).schema

    // memory sink can't recover from a checkpoint — parquet sink keeps
    // the cross-run state story honest
    def runOnce(): Unit = {
      val stream = StreamIngest.readFileStream(spark, in, schema)
      val updates = StreamIngest.runningTotals(
        stream.toDF(), "entity", "value", threshold = 50.0)
      val q = updates.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def updates() = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toSet

    runOnce()
    assert(updates() === Set(("a", 60.0, 2L, 1L), ("b", 10.0, 1L, 0L)))

    // second batch: state persists via the checkpoint; totals accumulate
    writeBatch(in, "b2", Seq((ts("2024-01-01 00:03:00"), "b", 45.0)))
    runOnce()
    assert(updates().contains(("b", 55.0, 2L, 1L))) // crossed 50 now
  }

  test("finalizedSessions closes sessions via event-time timeout across checkpointed runs") {
    implicit val s = spark
    val in = Files.createTempDirectory("fs_in").toString
    val ckpt = Files.createTempDirectory("fs_ck").toString
    val out = Files.createTempDirectory("fs_out").toString
    val gapMs = 30L * 60 * 1000

    def runOnce(schema: org.apache.spark.sql.types.StructType): Unit = {
      val stream = StreamIngest.readFileStream(spark, in, schema)
      val sessions = StreamIngest.finalizedSessions(
        stream.toDF(), "ts", "entity", gapMs)
      val q = sessions.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def finalized() = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // run 1: one open session for `a` — nothing finalizes (watermark
    // hasn't passed end+gap)
    writeBatch(in, "b1", Seq(
      (ts("2024-01-01 10:00:00"), "a", 1.0),
      (ts("2024-01-01 10:05:00"), "a", 1.0)))
    val schema = spark.read.parquet(in).schema
    runOnce(schema)
    assert(finalized().isEmpty, finalized().toString)

    // run 2: a much later event for `b` pushes the watermark past
    // a's session end + gap → a's session finalizes via timeout
    writeBatch(in, "b2", Seq((ts("2024-01-01 12:00:00"), "b", 1.0)))
    runOnce(schema)
    val f = finalized()
    assert(f.exists { case (e, start, end, n) =>
      e == "a" && n == 2L &&
        start == ts("2024-01-01 10:00:00").getTime &&
        end == ts("2024-01-01 10:05:00").getTime
    }, f.toString)
    // b's session is still open
    assert(!f.exists(_._1 == "b"))

    // in-batch gap split also finalizes the earlier session directly
    writeBatch(in, "b3", Seq(
      (ts("2024-01-01 15:00:00"), "b", 1.0))) // >gap after 12:00 for b
    runOnce(schema)
    assert(finalized().exists { case (e, _, _, n) => e == "b" && n == 1L })
  }

  test("finalizedSessions never regresses session bounds on out-of-order events") {
    implicit val s = spark
    val in = Files.createTempDirectory("fo_in").toString
    val ckpt = Files.createTempDirectory("fo_ck").toString
    val out = Files.createTempDirectory("fo_out").toString
    val gapMs = 30L * 60 * 1000

    def runOnce(schema: org.apache.spark.sql.types.StructType): Unit = {
      val stream = StreamIngest.readFileStream(spark, in, schema)
      // 2h watermark delay: later batches may legitimately deliver
      // events older than the open session's current end
      val sessions = StreamIngest.finalizedSessions(
        stream.toDF(), "ts", "entity", gapMs, watermarkDelay = "2 hours")
      val q = sessions.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writeBatch(in, "b1", Seq(
      (ts("2024-01-01 10:00:00"), "a", 1.0),
      (ts("2024-01-01 10:20:00"), "a", 1.0)))
    val schema = spark.read.parquet(in).schema
    runOnce(schema)
    // run 2: out-of-order event INSIDE the open session (t < endMs,
    // above watermark 08:20) — must merge without moving end backwards
    writeBatch(in, "b2", Seq((ts("2024-01-01 10:10:00"), "a", 1.0)))
    runOnce(schema)
    // run 3: far-future event finalizes a's session via timeout
    writeBatch(in, "b3", Seq((ts("2024-01-02 00:00:00"), "b", 1.0)))
    runOnce(schema)

    val f = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(f.exists { case (e, start, end, n) =>
      e == "a" && n == 3L &&
        start == ts("2024-01-01 10:00:00").getTime &&
        end == ts("2024-01-01 10:20:00").getTime
    }, f.toString)
  }

  test("upsertStream lands stream batches in the warehouse idempotently") {
    import graft.store.Warehouse
    val in = Files.createTempDirectory("ups_in").toString
    val ckpt = Files.createTempDirectory("ups_ck").toString
    val wh = new Warehouse(spark,
      Files.createTempDirectory("ups_wh").toString)

    writeBatch(in, "b1", Seq(
      (ts("2024-01-01 00:00:00"), "a", 1.0),
      (ts("2024-01-01 00:10:00"), "b", 2.0)))
    val schema = spark.read.parquet(in).schema
    def runOnce(): Unit = StreamIngest.upsertStream(
      StreamIngest.readFileStream(spark, in, schema),
      wh, "events_t", keys = Seq("ts", "entity"), timeCol = Some("ts"),
      checkpoint = ckpt)

    runOnce()
    assert(wh.read("events_t").count() === 2)
    // second run with one overlapping key and one new: only the new
    // row lands (row-level idempotency through Loader.dedupAppend)
    writeBatch(in, "b2", Seq(
      (ts("2024-01-01 00:10:00"), "b", 99.0), // dup key (ts, entity)
      (ts("2024-01-01 00:20:00"), "c", 3.0)))
    runOnce()
    assert(wh.read("events_t").count() === 3)
    // the upserted table is a real warehouse table: date-partitioned,
    // keyed meta recorded
    assert(wh.readMeta("events_t").exists(_.uniqueKeys === Seq("ts", "entity")))
    assert(wh.readRaw("events_t").columns.contains(Warehouse.DerivedDateCol))
  }

  test("mergeStream applies CDC update-or-insert with latest-per-key wins") {
    import graft.store.Warehouse
    val in = Files.createTempDirectory("mrg_in").toString
    val ckpt = Files.createTempDirectory("mrg_ck").toString
    val wh = new Warehouse(spark,
      Files.createTempDirectory("mrg_wh").toString)

    // batch 1 carries an intra-batch update sequence for 'a': the
    // later value must win within the same micro-batch
    writeBatch(in, "b1", Seq(
      (ts("2024-01-01 00:00:00"), "a", 1.0),
      (ts("2024-01-01 00:05:00"), "a", 5.0),
      (ts("2024-01-01 00:10:00"), "b", 2.0)))
    val schema = spark.read.parquet(in).schema
    def runOnce(): Unit = StreamIngest.mergeStream(
      StreamIngest.readFileStream(spark, in, schema),
      wh, "state_t", keys = Seq("entity"), timeCol = Some("ts"),
      checkpoint = ckpt)

    runOnce()
    val after1 = wh.read("state_t").select("entity", "value")
      .as[(String, Double)].collect().sorted.toSeq
    assert(after1 === Seq(("a", 5.0), ("b", 2.0)))

    // batch 2 updates 'b' and inserts 'c' — update-or-insert, not
    // insert-if-absent
    writeBatch(in, "b2", Seq(
      (ts("2024-01-02 00:00:00"), "b", 99.0),
      (ts("2024-01-02 00:00:00"), "c", 3.0)))
    runOnce()
    val after2 = wh.read("state_t").select("entity", "value")
      .as[(String, Double)].collect().sorted.toSeq
    assert(after2 === Seq(("a", 5.0), ("b", 99.0), ("c", 3.0)))
    // entity-keyed CDC with advancing timestamps → unpartitioned table
    assert(wh.readMeta("state_t").exists(m =>
      m.partitionBy.isEmpty && m.uniqueKeys === Seq("entity")))
  }

  test("streamIntervalJoin pairs events with recent same-entity signups only") {
    val evDir = Files.createTempDirectory("ssj_ev").toString
    val sgDir = Files.createTempDirectory("ssj_sg").toString
    writeBatch(evDir, "b", Seq(
      (ts("2024-01-01 10:30:00"), "a", 1.0),   // 30m after a's signup → match
      (ts("2024-01-01 13:00:00"), "a", 2.0),   // 3h after → outside lookback
      (ts("2024-01-01 10:30:00"), "b", 3.0)))  // no signup for b
    Seq((ts("2024-01-01 10:00:00"), "a"))
      .toDF("r_ts", "r_entity").coalesce(1).write.mode("append").parquet(sgDir)

    val evSchema = spark.read.parquet(evDir).schema
    val sgSchema = spark.read.parquet(sgDir).schema
    val joined = StreamIngest.streamIntervalJoin(
      StreamIngest.readFileStream(spark, evDir, evSchema),
      StreamIngest.readFileStream(spark, sgDir, sgSchema),
      leftTime = "ts", rightTime = "r_ts",
      keyExpr = "entity = r_entity", lookback = "1 hour")
    val rows = StreamIngest.runToMemory(spark, joined, "ssj_t")
      .map(r => (r.getAs[String]("entity"), r.getAs[Double]("value")))
    assert(rows.toSeq === Seq(("a", 1.0)))
  }

  test("sessionAgg groups by inactivity gap") {
    val in = Files.createTempDirectory("sess_in").toString
    writeBatch(in, "b", Seq(
      (ts("2024-01-01 00:00:00"), "a", 1.0),
      (ts("2024-01-01 00:10:00"), "a", 1.0),  // same session (10m gap)
      (ts("2024-01-01 02:00:00"), "a", 1.0),  // new session (>30m gap)
      (ts("2024-01-01 06:00:00"), "a", 0.0))) // watermark push
    val schema = spark.read.parquet(in).schema
    val stream = StreamIngest.readFileStream(spark, in, schema)
    val sess = StreamIngest.sessionAgg(stream, "ts", "entity",
      "30 minutes", "30 minutes")
    val rows = StreamIngest.runToMemory(spark, sess, "sess_t")
    // closed sessions: the 2-event session and the 1-event session
    val closed = rows.map(r => r.getAs[Long]("n_events")).sorted
    assert(closed.contains(2L))
  }
}
