package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.Warehouse

/** Incremental model fitting over a stream: per-group OLS trend via
  * ADDITIVE sufficient statistics — the streaming twin of
  * `q_trend_ols`. Each micro-batch contributes one partial-statistics
  * row per group (n, Σx, Σy, Σxx, Σxy as exact decimals), partitioned
  * by batch_id; the current model is one aggregate over the partials.
  *
  * Exactness: decimal sums commute and associate, so ANY batching of
  * the input yields bit-identical statistics to the one-shot batch
  * computation; the final slope/intercept division happens in double
  * on those exact sums, so stream ≡ batch parity is exact.
  *
  * Replay safety — per batch AND across checkpoint loss — rides one
  * invariant: every delivered batch first deletes all partitions with
  * `batch_id >=` ITS OWN id, then appends its partials.
  *  - Surviving checkpoint: a re-delivered batch N deletes only its
  *    own partition (nothing above N can exist — the sink is at most
  *    one batch ahead of the checkpoint), so a crash between delete
  *    and append, or a retried foreachBatch, never double-counts.
  *  - Checkpoint LOSS: the restarted query re-reads the retained
  *    source from scratch with ids restarting at 0 — batch 0's
  *    `>= 0` delete clears the whole sink, and the re-delivery
  *    rebuilds the partials exactly; decimal additivity makes the
  *    recovered model BIT-match the batch computation (proven in
  *    StreamStatsSpec). Recovery is a replay of retained input, not a
  *    redesign — parity with the StreamSample/StreamTopK durable
  *    sinks.
  * State is O(groups) rows per batch in the warehouse — no streaming
  * state store.
  */
object StreamStats {

  /** Sink table holding per-(group, batch) partial statistics. */
  def statsTable(name: String): String = s"${name}__ols_partials"

  /** Fold a stream of (group, x, y) rows into the partials table. */
  def olsStream(wh: Warehouse, name: String, rows: DataFrame,
      groupCol: String, xCol: String, yCol: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val sink = statsTable(name)
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val part = batch
          .select(col(groupCol).as("g"),
            col(xCol).cast("long").as("x"), col(yCol).as("y"))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast("decimal(38,0)")).as("sx"),
            sum(col("y").cast("decimal(20,4)")).as("sy"),
            sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
            sum((col("x") * col("y")).cast("decimal(30,4)")).as("sxy"))
          .withColumn("batch_id", lit(batchId))
        if (!wh.tableExists(sink))
          wh.createTable(sink, part.schema, ifExists = "skip",
            partitionBy = Seq("batch_id"))
        graft.store.RebuildGuard.checkSinkWipe(batch.sparkSession, wh,
          sink, batchId, "StreamStats")
        wh.deleteWhere(sink, col("batch_id") >= batchId)
        wh.append(sink, part)
        ()
      }
      .start()
  }

  /** The current fitted model: merge all partials (exact decimal
    * sums), then the same closed-form slope/intercept as the batch
    * query. Output: (g, n, slope, intercept). */
  def currentModel(wh: Warehouse, name: String): DataFrame = {
    val merged = wh.read(statsTable(name))
      .groupBy(col("g"))
      .agg(sum(col("n")).as("n"),
        sum(col("sx")).cast("double").as("sx"),
        sum(col("sy")).cast("double").as("sy"),
        sum(col("sxx")).cast("double").as("sxx"),
        sum(col("sxy")).cast("double").as("sxy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    merged.select(col("g"), col("n"), slope.as("slope"),
      ((col("sy") - slope * col("sx")) / col("n")).as("intercept"))
  }

  /** Sink table for per-(group, batch) mean partials. */
  def meansTable(name: String): String = s"${name}__mean_partials"

  /** The seasonal-model streaming twin (q_forecast_baseline's trainer
    * kept continuously fresh): per-group (n, Σy) partials folded per
    * micro-batch under the same batch_id-partition replay idiom —
    * group on (event_type, hour-of-day) and [[currentMeans]] IS the
    * hourly-profile forecast model, updated as data arrives. Same
    * exactness argument as OLS: decimal additivity ⇒ any batching
    * yields the batch model bit-for-bit.
    */
  def meanStream(wh: Warehouse, name: String, rows: DataFrame,
      groupCols: Seq[String], yCol: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val sink = meansTable(name)
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val part = batch
          .groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).as("n"),
            sum(col(yCol).cast("decimal(20,4)")).as("sy"))
          .withColumn("batch_id", lit(batchId))
        if (!wh.tableExists(sink))
          wh.createTable(sink, part.schema, ifExists = "skip",
            partitionBy = Seq("batch_id"))
        graft.store.RebuildGuard.checkSinkWipe(batch.sparkSession, wh,
          sink, batchId, "StreamStats")
        wh.deleteWhere(sink, col("batch_id") >= batchId)
        wh.append(sink, part)
        ()
      }
      .start()
  }

  /** The current per-group means: (groupCols..., n, mean) — exactly
    * the batch model over everything streamed so far. */
  def currentMeans(wh: Warehouse, name: String,
      groupCols: Seq[String]): DataFrame =
    wh.read(meansTable(name))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sy")).as("sy"))
      .select(groupCols.map(col) ++ Seq(col("n"),
        (col("sy").cast("double") / col("n")).as("mean")): _*)

  /** Sink table for per-(group, batch) HLL sketch partials. */
  def hllTable(name: String): String = s"${name}__hll_partials"

  /** Streaming distinct-count via MERGEABLE HLL sketches — the stream
    * face of `q_hll_distinct`/`q_sketch_rollup`: each micro-batch
    * contributes one Datasketches-HLL binary per group (KB-sized
    * however many rows the batch held), under the same
    * batch_id-partition replay idiom as the OLS partials. The union of
    * sketch partials is associative and commutative, so ANY batching
    * of the input yields the same merged registers as the per-batch
    * union computed one-shot in batch — stream ≡ batch parity at the
    * SKETCH level (estimates agree exactly with the identically
    * partitioned batch union; vs a single one-shot sketch they agree
    * within the lgK error bound, the q_sketch_rollup coupon-promotion
    * caveat). State is O(groups · batches) KB-rows; readers never
    * rescan history — this is the day-summary pattern run
    * continuously.
    */
  def hllStream(wh: Warehouse, name: String, rows: DataFrame,
      groupCols: Seq[String], keyCol: String, checkpoint: String,
      lgK: Int = 12,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val sink = hllTable(name)
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val part = batch
          .groupBy(groupCols.map(col): _*)
          .agg(call_function("hll_sketch_agg", col(keyCol), lit(lgK))
            .as("sk"))
          .withColumn("batch_id", lit(batchId))
        if (!wh.tableExists(sink))
          wh.createTable(sink, part.schema, ifExists = "skip",
            partitionBy = Seq("batch_id"))
        graft.store.RebuildGuard.checkSinkWipe(batch.sparkSession, wh,
          sink, batchId, "StreamStats")
        wh.deleteWhere(sink, col("batch_id") >= batchId)
        wh.append(sink, part)
        ()
      }
      .start()
  }

  /** Current distinct estimate per group: union all sketch partials,
    * estimate once. Output: (groupCols..., est). */
  def currentDistinct(wh: Warehouse, name: String,
      groupCols: Seq[String]): DataFrame =
    wh.read(hllTable(name))
      .groupBy(groupCols.map(col): _*)
      .agg(call_function("hll_sketch_estimate",
        call_function("hll_union_agg", col("sk"))).as("est"))
}
