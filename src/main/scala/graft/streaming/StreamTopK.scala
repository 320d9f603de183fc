package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.Warehouse

/** Streaming heavy hitters — the stream face of `q_heavy_hitters`'
  * SpaceSaving aggregate, kept as a BOUNDED mergeable summary in the
  * warehouse (Agarwal et al., "Mergeable Summaries", PODS'12 §3: the
  * absent-key-charged-θ merge).
  *
  * State is one snapshot of at most `capacity` rows `(key, est, theta)`
  * — NOT per-batch partials, so the table stays O(capacity) however
  * long the stream runs. Each micro-batch:
  *
  *  1. exact per-key counts for the batch, truncated to the top
  *     `capacity` keys; θ_B = the (capacity+1)-th count (an upper
  *     bound on any dropped key's in-batch count, 0 if none dropped);
  *  2. merge with the previous snapshot (θ_A its stored theta):
  *     est' = (est_A or θ_A) + (cnt_B or θ_B) over the key union —
  *     a key missing from one side is charged that side's bound, so
  *     the overestimate invariant `est ≥ true` survives truncation;
  *  3. keep the top `capacity` by est'; θ' = max(θ_A + θ_B,
  *     (capacity+1)-th merged est), so every dropped or never-seen
  *     key has true count ≤ θ'.
  *
  * Guarantees (spec-proven): est ≥ true for every surviving key;
  * est − true ≤ θ; any key with true count > θ is IN the summary; and
  * a key that survives every per-batch truncation and every merge is
  * counted EXACTLY. All merge work is bounded by 2·capacity rows —
  * only the two θ scalars touch the driver.
  *
  * Replay: a retried batch first deletes its own snapshot partition,
  * then recomputes from the previous snapshot — idempotent under a
  * surviving checkpoint. History older than the previous snapshot is
  * pruned AFTER the append (the previous one is kept so a retry of the
  * in-flight batch always finds its input); a crash mid-append can
  * expose a partial newest snapshot until replay rewrites it, the same
  * exposure window as the other warehouse sinks.
  */
object StreamTopK {

  /** Sink table holding the bounded summary snapshots. */
  def summaryTable(name: String): String = s"${name}__topk_summary"

  /** Fold a stream of rows into the bounded top-k summary. */
  def topkStream(wh: Warehouse, name: String, rows: DataFrame,
      keyCol: String, capacity: Int, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(capacity > 0, "capacity must be positive")
    val sink = summaryTable(name)
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val exists = wh.tableExists(sink)
        // the fold base is the newest snapshot strictly BELOW this
        // batch id: under a live checkpoint that is simply the
        // previous batch (ids are monotonic); after checkpoint LOSS
        // the restarted query's batch 0 finds nothing below it and
        // rebuilds from scratch — stale snapshots must not seed the
        // re-delivered fold or every pre-loss row double-counts
        val prevId: Option[Long] =
          if (!exists) None
          else wh.read(sink).filter(col("batch_id") < batchId)
            .agg(max(col("batch_id"))).head() match {
              case r if r.isNullAt(0) => None
              case r => Some(r.getLong(0))
            }
        // clear this attempt's partial snapshot AND any stale
        // at-or-above history (the >= replay idiom)
        if (exists) {
          graft.store.RebuildGuard.checkSinkWipe(batch.sparkSession, wh,
            sink, batchId, "StreamTopK")
          wh.deleteWhere(sink, col("batch_id") >= batchId)
        }

        val prev: DataFrame = prevId match {
          case Some(id) => wh.read(sink)
            .filter(col("batch_id") === id)
            .select(col("key"), col("est"), col("theta"))
          case None => emptySummary(spark)
        }
        val thetaA: Long = prevId.map { _ =>
          prev.agg(max(col("theta"))).head().getLong(0)
        }.getOrElse(0L)

        // exact per-batch counts, truncated to capacity (+1 for θ_B)
        val counts = batch.select(col(keyCol).cast("string").as("key"))
          .groupBy("key").agg(count(lit(1)).as("cnt"))
        val topPlus = counts
          .orderBy(col("cnt").desc, col("key")).limit(capacity + 1)
          .cache()
        val nTop = topPlus.count()
        val thetaB: Long =
          if (nTop <= capacity) 0L
          else topPlus.agg(min(col("cnt"))).head().getLong(0)
        val bTop = topPlus.orderBy(col("cnt").desc, col("key")).limit(capacity)

        // absent-key-charged merge over the key union (≤ 2·capacity rows)
        val merged = prev.join(bTop, Seq("key"), "full_outer")
          .select(col("key"),
            (coalesce(col("est"), lit(thetaA)) +
              coalesce(col("cnt"), lit(thetaB))).as("est"))
          .orderBy(col("est").desc, col("key")).limit(capacity + 1)
          .cache()
        val nMerged = merged.count()
        val nthEst: Long =
          if (nMerged <= capacity) 0L
          else merged.agg(min(col("est"))).head().getLong(0)
        val thetaNew = math.max(thetaA + thetaB, nthEst)
        val snapshot = merged
          .orderBy(col("est").desc, col("key")).limit(capacity)
          .withColumn("theta", lit(thetaNew))
          .withColumn("batch_id", lit(batchId))

        if (!wh.tableExists(sink))
          wh.createTable(sink, snapshot.schema, ifExists = "skip",
            partitionBy = Seq("batch_id"))
        wh.append(sink, snapshot)
        topPlus.unpersist(); merged.unpersist()
        // prune history but KEEP the previous snapshot: a retry of this
        // batch reads it again (crash-ordered: prune strictly last)
        prevId.foreach(id => wh.deleteWhere(sink, col("batch_id") < id))
        ()
      }
      .start()
  }

  private def emptySummary(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("key", StringType),
        StructField("est", LongType), StructField("theta", LongType))))
  }

  /** The current heavy hitters: top `k` of the latest snapshot as
    * (key, est, theta) — `est` overestimates the true count by at most
    * `theta`, and every key whose true count exceeds `theta` is here.
    */
  def currentTopK(wh: Warehouse, name: String, k: Int): DataFrame = {
    val snap = wh.read(summaryTable(name))
    // an existing-but-empty summary (first batch crashed between
    // createTable and append, then replay pruned) has a NULL max —
    // answer "no heavy hitters yet" instead of NPEing on getLong
    val head = snap.agg(max(col("batch_id"))).head()
    if (head.isNullAt(0)) {
      snap.filter(lit(false))
        .select(col("key"), col("est"), col("theta"))
    } else {
      snap.filter(col("batch_id") === head.getLong(0))
        .select(col("key"), col("est"), col("theta"))
        .orderBy(col("est").desc, col("key")).limit(k)
    }
  }
}
