package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.Warehouse

/** Streaming distribution-drift monitor: every micro-batch of a metric
  * stream is binned against a FIXED reference histogram (cut points
  * captured from a training window) and scored with the
  * Laplace-smoothed Population Stability Index — the continuous form
  * of q_psi, one PSI row per micro-batch. The reference cuts are a
  * broadcast-size constant; per batch the work is one aggregation of
  * the batch's rows into ≤ bins+1 counters, so the monitor's cost is
  * O(batch) with O(1) state however long the stream runs.
  *
  * Sink rows land under the `batch_id >=` replay idiom (each batch
  * deletes partitions at-or-above its own id, then appends): a
  * retried micro-batch recomputes its identical PSI row, and a
  * restart after CHECKPOINT LOSS (ids back at 0) clears the stale
  * history so the re-delivered stream rebuilds a consistent one —
  * the [[StreamStats]] recovery invariant.
  */
object StreamDrift {

  def psiTable(name: String): String = s"${name}__psi"

  /** Bin index 0..cuts.size for `v` against ascending `cuts`. */
  private def binCol(v: Column, cuts: Seq[Double]): Column =
    cuts.map(t => when(v > t, 1).otherwise(0)).reduce(_ + _)

  /** Reference bin masses (smoothed) for `valueCol` of a STATIC
    * training frame over the given cut points. Returns (bin, refShare)
    * with every bin 0..cuts.size present (absent bins get only the
    * smoothing mass).
    */
  def referenceShares(train: DataFrame, valueCol: String,
      cuts: Seq[Double]): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val counts = train
      .select(binCol(col(valueCol), cuts).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("c"))
    val grid = (0 to cuts.size).toDF("bin")
    val tot = counts.agg(sum(col("c")).as("n"))
    grid.join(counts, Seq("bin"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bin"),
        ((coalesce(col("c"), lit(0L)) + 0.5)
          / (col("n") + (cuts.size + 1) * 0.5)).as("ref_share"))
  }

  /** Start the monitor: one PSI row per micro-batch of `stream`
    * (columns: batch_id, n_rows, psi). `refShares` must come from
    * [[referenceShares]] with the same `cuts`.
    */
  def psiStream(wh: Warehouse, name: String, stream: DataFrame,
      valueCol: String, cuts: Seq[Double], refShares: DataFrame,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val sink = psiTable(name)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val counts = batch
          .select(binCol(col(valueCol), cuts).as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("c"))
        val grid = (0 to cuts.size).toDF("bin")
        val tot = counts.agg(coalesce(sum(col("c")), lit(0L)).as("n"))
        val row = grid.join(counts, Seq("bin"), "left")
          .crossJoin(broadcast(tot))
          .join(broadcast(refShares), Seq("bin"))
          .select(col("n"),
            (((coalesce(col("c"), lit(0L)) + 0.5)
              / (col("n") + (cuts.size + 1) * 0.5)).as("p")),
            col("ref_share").as("q"))
          .select(col("n"),
            ((col("p") - col("q")) * log(col("p") / col("q")))
              .cast("decimal(28,12)").as("term"))
          .groupBy(col("n"))
          .agg(sum(col("term")).cast("double").as("psi"))
          .select(lit(batchId).as("batch_id"), col("n").as("n_rows"),
            round(col("psi"), 6).as("psi"))
        if (!wh.tableExists(sink))
          wh.createTable(sink, row.schema, ifExists = "skip",
            partitionBy = Seq("batch_id"))
        graft.store.RebuildGuard.checkSinkWipe(batch.sparkSession, wh,
          sink, batchId, "StreamDrift")
        wh.deleteWhere(sink, col("batch_id") >= batchId)
        wh.append(sink, row)
        ()
      }
      .start()
  }
}
