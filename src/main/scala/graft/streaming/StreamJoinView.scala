package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.{JoinView, Warehouse}

/** Live-maintained JOIN view over TWO append-only streams, fed as one
  * tagged-union envelope (a `side` column distinguishes left/right
  * rows — the standard trick for multi-input maintenance under a
  * single exactly-once micro-batch sequence; two independent queries
  * would interleave nondeterministically and double-join a pair
  * delivered in the same wall-clock instant).
  *
  * Each micro-batch splits by side and folds through
  * [[JoinView.refreshOnce]]: ΔL⋈R_archive ∪ (L_archive∪ΔL)⋈ΔR, all
  * three writes batch-id keyed — a crash-replayed batch overwrites its
  * own partition dirs, so the view is exactly-once end to end
  * ([[StreamJoinViewSpec]] replays a batch to prove it).
  */
object StreamJoinView {

  /** Start maintenance. `envelope` must carry a `side` column valued
    * 'L' or 'R'; `leftCols`/`rightCols` project each side's payload
    * out of the envelope (shared key columns appear in both).
    */
  def maintained(envelope: DataFrame, wh: Warehouse, name: String,
      keys: Seq[String], leftCols: Seq[String], rightCols: Seq[String],
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    envelope.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dL = batch.filter(col("side") === "L")
          .select(leftCols.map(col): _*)
        val dR = batch.filter(col("side") === "R")
          .select(rightCols.map(col): _*)
        JoinView.refreshOnce(wh, name, keys, dL, dR, batchId)
        ()
      }
      .start()
}
