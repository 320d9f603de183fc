package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.{MatView, MatViewDef, Warehouse}

/** Live-maintained rollups: a stream lands in a batch-id-keyed fact
  * layout AND folds into a [[MatView]] partial state in the same
  * micro-batch, so the finalized view is continuously current at
  * O(batch + state) per trigger — never a rescan of the fact history.
  *
  * Exactly-once under replay (foreachBatch re-runs a batch after a
  * crash) holds because BOTH effects are idempotent per batch id:
  *  - the fact write overwrites its own `batch_id=N` directory, so a
  *    replayed batch replaces identical files instead of appending
  *    duplicates (the [[StreamSimilarity]] serving-sink pattern);
  *  - the state fold goes through [[MatView.refreshOnce]], whose
  *    applied-batch marker rides the state swap atomically — a
  *    replayed fold is a no-op.
  * Crash between the two effects: data is new, state is old, and the
  * replay re-overwrites the data dir then applies the fold once.
  *
  * Checkpoint LOSS recovers too: the restarted query re-delivers from
  * scratch at id 0 — the fact layout drops its stale at-or-above
  * batch dirs per batch (everything, at id 0), and
  * [[MatView.refreshOnce]]'s batch-0 restart rule rebuilds the state
  * from the first re-delivered fold instead of skipping re-batched
  * data against the stale marker.
  */
object StreamMatView {

  /** Start the maintained ingest: `rows` append to `factPath`
    * (partitioned by batch_id) while each batch folds into the MV
    * state under `wh`.
    */
  def maintainedAppend(rows: DataFrame, factPath: String, wh: Warehouse,
      mv: MatViewDef, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.lit
        val spark = batch.sparkSession
        // >= replay idiom for the fact layout: a restart after
        // checkpoint loss re-delivers everything re-batched from id 0;
        // stale batch_id dirs above the delivered id would otherwise
        // keep their (now duplicate) rows forever. Normal path: no
        // dir is at-or-above the live id → no-op listing.
        val root = new org.apache.hadoop.fs.Path(factPath)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(root))
          fs.listStatus(root).foreach { st =>
            val n = st.getPath.getName
            if (n.startsWith("batch_id=") &&
              scala.util.Try(n.stripPrefix("batch_id=").toLong)
                .toOption.exists(_ >= batchId))
              fs.delete(st.getPath, true)
          }
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(factPath)
        MatView.refreshOnce(wh, mv, batch, batchId)
        ()
      }
      .start()
}
