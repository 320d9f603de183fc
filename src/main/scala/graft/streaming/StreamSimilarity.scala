package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sim.IvfIndex
import graft.store.Warehouse

/** Streaming faces of the persistent IVF similarity index: continuous
  * vector ingest and continuous ANN query serving, both micro-batch
  * loops over [[graft.sim.IvfIndex]] so batch and stream share one
  * index (and one recall contract).
  *
  * Scale posture: ingest costs O(batch × k) centroid assignment plus
  * one partitioned append per micro-batch — the archive cells are
  * never re-read. Search is the probe-pruned path: per batch it reads
  * only the probed `centroid_id=` directories. Neither holds
  * streaming-state-store state; everything durable lives in the
  * warehouse, shared with the batch path.
  */
object StreamSimilarity {

  /** Continuously fold a stream of vectors into the index.
    * Exactly-once per id end to end: [[IvfIndex.append]] drops ids
    * already assigned to a cell, so a replayed micro-batch is a
    * no-op.
    */
  def ivfIngestStream(wh: Warehouse, indexName: String, vecs: DataFrame,
      idCol: String, vecCol: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IvfIndex.append(wh, indexName, batch, idCol, vecCol)
        ()
      }
      .start()

  /** Continuously fold a stream of vectors into a persisted IVF × PQ
    * index — the compressed tier's streaming face. Per micro-batch:
    * assign to frozen centroids, encode with frozen codebooks, two
    * partitioned appends ([[graft.sim.IvfPqIndex.append]]).
    * Exactly-once per id per tier: a replayed batch repairs exactly
    * whichever tier a crash left behind and appends nothing twice.
    */
  def ivfPqIngestStream(wh: Warehouse, indexName: String, vecs: DataFrame,
      idCol: String, vecCol: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sim.IvfPqIndex.append(wh, indexName, batch, idCol, vecCol)
        ()
      }
      .start()

  /** Continuously serve ANN queries: each micro-batch of query
    * vectors probes the index and its top-k results land in
    * `sinkTable`, partitioned by `batch_id`. Replay is exactly-once
    * per BATCH, not per key: the batch first deletes partitions
    * at-or-above its own id (its own partition on the normal path — a
    * directory-pruned no-op; EVERYTHING on batch 0 of a restart after
    * checkpoint loss, so the re-delivered queries rebuild the results
    * table instead of duplicating under new ids), then appends — a
    * crash mid-write never leaves a query's results mixed across two
    * index states.
    */
  def ivfSearchStream(wh: Warehouse, indexName: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int,
      sinkTable: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val res = IvfIndex.search(wh, indexName, batch, idCol, vecCol,
          k, nProbe).withColumn("batch_id", lit(batchId))
        if (!wh.tableExists(sinkTable))
          wh.createTable(sinkTable, res.schema, ifExists = "skip",
            partitionBy = Seq("batch_id"))
        graft.store.RebuildGuard.checkSinkWipe(batch.sparkSession, wh,
          sinkTable, batchId, "StreamSimilarity.ivfSearchStream")
        wh.deleteWhere(sinkTable, col("batch_id") >= batchId)
        wh.append(sinkTable, res)
        ()
      }
      .start()
}
