package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.DedupIndex
import graft.store.{ScaleJoins, Warehouse}

/** Streaming twin of the persistent MinHash-LSH dedup index: a
  * document stream is near-dup-deduped micro-batch by micro-batch
  * against a [[graft.dedup.DedupIndex]], confirmed pairs land in a
  * warehouse table, and each batch folds into the index — the
  * continuous-ingest form of the reference's batch dedup-on-load
  * (`data_loader.py:612-652` duplicate handling), upgraded from exact
  * keys to near-dup semantics.
  *
  * Scale posture: per micro-batch the cost is the incremental-index
  * cost — banding the batch plus two bloom-pruned joins against the
  * archive tables ([[DedupIndex.update]]); the archive's text is
  * never re-read. State lives in the warehouse, not in streaming
  * state stores, so it is unbounded-corpus-safe (no watermark
  * eviction of dedup knowledge) and shared with the batch path.
  *
  * Crash/replay safety, end to end (the part a naive
  * foreachBatch-into-index wiring gets wrong): pairs are persisted
  * via the index's `onPairs` hook BEFORE the batch's shingles/bands
  * append, and the pairs append is idempotent per (id_a, id_b). So:
  *  - crash before the pairs append → replay reruns the batch whole
  *    (its ids never reached the bands table);
  *  - crash between pairs and bands appends → the replay recomputes
  *    the same deterministic pairs and the keyed anti-join drops
  *    them;
  *  - crash after the bands append → the replayed batch's ids drop
  *    out as already-indexed and the update is a no-op.
  * Had pairs been appended AFTER `update` returned, the middle crash
  * window would lose them forever: the replayed ids would already be
  * members, `update` would return zero pairs, and the sink would
  * silently miss real duplicates.
  */
object StreamDedup {

  /** Sink table holding every confirmed pair the stream has seen. */
  def pairsTable(indexName: String): String = s"${indexName}__pairs"

  /** Run `docs` (a streaming DataFrame with `idCol`, `textCol`)
    * through the index `indexName` (already built via
    * [[DedupIndex.build]]). Returns the started query; with the
    * default AvailableNow trigger it drains what's present and stops.
    * Ids must be globally unique across the stream's lifetime (same
    * contract as the batch index).
    */
  def nearDupStream(wh: Warehouse, indexName: String, docs: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val sink = pairsTable(indexName)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        DedupIndex.update(wh, indexName, batch, idCol, textCol, threshold,
          onPairs = appendPairsIdempotent(wh, sink, _))
        ()
      }
      .start()
  }

  /** Keyed-idempotent append: rows whose (id_a, id_b) already landed
    * are dropped, so a replayed batch (which recomputes identical
    * pairs) inserts nothing twice. The existing-keys scan is
    * bloom-pruned by the incoming batch's keys — the sink table can
    * be archive-sized, the probe stays batch-sized.
    */
  private def appendPairsIdempotent(wh: Warehouse, table: String,
      pairs: DataFrame): Unit = {
    if (!wh.tableExists(table))
      wh.createTable(table, pairs.schema, ifExists = "skip")
    val fresh = ScaleJoins.bloomPrunedAntiJoin(
      pairs.select("id_a", "id_b"),
      wh.read(table).select("id_a", "id_b"),
      Seq("id_a", "id_b"), expectedItems = 1000000L)
      .join(pairs, Seq("id_a", "id_b"))
    wh.append(table, fresh)
  }
}
