package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.{ScaleJoins, Warehouse}
import graft.transform.TemporalJoins

/** Streaming as-of enrichment: each event in a stream picks up the
  * most recent version of a static, versioned dimension as of the
  * event's own timestamp — the continuous-ingest twin of the batch
  * [[graft.transform.TemporalJoins.asofJoinBackward]] (the shape the
  * reference's load path applies per file batch,
  * `data_loader.py:377-429` time-bounded enrichment, generalized to
  * point-in-version semantics).
  *
  * Scale posture, per micro-batch:
  *  - the dimension is first LEFT-SEMI pruned to the batch's own key
  *    set, so the union+window as-of join runs over O(batch +
  *    matching-dimension-slice) rows, never the whole dimension — a
  *    100 TB dimension costs what the batch's keys touch (and the
  *    semi-join itself broadcasts the batch key set, which is
  *    micro-batch-sized by construction);
  *  - output lands in a warehouse table via a keyed-idempotent append
  *    (bloom-pruned anti-join on the event id), so a replayed
  *    micro-batch — same deterministic enrichment — inserts nothing
  *    twice. State lives in the warehouse, not streaming state stores:
  *    no watermark needed, the dimension is static within a run.
  */
object StreamEnrich {

  /** Start the enrichment stream. `events` is a streaming DataFrame
    * carrying `idCol` (globally unique event id), `keys`, `leftTime`;
    * `dim` is a STATIC versioned dimension with `keys`, `rightTime`
    * and `payload` columns. Enriched rows append to `sinkTable` with
    * payload columns prefixed `prefix` (null where no version is old
    * enough, standard as-of left-outer semantics).
    */
  def asofStream(wh: Warehouse, sinkTable: String, events: DataFrame,
      dim: DataFrame, keys: Seq[String], idCol: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      checkpoint: String, prefix: String = "asof_",
      toleranceMicros: Option[Long] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val slice = dim.join(
          batch.select(keys.map(col): _*).distinct(), keys, "left_semi")
        // tiebreak must extend BEYOND rightTime: two dimension versions
        // sharing (key, rightTime) would otherwise be picked
        // nondeterministically, breaking the replay-idempotence
        // contract — ordering by the payload makes the pick total
        val enriched = TemporalJoins.asofJoinBackward(
          batch, slice, keys, leftTime, rightTime, payload,
          tiebreakCols = Seq(rightTime) ++ payload, prefix = prefix,
          toleranceMicros = toleranceMicros)
        appendIdempotent(wh, sinkTable, enriched, idCol)
        ()
      }
      .start()

  /** Keyed-idempotent append on the event id: replayed batches
    * recompute identical rows and the anti-join drops them. The
    * existing-ids scan is bloom-pruned by the incoming batch, so the
    * sink can be archive-sized while the probe stays batch-sized.
    */
  private def appendIdempotent(wh: Warehouse, table: String,
      rows: DataFrame, idCol: String): Unit = {
    if (!wh.tableExists(table))
      wh.createTable(table, rows.schema, ifExists = "skip")
    val fresh = ScaleJoins.bloomPrunedAntiJoin(
      rows.select(idCol), wh.read(table).select(idCol),
      Seq(idCol), expectedItems = 1000000L)
      .join(rows, Seq(idCol))
    wh.append(table, fresh)
  }
}
