package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.{ScaleJoins, Warehouse}

/** Stream-STREAM interval join: two live event streams joined on a key
  * with an event-time range condition (right.ts within [left.ts,
  * left.ts + span]) — the attribution primitive (click → purchase
  * within N minutes) that neither the static-dimension enrich stream
  * nor any foreachBatch wiring can express, because a match may pair
  * rows from DIFFERENT micro-batches on different sides.
  *
  * This is the genuine Structured Streaming stateful join: both sides
  * carry watermarks, and the range condition gives the state store an
  * eviction bound — a left row is held only until the right watermark
  * passes left.ts + span, so state is O(in-flight window), not
  * O(stream history), at any throughput. Without BOTH the watermarks
  * and the time-range join condition Spark would have to buffer the
  * streams forever; with them the planner derives the state watermark
  * automatically (the join is append-mode-safe).
  *
  * Rows arriving later than the watermark delay are dropped by the
  * state store — standard streaming semantics, asserted in the spec.
  */
object StreamJoin {

  /** The joined streaming frame: left (aliased `l_`) matched to right
    * (aliased `r_`) on equal `key`, with r.time in [l.time,
    * l.time + span]. Both inputs must be STREAMING frames; `delay` is
    * the watermark lateness bound on both sides (e.g. "30 minutes"),
    * `span` the attribution window (e.g. "10 minutes").
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, span: String,
      delay: String): DataFrame = {
    val l = left.withWatermark(leftTime, delay)
      .select(left.columns.map(c => col(c).as(s"l_$c")): _*)
    val r = right.withWatermark(rightTime, delay)
      .select(right.columns.map(c => col(c).as(s"r_$c")): _*)
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
        col(s"r_$rightTime") >= col(s"l_$leftTime") &&
        col(s"r_$rightTime") <= col(s"l_$leftTime") + expr(s"INTERVAL $span"))
  }

  /** Run the interval join continuously into a warehouse table. The
    * append is keyed-idempotent on the (left id, right id) pair, so a
    * replayed micro-batch inserts nothing twice.
    */
  def intervalJoinStream(wh: Warehouse, sinkTable: String,
      joined: DataFrame, leftIdCol: String, rightIdCol: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    joined.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!wh.tableExists(sinkTable))
          wh.createTable(sinkTable, batch.schema, ifExists = "skip")
        val fresh = ScaleJoins.bloomPrunedAntiJoin(
          batch.select(leftIdCol, rightIdCol),
          wh.read(sinkTable).select(leftIdCol, rightIdCol),
          Seq(leftIdCol, rightIdCol), expectedItems = 1000000L)
          .join(batch, Seq(leftIdCol, rightIdCol))
        wh.append(sinkTable, fresh)
        ()
      }
      .start()
}
