package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.profile.Sampling
import graft.store.{ScaleJoins, Warehouse}

/** Streaming face of the A-ES weighted sampler
  * ([[graft.profile.Sampling.weightedSample]]): maintain a
  * weight-proportional without-replacement sample of size k over an
  * unbounded stream.
  *
  * Correctness rests on two facts. (1) The draw key ln(u)/w uses the
  * REPRODUCIBLE uniform u = (hash32(id)+0.5)/2^32 — no rand(), so any
  * element's key is the same in every batch, every replay, every
  * partitioning. (2) Top-k is distributive: an element of the global
  * top-k is necessarily in its own micro-batch's top-k (fewer than k
  * elements beat it anywhere, so fewer than k beat it in its batch).
  * Folding each batch's top-k into a candidates table and re-taking
  * top-k therefore yields EXACTLY the batch sampler's result over the
  * union — stream ≡ batch parity is exact, not approximate.
  *
  * Scale posture: per batch one distributed top-k (bounded k rows) +
  * one bloom-pruned idempotent append; the candidates table grows at
  * most k rows per batch and everything durable lives in the
  * warehouse — no streaming state store, so checkpoint loss costs
  * nothing but recomputation.
  */
object StreamSample {

  /** Sink table holding every micro-batch's top-k candidates. */
  def candidatesTable(name: String): String = s"${name}__sample_candidates"

  /** Fold a stream of (id, weight) rows into the candidate set.
    * Replays are no-ops: a re-delivered batch recomputes the identical
    * deterministic top-k and the keyed-idempotent append drops every
    * already-landed id.
    */
  def weightedSampleStream(wh: Warehouse, name: String, rows: DataFrame,
      idCol: String, weightCol: String, k: Int, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val sink = candidatesTable(name)
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cand = Sampling.weightedSample(
          batch.select(col(idCol), col(weightCol)), idCol, weightCol, k)
        appendIdempotent(wh, sink, cand, idCol)
        ()
      }
      .start()
  }

  /** The current sample: top-k over the bounded candidates table —
    * exactly [[Sampling.weightedSample]] of everything streamed so
    * far. */
  def currentSample(wh: Warehouse, name: String, idCol: String,
      weightCol: String, k: Int): DataFrame =
    Sampling.weightedSample(
      wh.read(candidatesTable(name)), idCol, weightCol, k)

  /** Keyed-idempotent append (same idiom as the dedup pairs sink):
    * ids already landed are dropped; the existing-keys scan is
    * bloom-pruned by the incoming batch's ids. */
  private def appendIdempotent(wh: Warehouse, table: String,
      cand: DataFrame, idCol: String): Unit = {
    if (!wh.tableExists(table))
      wh.createTable(table, cand.schema, ifExists = "skip")
    val fresh = ScaleJoins.bloomPrunedAntiJoin(
      cand.select(idCol),
      wh.read(table).select(idCol),
      Seq(idCol), expectedItems = 1000000L)
      .join(cand, Seq(idCol))
    wh.append(table, fresh)
  }
}
