package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized EQUI-JOIN view over
  * APPEND-ONLY inputs — the delta-join algebra: when batches
  * (ΔL, ΔR) arrive, the view grows by exactly
  *
  *   ΔL ⋈ R_archive  ∪  (L_archive ∪ ΔL) ⋈ ΔR
  *
  * so every (left-batch i, right-batch j) pair is joined exactly once
  * (i > j via the first term, i ≤ j via the second), and refresh cost
  * is O(Δ ⋈ archive) keyed joins — never a re-join of the full
  * history. This is the join half of incremental view maintenance
  * ([[MatView]] is the aggregate half). Inputs maintained by
  * delete/update (merge, CDC apply) fold through [[mutateView]] /
  * [[refreshMutation]] — removals leave by id-keyed anti joins, so
  * the delta algebra stays Δ-sized under retraction too.
  *
  * Scale shape: both delta joins are keyed equi-joins — the archive
  * side arrives hash-partitioned on the join key from its own layout,
  * the delta side is batch-sized, so at a 100 TB archive the planner
  * broadcasts the delta (or shuffles only the delta under AQE).
  * Storage is three tables: the view plus both archives, all
  * batch-id partitioned by [[refreshOnce]] so a replayed micro-batch
  * OVERWRITES its own partition directories instead of appending
  * duplicates — idempotent without any marker.
  */
object JoinView {

  def viewTable(name: String) = s"_jv_$name"
  def leftTable(name: String) = s"_jv_${name}_left"
  def rightTable(name: String) = s"_jv_${name}_right"

  /** Fold one (ΔL, ΔR) pair into the view — plain-append form for
    * driver-sequenced batch loads. Value column names must be
    * disjoint across the two sides (join output holds both).
    * Pick ONE mode per view name: this unpartitioned append and
    * [[refreshOnce]]'s batch-partitioned layout must not interleave
    * in the same directories.
    */
  def refresh(wh: Warehouse, name: String, keys: Seq[String],
      dLeft: DataFrame, dRight: DataFrame): Unit = {
    val delta = viewDelta(wh, name, keys, dLeft, dRight)
    appendTo(wh, viewTable(name), delta)
    appendTo(wh, leftTable(name), dLeft)
    appendTo(wh, rightTable(name), dRight)
  }

  /** Replay-idempotent fold for streaming delivery: every write lands
    * in `batch_id=<id>` partition directories with dynamic overwrite,
    * so a re-delivered batch replaces its own files. Crash between
    * the three writes replays to the identical final state.
    *
    * Checkpoint LOSS: ids restart at 0 and the source re-delivers
    * everything re-batched — batch 0 arriving over existing state
    * therefore drops all three tables first (the >= replay idiom at
    * its degenerate point), so the re-delivery rebuilds the view
    * instead of delta-joining re-batched history against stale
    * archives. A live-checkpoint replay of batch 0 rebuilds the same
    * single-batch state it replaces — idempotent either way.
    */
  def refreshOnce(wh: Warehouse, name: String, keys: Seq[String],
      dLeft: DataFrame, dRight: DataFrame, batchId: Long): Unit = {
    if (batchId == 0L) {
      val existing = Seq(leftTable(name), rightTable(name))
        .filter(wh.tableExists)
      if (existing.nonEmpty)
        // destroying archives on a batch-0 signal is only right when
        // the source actually re-delivers them — guard the wipe
        RebuildGuard.checkStateRebuild(dLeft.sparkSession,
          s"JoinView($name).refreshOnce",
          existing.map(wh.read(_).count()).sum,
          dLeft.count() + dRight.count())
      Seq(viewTable(name), leftTable(name), rightTable(name))
        .filter(wh.tableExists).foreach(wh.dropTable)
    }
    // archives must exclude THIS batch id when computing the delta —
    // a replayed batch would otherwise join against its own rows
    val delta = viewDelta(wh, name, keys,
      dLeft, dRight, excludeBatch = Some(batchId))
    overwriteBatch(wh, viewTable(name), delta, batchId)
    overwriteBatch(wh, leftTable(name), dLeft, batchId)
    overwriteBatch(wh, rightTable(name), dRight, batchId)
  }

  /** The maintained view (batch bookkeeping column dropped). */
  def read(wh: Warehouse, name: String): DataFrame = {
    val v = wh.read(viewTable(name))
    if (v.columns.contains("batch_id")) v.drop("batch_id") else v
  }

  // ------------------------------------------------------ retraction

  /** Fold a MUTATION pair into a join view — the retraction half of
    * the delta-join algebra ([[graft.store.MatView.mutateState]] is
    * the aggregate twin): each side's mutation arrives as (removed,
    * added) row sets identified by that side's UNIQUE row key
    * (`leftId`/`rightId` — present in the view output, which is what
    * lets dead view rows be found WITHOUT re-joining), and
    * `leftAfter`/`rightAfter` are the POST-mutation inputs.
    *
    *   V' =  V ∖ (rows joining a removed row on either side)
    *       ∪  L⁺ ⋈ R'  ∪  (L' ∖ L⁺) ⋈ R⁺
    *
    * — every pair involving an added row enters exactly once (pairs
    * of two added rows ride the first term), every pair involving a
    * removed row leaves, surviving history is never re-joined. Cost
    * shape: two id-keyed anti joins of the view against the
    * delta-sized removal keys (broadcast), plus two Δ ⋈ archive keyed
    * joins — O(Δ ⋈ archive), the same contract as the append fold;
    * nothing rescans V ⋈ history.
    *
    * An update is one removed row + one added row on its side. Value
    * columns must be disjoint across sides (the standing [[refresh]]
    * contract).
    */
  def mutateView(view: DataFrame, keys: Seq[String],
      leftAfter: DataFrame, rightAfter: DataFrame,
      leftId: Seq[String], rightId: Seq[String],
      lRemoved: DataFrame, lAdded: DataFrame,
      rRemoved: DataFrame, rAdded: DataFrame): DataFrame = {
    require(leftId.nonEmpty && rightId.nonEmpty,
      "mutateView needs per-side unique row keys")
    val kept = view
      .join(lRemoved.select(leftId.map(col): _*), leftId, "left_anti")
      .join(rRemoved.select(rightId.map(col): _*), rightId, "left_anti")
    val cols = view.columns.map(col).toSeq
    val fromL = lAdded.join(rightAfter, keys)
    val fromR = leftAfter
      .join(lAdded.select(leftId.map(col): _*), leftId, "left_anti")
      .join(rAdded, keys)
    kept.unionByName(fromL.select(cols: _*))
      .unionByName(fromR.select(cols: _*))
  }

  /** Disk form of [[mutateView]] for the plain-append layout: the view
    * AND both archives fold the mutation through crash-safe replaces.
    * At warehouse scale the archives are the base tables themselves —
    * maintain them with [[Warehouse.merge]]/partition-pruned rewrites
    * and pass the post-mutation reads here; this helper rewrites the
    * stored side tables wholesale and is sized for view-layer state,
    * not 100 TB bases.
    */
  def refreshMutation(wh: Warehouse, name: String, keys: Seq[String],
      leftId: Seq[String], rightId: Seq[String],
      lRemoved: DataFrame, lAdded: DataFrame,
      rRemoved: DataFrame, rAdded: DataFrame): Unit = {
    // one maintenance mode per view name: this plain-append fold is
    // undefined over refreshOnce's batch-partitioned layout (the
    // batch_id column would surface mid-fold as an unionByName
    // AnalysisException far from the actual contract violation)
    Seq(viewTable(name), leftTable(name), rightTable(name))
      .filter(wh.tableExists).foreach { tbl =>
        require(!wh.read(tbl).columns.contains("batch_id"),
          s"JoinView($name): '$tbl' carries batch_id — it is maintained " +
            "by refreshOnce (streaming layout); refreshMutation only " +
            "folds plain-append views. Use one mode per view name.")
      }
    def applySide(table: String, ids: Seq[String], removed: DataFrame,
        added: DataFrame): DataFrame =
      wh.read(table)
        .join(removed.select(ids.map(col): _*), ids, "left_anti")
        .unionByName(added)
    val lAfter = applySide(leftTable(name), leftId, lRemoved, lAdded)
      .localCheckpoint(eager = true)
    val rAfter = applySide(rightTable(name), rightId, rRemoved, rAdded)
      .localCheckpoint(eager = true)
    val v = mutateView(wh.read(viewTable(name)), keys, lAfter, rAfter,
      leftId, rightId, lRemoved, lAdded, rRemoved, rAdded)
      .localCheckpoint(eager = true)
    wh.replaceTable(viewTable(name), v)
    wh.replaceTable(leftTable(name), lAfter)
    wh.replaceTable(rightTable(name), rAfter)
  }

  private def viewDelta(wh: Warehouse, name: String, keys: Seq[String],
      dLeft: DataFrame, dRight: DataFrame,
      excludeBatch: Option[Long] = None): DataFrame = {
    val aR = archive(wh, rightTable(name), dRight, excludeBatch)
    val aL = archive(wh, leftTable(name), dLeft, excludeBatch)
    dLeft.join(aR, keys)
      .unionByName(aL.unionByName(dLeft).join(dRight, keys))
  }

  private def archive(wh: Warehouse, table: String, like: DataFrame,
      excludeBatch: Option[Long]): DataFrame =
    if (!wh.tableExists(table))
      like.limit(0)
    else {
      val a = wh.read(table)
      val pruned = excludeBatch match {
        case Some(id) if a.columns.contains("batch_id") =>
          a.filter(col("batch_id") =!= id)
        case _ => a
      }
      pruned.select(like.columns.map(col).toSeq: _*)
    }

  private def appendTo(wh: Warehouse, table: String, df: DataFrame): Unit = {
    if (!wh.tableExists(table)) wh.createTable(table, df.schema)
    wh.append(table, df)
  }

  private def overwriteBatch(wh: Warehouse, table: String, df: DataFrame,
      batchId: Long): Unit =
    // an all-empty first write would leave a dataless directory that
    // breaks schema inference on the next archive read; an empty batch
    // also has nothing to overwrite, so skipping preserves idempotence
    if (!df.isEmpty)
      df.withColumn("batch_id", lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(s"${wh.location}/$table")
}
