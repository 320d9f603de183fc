package graft.store

import org.apache.spark.sql.SparkSession

/** Guard for the checkpoint-loss rebuild idiom (`batchId == 0` over
  * EXISTING state, used by [[JoinView.refreshOnce]],
  * [[MatView.refreshOnce]] and every `batch_id >=` stream sink):
  * batch 0 over existing state normally means "the checkpoint was
  * lost and the retained source is re-delivering everything", so the
  * correct move is to rebuild from the re-delivery. But the SAME
  * signal fires when the source is NOT fully retained (expired Kafka
  * retention, `startingOffsets=latest`, a cleaned-up file directory)
  * or when a fresh query is pointed at an existing sink by mistake —
  * and then the rebuild silently destroys history and replaces it
  * with whatever little the source still delivers.
  *
  * The guard tells the two apart by SIZE: a genuine full re-delivery
  * is about as large as the state it replaces; a partial one is much
  * smaller. Modes (`spark.graft.stream.lossRebuild`):
  *
  *  - `auto` (default) — warn with row counts on every
  *    rebuild-over-state; REFUSE when the state is large
  *    (≥ [[GuardMinRows]] source rows) and the re-delivery is less
  *    than a quarter of it — the destroy-history signature. Sources
  *    that legitimately re-batch history into small batches
  *    (`maxFilesPerTrigger`) must set `force`.
  *  - `force`  — always rebuild (warn only) — pre-guard behavior.
  *  - `refuse` — never destroy existing state on batch 0; the
  *    operator drops the stale state (or checkpoint) explicitly.
  */
object RebuildGuard {

  val ModeKey = "spark.graft.stream.lossRebuild"

  /** Below this many existing rows, `auto` never refuses — small
    * states rebuild cheaply and the ratio test has no signal.
    */
  val GuardMinRows = 10000L

  private def mode(spark: SparkSession): String =
    spark.conf.getOption(ModeKey).map(_.trim.toLowerCase)
      .getOrElse("auto") match {
      case m @ ("auto" | "force" | "refuse") => m
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be auto|force|refuse, got '$other'")
    }

  /** Gate a state rebuild: `existing` = source rows the wipe would
    * destroy, `delta` = source rows batch 0 re-delivered (comparable
    * units — both count base rows). Both are by-name: nothing is
    * counted unless the caller is actually on the batch-0-over-state
    * path. Throws in `refuse` mode, and in `auto` when the
    * re-delivery looks partial; otherwise warns and returns.
    */
  def checkStateRebuild(spark: SparkSession, what: String,
      existing: => Long, delta: => Long): Unit = mode(spark) match {
    case "refuse" => throw new IllegalStateException(
      s"$what: batch 0 arrived over existing state and $ModeKey=refuse " +
        "— drop the stale state explicitly or restore the checkpoint")
    case m =>
      val ex = existing
      if (ex > 0L) {
        val d = delta
        if (m == "auto" && ex >= GuardMinRows && d * 4L < ex)
          throw new IllegalStateException(
            s"$what: refusing checkpoint-loss rebuild — batch 0 would " +
              s"replace $ex existing rows with a $d-row re-delivery " +
              "(source not fully retained?). Set " +
              s"$ModeKey=force if the source legitimately re-batches " +
              "history into small batches.")
        System.err.println(
          s"[graft] $what: checkpoint-loss rebuild replacing $ex " +
            s"existing rows with a $d-row re-delivery " +
            s"(silence with $ModeKey=force)")
      }
  }

  /** Sink-output variant: batch 0 over a populated `batch_id >=` sink
    * wipes ALL derived output. Derived rows regenerate from the
    * re-delivery and sink rows aren't in source-row units (no ratio
    * test possible), so `auto` only WARNS with the row count;
    * `refuse` still refuses.
    */
  def checkSinkWipe(spark: SparkSession, wh: Warehouse, table: String,
      batchId: Long, what: String): Unit =
    if (batchId == 0L && wh.tableExists(table)) {
      val n = wh.read(table).count()
      if (n > 0L) mode(spark) match {
        case "refuse" => throw new IllegalStateException(
          s"$what: batch 0 would wipe $n rows of sink '$table' and " +
            s"$ModeKey=refuse — drop the sink or restore the checkpoint")
        case _ => System.err.println(
          s"[graft] $what: checkpoint-loss replay wiping $n rows of " +
            s"sink '$table' before rebuild (silence with $ModeKey=force)")
      }
    }
}
