package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.ConcurrentLinkedDeque
import scala.jdk.CollectionConverters._

/** Engine-management surface (SURVEY §2.12) — the Spark-meaningful
  * subset of the reference's `postgres_manager.py` admin layer.
  * Postgres-server concerns with no embedded-engine analogue (locks,
  * replication, bloat, indexes, SSL) are intentionally dropped, per
  * the SURVEY §2.12 mapping table.
  */
object EngineOps {

  final case class QueryRecord(
      timestamp: Long,
      description: String,
      durationNs: Long,
      succeeded: Boolean)

  /** Query-history ring buffer (reference keeps the last 1000 queries
    * with timings, `postgres_manager.py:99-100, 418-428`) fed by a
    * QueryExecutionListener — every DataFrame action lands here.
    */
  final class QueryHistory(capacity: Int = 1000) extends QueryExecutionListener {
    private val buf = new ConcurrentLinkedDeque[QueryRecord]()

    // synchronized: the listener bus delivers concurrently, and
    // addLast-then-trim is not atomic — two in-flight pushes can both
    // append before either trims, letting a reader observe size >
    // capacity. Per-action cost, nowhere near a hot path.
    private def push(r: QueryRecord): Unit = buf.synchronized {
      buf.addLast(r)
      while (buf.size() > capacity) buf.pollFirst()
    }

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      push(QueryRecord(System.currentTimeMillis(),
        s"$funcName: ${qe.analyzed.simpleString(60)}", durationNs,
        succeeded = true))

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      push(QueryRecord(System.currentTimeMillis(),
        s"$funcName: ${exception.getMessage}", 0L, succeeded = false))

    def history: Seq[QueryRecord] = buf.synchronized(buf.asScala.toSeq)

    /** Slow-query report (reference threshold 1s,
      * `postgres_manager.py:542-559`). */
    def slowQueries(thresholdMs: Long = 1000): Seq[QueryRecord] =
      history.filter(r => r.succeeded && r.durationNs / 1e6 >= thresholdMs)
  }

  def installHistory(spark: SparkSession, capacity: Int = 1000): QueryHistory = {
    val h = new QueryHistory(capacity)
    spark.listenerManager.register(h)
    h
  }

  /** In-flight data-quality metrics via `Dataset.observe`: named
    * aggregates computed DURING the action that already runs — zero
    * extra jobs, zero extra scans — and collected from the listener
    * after it completes. The 100 TB form of "count the nulls while you
    * load" (a separate validation pass over the corpus is a second
    * full read). Returns the observed DataFrame plus a fetcher that
    * yields the metrics row once an action has executed.
    */
  final class ObservedMetrics(spark: SparkSession, name: String)
      extends QueryExecutionListener with AutoCloseable {
    @volatile private var last: Option[org.apache.spark.sql.Row] = None
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      qe.observedMetrics.get(name).foreach(r => last = Some(r))
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
    def metrics: Option[org.apache.spark.sql.Row] = last

    /** Listener delivery is ASYNC — the row is not guaranteed present
      * when the action returns. Polls up to `timeoutMs`, then
      * unregisters this listener (each `observed` call registers one;
      * a long-lived session must not accumulate them).
      */
    def awaitMetrics(timeoutMs: Long = 10000): Option[org.apache.spark.sql.Row] = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (last.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      close()
      last
    }

    override def close(): Unit = spark.listenerManager.unregister(this)
  }

  /** Use a unique `name` per concurrent observation — listener capture
    * matches by name, so two in-flight loads sharing one name would
    * cross-talk. Call `awaitMetrics()` (which also unregisters) after
    * the action, or `close()` to abandon.
    */
  def observed(df: DataFrame, name: String,
      metrics: Map[String, org.apache.spark.sql.Column]): (DataFrame, ObservedMetrics) = {
    require(metrics.nonEmpty, "observe needs at least one metric")
    val listener = new ObservedMetrics(df.sparkSession, name)
    df.sparkSession.listenerManager.register(listener)
    val cols = metrics.map { case (n, c) => c.as(n) }.toSeq
    (df.observe(name, cols.head, cols.tail: _*), listener)
  }

  /** Small-file maintenance advisor: tables whose file count exceeds
    * what their data volume justifies (the accumulation pattern of
    * streaming/micro-batch appends — the read-amplification killer at
    * scale). Reads only parquet FOOTER stats via tableStats (no data
    * scan). Returns one row per table needing work with the
    * recommended compact target.
    */
  final case class CompactionAdvice(table: String, numFiles: Int,
      sizeBytes: Long, recommendedFiles: Int)

  def compactionAdvice(warehouse: graft.store.Warehouse,
      targetFileBytes: Long = 128L * 1024 * 1024,
      slackFiles: Int = 4): Seq[CompactionAdvice] =
    warehouse.listTables().flatMap { t =>
      val st = warehouse.tableStats(t)
      val ideal = math.max(1, math.ceil(
        st.sizeBytes.toDouble / targetFileBytes).toInt)
      if (st.numFiles > ideal + slackFiles)
        Some(CompactionAdvice(t, st.numFiles, st.sizeBytes, ideal))
      else None
    }

  /** Streaming progress history — the run-rate dashboard for
    * long-lived queries: one record per micro-batch (rows in,
    * rows/sec, batch duration, watermark) in a bounded ring buffer,
    * fed by a StreamingQueryListener. The streaming twin of
    * [[QueryHistory]].
    */
  final case class BatchProgress(queryName: String, batchId: Long,
      numInputRows: Long, processedRowsPerSecond: Double,
      durationMs: Long, watermark: String)

  final class StreamingHistory(capacity: Int = 1000)
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val buf = new ConcurrentLinkedDeque[BatchProgress]()
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      buf.addLast(BatchProgress(
        Option(p.name).getOrElse(p.id.toString), p.batchId,
        p.numInputRows, p.processedRowsPerSecond,
        Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(0L),
        Option(p.eventTime.get("watermark")).getOrElse("")))
      while (buf.size() > capacity) buf.pollFirst()
    }
    def history: Seq[BatchProgress] = buf.asScala.toSeq
    def slowBatches(thresholdMs: Long): Seq[BatchProgress] =
      history.filter(_.durationMs >= thresholdMs)
  }

  def installStreamingHistory(spark: SparkSession,
      capacity: Int = 1000): StreamingHistory = {
    val h = new StreamingHistory(capacity)
    spark.streams.addListener(h)
    h
  }

  /** Pre-flight join-size estimate from HLL sketches — run BEFORE
    * keying a 100 TB shuffle, like [[keySkewReport]]. Each side is one
    * sketch-aggregating scan (no shuffle, KB of state); the key
    * overlap comes from inclusion–exclusion over the unioned sketches
    * (|A∩B| ≈ dL + dR − dU, clamped at 0), and the output-row estimate
    * multiplies the overlap by each side's mean rows-per-key — exact
    * for uniform multiplicity, an explicit assumption surfaced in the
    * column name. Columns: rows_l/r, distinct_l/r, est_overlap_keys,
    * est_join_rows_uniform.
    */
  def estimateJoinCardinality(lhs: DataFrame, rhs: DataFrame,
      leftKey: String, rightKey: String, lgK: Int = 12): DataFrame = {
    import org.apache.spark.sql.functions._
    // count(key): NULL-key rows never equi-match and the HLL ignores
    // them, so counting them would inflate the rows-per-key means
    def side(df: DataFrame, key: String, tag: String) =
      df.agg(count(col(key)).as(s"rows_$tag"),
        call_function("hll_sketch_agg", col(key), lit(lgK)).as(s"__sk_$tag"))
    side(lhs, leftKey, "l").crossJoin(side(rhs, rightKey, "r"))
      .select(col("rows_l"), col("rows_r"),
        call_function("hll_sketch_estimate", col("__sk_l")).as("distinct_l"),
        call_function("hll_sketch_estimate", col("__sk_r")).as("distinct_r"),
        call_function("hll_sketch_estimate",
          call_function("hll_union", col("__sk_l"), col("__sk_r")))
          .as("__distinct_u"))
      .select(col("rows_l"), col("rows_r"), col("distinct_l"),
        col("distinct_r"),
        greatest(col("distinct_l") + col("distinct_r") - col("__distinct_u"),
          lit(0L)).as("est_overlap_keys"),
        round(greatest(col("distinct_l") + col("distinct_r")
            - col("__distinct_u"), lit(0L)).cast("double")
          * (col("rows_l") / greatest(col("distinct_l"), lit(1L)))
          * (col("rows_r") / greatest(col("distinct_r"), lit(1L))))
          .cast("long").as("est_join_rows_uniform"))
  }

  /** Result caching (reference lru_cache of SELECT results,
    * `postgres_manager.py:594-631`) → Spark's own cache manager, keyed
    * by plan (so any equivalent DataFrame hits it).
    */
  def cache(df: DataFrame): DataFrame = { df.cache(); df }
  def uncache(df: DataFrame): Unit = df.unpersist()
  def clearAllCaches(spark: SparkSession): Unit =
    spark.catalog.clearCache()

  /** EXPLAIN surface (`postgres_manager.py:537-540, 1134-1151`):
    * formatted/cost/codegen plan text.
    */
  def explain(df: DataFrame, mode: String = "formatted"): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(mode))

  /** Plan introspection helpers for scale review: does the physical
    * plan show pushed filters / whole-stage codegen / broadcast?
    */
  def planSummary(df: DataFrame): PlanSummary = {
    val plan = explain(df, "formatted")
    PlanSummary(
      hasPushedFilters =
        raw"PushedFilters: \[[^\]]".r.findFirstIn(plan).isDefined,
      // formatted mode marks codegen spans "(codegen id : N)";
      // simple mode uses "*(N)" prefixes — accept either
      wholeStageCodegen = plan.contains("codegen id") ||
        explain(df, "simple").contains("*("),
      hasBroadcastJoin = plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastNestedLoopJoin"),
      // formatted mode prints each node once in the tree and once as a
      // "(N) Exchange" detail header — count headers for the true node
      // count (a bare substring count reports 2x)
      exchangeCount = raw"\(\d+\) Exchange".r.findAllIn(plan).size)
  }

  /** [[planSummary]] with AQE disabled during plan build: under AQE,
    * codegen stages exist only after runtime materialization, so a
    * pre-execution summary of an exchange-bearing plan under-reports.
    * `build` is re-evaluated under the temporary conf (DataFrames are
    * lazy — construction cost is planning only).
    */
  def planSummaryNoAqe(spark: SparkSession, build: => DataFrame): PlanSummary = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try planSummary(build) finally spark.conf.set(key, prev)
  }

  /** Key-skew diagnosis — the pre-flight check before keying a 100 TB
    * shuffle: per-key counts, each hot key's share, and the table-wide
    * skew factor (max key count ÷ mean key count; 1.0 = uniform). The
    * number that tells you whether a join needs
    * [[graft.store.ScaleJoins.saltedJoin]] or AQE skew handling before
    * the straggler appears. One aggregation shuffle on the key; the
    * scalar totals ride a broadcast.
    */
  def keySkewReport(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions._
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum(col("n")).as("total"), count(lit(1)).as("nkeys"),
      max(col("n")).as("maxn"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("n"),
        round(col("n") / col("total").cast("double") * 100, 6)
          .cast("double").as("pct_share"),
        round(col("maxn") * col("nkeys") / col("total").cast("double"), 6)
          .cast("double").as("skew_factor"))
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
  }

  /** Shuffle-partition sizing from the optimizer's own size estimate:
    * ceil(estimated bytes / target bytes-per-partition). The knob the
    * 100 TB brief says to size so partitions fit executor memory —
    * computed instead of guessed. Catalyst's `sizeInBytes` comes from
    * file footers for scans and selectivity estimates above them, so
    * it's cheap (no job) and right-order-of-magnitude, which is all
    * partition sizing needs. Clamped to ≥ 1; callers typically round
    * up to a multiple of executor cores.
    */
  def recommendShufflePartitions(df: DataFrame,
      targetPartitionBytes: Long = 128L << 20): Int = {
    require(targetPartitionBytes > 0)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = (bytes + targetPartitionBytes - 1) / targetPartitionBytes
    n.min(BigInt(Int.MaxValue)).max(1).toInt
  }

  /** Cancel a running job group — the reference's terminate-session
    * (`postgres_manager.py:297-307`). */
  def cancelJobGroup(spark: SparkSession, group: String): Unit =
    spark.sparkContext.cancelJobGroup(group)

  final case class PlanSummary(
      hasPushedFilters: Boolean,
      wholeStageCodegen: Boolean,
      hasBroadcastJoin: Boolean,
      exchangeCount: Int)
}
