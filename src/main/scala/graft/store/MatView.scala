package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One declarative measure of a materialized view. `kind` picks the
  * partial-state representation:
  *
  *  - `count`          → one long, merged by sum
  *  - `sum`/`avg`      → exact decimal(38,6) partial sum (+ count for
  *                       avg), merged by sum — order-insensitive, so
  *                       any refresh schedule finalizes identically
  *  - `min`/`max`      → source-typed extremum, merged by min/max
  *  - `hll`            → Datasketches HLL register blob
  *                       (`hll_sketch_agg`), merged by `hll_union_agg`
  *                       — register max is associative + commutative,
  *                       so the incremental estimate is BIT-IDENTICAL
  *                       to a one-shot build, not merely close
  *  - `bottomk`        → KMV quantile sample over `src` prioritized
  *                       by `aux` ([[graft.plans.BottomKSample]];
  *                       needs a GraftExtensions session) — min-k
  *                       under union is a set op, so the incremental
  *                       sample is bit-identical to one-shot too
  */
final case class MvMeasure(kind: String, src: String = "",
    aux: String = "") {
  require(MvMeasure.kinds(kind), s"unknown measure kind: $kind")
  require(kind == "count" || src.nonEmpty, s"$kind needs a source column")
  require(kind != "bottomk" || aux.nonEmpty,
    "bottomk needs aux = priority column")

  /** Output / state column tag, e.g. `sum_l_quantity`. */
  def tag: String = if (kind == "count") "cnt" else s"${kind}_$src"
}

object MvMeasure {
  val kinds = Set("count", "sum", "min", "max", "avg", "hll", "bottomk")
}

/** A keyed aggregate view definition: `GROUP BY keys` + measures. */
final case class MatViewDef(name: String, keys: Seq[String],
    measures: Seq[MvMeasure]) {
  require(keys.nonEmpty && measures.nonEmpty, "keys and measures required")
  require(measures.map(_.tag).distinct.size == measures.size,
    "duplicate measure tags")
  def stateTable: String = s"_mv_$name"
}

/** Incremental materialized aggregate views over PARTIAL STATES — the
  * rollup-maintenance layer a 100 TB fact table needs: refreshing a
  * dashboard aggregate must cost O(|delta| + |state|), never a rescan
  * of the fact history. The state table holds one row per group key
  * with MERGEABLE partials (counts, exact decimal sums, extrema, HLL
  * registers); each new batch is aggregated alone (map-side combined,
  * one exchange over the batch) and folded into the state with a
  * second aggregation over `state ∪ batch-partials` — state is
  * key-cardinality-sized, so the fold is small at any fact scale.
  *
  * Exactness contract (proven in MatViewSpec and the
  * `q_matview_rollup` oracle): every partial here is associative and
  * commutative — decimal sums (not IEEE doubles), min/max, HLL
  * register max — so ANY refresh schedule (one batch, many batches,
  * any order) produces the same finalized view as a one-shot
  * aggregation over the full data. This is the same partial/merge/
  * finalize split Spark's own partial aggregation uses inside one
  * query, lifted to durable state across queries.
  *
  * Reference analogue: the reference refreshed its reporting
  * aggregates by re-running full GROUP BY SQL over the store
  * (`postgres_manager.py:1090-1131` aggregation surface); this is the
  * incremental re-expression of that surface.
  */
object MatView {

  /** Partial-state aggregation of one batch: one map-side-combined
    * exchange over the batch, output is one row per key present in it.
    */
  def partial(df: DataFrame, mv: MatViewDef): DataFrame =
    df.groupBy(mv.keys.map(col): _*).agg(partialAggs(mv).head,
      partialAggs(mv).tail: _*)

  /** Fold two partial-state frames into one — associative and
    * commutative, usable both for batch-at-a-time refresh and for
    * tree-merging per-shard states.
    */
  def mergeStates(a: DataFrame, b: DataFrame, mv: MatViewDef): DataFrame =
    a.unionByName(b).groupBy(mv.keys.map(col): _*)
      .agg(mergeAggs(mv).head, mergeAggs(mv).tail: _*)

  /** Finalize partial state into the user-facing view. */
  def finalizeView(state: DataFrame, mv: MatViewDef): DataFrame =
    state.select(mv.keys.map(col) ++ mv.measures.map(finalCol): _*)

  /** Fold a new delta batch into the durable state table — create on
    * first refresh, else merge + crash-safe replace (the working-dir
    * write materializes the merge before the old state dir moves).
    */
  def refresh(wh: Warehouse, mv: MatViewDef, delta: DataFrame): Unit = {
    val p = partial(delta, mv)
    if (!wh.tableExists(mv.stateTable)) {
      wh.createTable(mv.stateTable, p.schema)
      wh.append(mv.stateTable, p)
    } else
      wh.replaceTable(mv.stateTable, mergeStates(wh.read(mv.stateTable), p, mv))
  }

  /** The finalized view from durable state. */
  def readView(wh: Warehouse, mv: MatViewDef): DataFrame =
    finalizeView(wh.read(mv.stateTable), mv)

  /** CUBE variant of [[partial]]: one state row per (grouping set ×
    * key combination), keyed by `__gid` (Spark's `grouping_id()`, bit
    * per key column, first key most significant — the same convention
    * DuckDB's GROUPING_ID uses, which is what lets q_matview_cube
    * oracle the incremental cube exactly). Because every grouping set
    * aggregates independently, cube-of-union equals merge-of-cubes
    * and the whole [[mergeStates]]/[[finalizeView]] algebra applies
    * unchanged with `__gid` prepended to the keys. The `__gid` column
    * also disambiguates a rolled-up NULL from a genuine null key
    * value.
    */
  def partialCube(df: DataFrame, mv: MatViewDef): DataFrame =
    df.cube(mv.keys.map(col): _*)
      .agg(grouping_id().as("__gid"), partialAggs(mv): _*)

  /** Merge two cube states — [[mergeStates]] keyed by gid + keys. */
  def mergeCubes(a: DataFrame, b: DataFrame, mv: MatViewDef): DataFrame =
    a.unionByName(b).groupBy((col("__gid") +: mv.keys.map(col)): _*)
      .agg(mergeAggs(mv).head, mergeAggs(mv).tail: _*)

  /** Finalize a cube state, gid retained for grouping-set selection. */
  def finalizeCube(state: DataFrame, mv: MatViewDef): DataFrame =
    state.select(
      (col("__gid") +: mv.keys.map(col)) ++ mv.measures.map(finalCol): _*)

  private val AppliedMarker = "_mv_applied_batch"

  /** Exactly-once fold for REPLAYABLE delivery (Structured Streaming's
    * foreachBatch re-runs a batch after a crash): the applied batch id
    * rides the state swap as an atomic sidecar, so at every crash
    * point the pair (state, marker) is either entirely old or entirely
    * new — a replayed batch whose id is already stamped is a no-op,
    * never a double-count. Returns whether the fold was applied.
    * Batch ids must be monotonically increasing (Structured
    * Streaming's contract for foreachBatch).
    */
  def refreshOnce(wh: Warehouse, mv: MatViewDef, delta: DataFrame,
      batchId: Long): Boolean = {
    val applied = wh.readTableFile(mv.stateTable, AppliedMarker)
      .map(_.trim.toLong)
    if (applied.exists(_ >= batchId)) false
    else {
      val p = partial(delta, mv)
      val next =
        if (wh.tableExists(mv.stateTable)) mergeStates(wh.read(mv.stateTable), p, mv)
        else p
      wh.replaceTable(mv.stateTable, next,
        Map(AppliedMarker -> batchId.toString))
      true
    }
  }

  private val SumType = "decimal(38,6)"
  private val HllLgK = 12

  /** Sample width for `bottomk` measures — quantile estimates from the
    * finalized sample carry O(1/√k) rank error.
    */
  val BottomK = 64

  private def partialAggs(mv: MatViewDef): Seq[Column] =
    mv.measures.flatMap { m =>
      m.kind match {
        case "count" => Seq(count(lit(1)).as(m.tag))
        case "sum"   => Seq(sum(col(m.src).cast(SumType)).as(m.tag))
        case "min"   => Seq(min(col(m.src)).as(m.tag))
        case "max"   => Seq(max(col(m.src)).as(m.tag))
        case "avg"   => Seq(
          sum(col(m.src).cast(SumType)).as(s"${m.tag}__sum"),
          count(col(m.src)).as(s"${m.tag}__cnt"))
        case "hll"   => Seq(
          call_function("hll_sketch_agg", col(m.src), lit(HllLgK)).as(m.tag))
        case "bottomk" => Seq(
          call_function("bottom_k_sample", col(m.src), col(m.aux),
            lit(BottomK)).as(m.tag))
      }
    }

  private def mergeAggs(mv: MatViewDef): Seq[Column] =
    mv.measures.flatMap { m =>
      m.kind match {
        case "count" => Seq(sum(col(m.tag)).as(m.tag))
        case "sum"   => Seq(sum(col(m.tag)).cast(SumType).as(m.tag))
        case "min"   => Seq(min(col(m.tag)).as(m.tag))
        case "max"   => Seq(max(col(m.tag)).as(m.tag))
        case "avg"   => Seq(
          sum(col(s"${m.tag}__sum")).cast(SumType).as(s"${m.tag}__sum"),
          sum(col(s"${m.tag}__cnt")).as(s"${m.tag}__cnt"))
        case "hll"   => Seq(
          call_function("hll_union_agg", col(m.tag), lit(true)).as(m.tag))
        // min-k under union is a set op: flatten the (few) per-key
        // state arrays, sort by (priority, value), keep k — the same
        // selection BottomKSample itself makes, in any merge order
        case "bottomk" => Seq(
          slice(array_sort(flatten(collect_list(col(m.tag)))), 1, BottomK)
            .as(m.tag))
      }
    }

  private def finalCol(m: MvMeasure): Column = m.kind match {
    case "avg" =>
      (col(s"${m.tag}__sum").cast("double") / col(s"${m.tag}__cnt")).as(m.tag)
    case "hll" =>
      call_function("hll_sketch_estimate", col(m.tag)).as(m.tag)
    // sorted sample VALUES — order statistics read by element_at
    case "bottomk" =>
      array_sort(transform(col(m.tag), e => e("v"))).as(m.tag)
    case _ => col(m.tag)
  }
}
