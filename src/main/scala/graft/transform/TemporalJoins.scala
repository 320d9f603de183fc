package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.TimeCols.epochUs

/** Temporal join operators Spark's built-ins don't express directly:
  * backward as-of join and point-in-interval range join.
  *
  * Both avoid the naive shapes that die at scale: the as-of join is
  * NOT a theta-join + aggregation (which explodes to |L|·|R| per key
  * before picking the max) but a single union + one window pass; the
  * range join is NOT a cross join + filter but a bin-granular
  * equi-join. One shuffle each, keyed, AQE-splittable.
  */
object TemporalJoins {

  /** Backward as-of join: for every left row, the single most recent
    * right row with `right.timeCol <= left.timeCol` in the same key
    * group (pandas `merge_asof` / DuckDB `ASOF JOIN` semantics,
    * left-outer: unmatched left rows keep nulls).
    *
    * Distributed shape: tag both sides, union, and run ONE window
    * pass per key ordered by (time, tag, tiebreak) — right rows sort
    * before left rows at equal timestamps (<= is inclusive), and
    * `last(payload, ignoreNulls)` over the running frame carries the
    * latest right payload forward into each left row. |L|+|R| rows
    * shuffle exactly once on the key; no per-key explosion, no range
    * self-join, skew handled by AQE like any window.
    *
    * `tiebreakCols` (right-side columns, compared ascending) make the
    * winner among equal-timestamp right rows deterministic: the max
    * tiebreak wins — mirror `ORDER BY time DESC, tiebreak DESC LIMIT
    * 1` in a SQL oracle.
    *
    * `toleranceMicros`: optional max age; a carried match older than
    * the tolerance is nulled out (merge_asof's `tolerance`).
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tiebreakCols: Seq[String] = Nil,
      prefix: String = "asof_",
      toleranceMicros: Option[Long] = None): DataFrame =
    asofJoin(left, right, keys, leftTime, rightTime, payload,
      tiebreakCols, prefix, toleranceMicros, forward = false)

  /** Forward as-of join: the single EARLIEST right row with
    * `right.timeCol >= left.timeCol` (merge_asof `direction=
    * 'forward'`). Same single-window shape scanning time descending;
    * the min tiebreak wins among equal-timestamp right rows (mirror
    * `ORDER BY time ASC, tiebreak ASC LIMIT 1`).
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tiebreakCols: Seq[String] = Nil,
      prefix: String = "asof_",
      toleranceMicros: Option[Long] = None): DataFrame =
    asofJoin(left, right, keys, leftTime, rightTime, payload,
      tiebreakCols, prefix, toleranceMicros, forward = true)

  /** Both sides aligned to the union schema `(keys…, __t, __isLeft,
    * __lrow, __rpay, __tie)` — the shared front half of every as-of
    * variant. Left rows carry the full original row as a struct; right
    * rows carry `(rt, payload…)` plus the tiebreak struct.
    */
  private def alignSides(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tiebreakCols: Seq[String]): (DataFrame, Seq[String]) = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(payload.nonEmpty, "payload columns to carry must be non-empty")

    val leftCols = left.columns.toSeq
    val lrowStruct = struct(leftCols.map(col): _*)
    val rpayStruct = struct(
      (col(rightTime).as("__rt") +: payload.map(c => col(c).as(c))): _*)
    // right rows order among themselves by the tiebreak struct; left
    // rows never compare against it (the __isLeft key separates them)
    val tieStruct =
      if (tiebreakCols.isEmpty) struct()
      else struct(tiebreakCols.map(col): _*)
    val lrowType = left.select(lrowStruct).schema.head.dataType
    val rpayType = right.select(rpayStruct).schema.head.dataType
    val tieType = right.select(tieStruct).schema.head.dataType

    val lAligned = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__isLeft"),
        lrowStruct.as("__lrow"),
        lit(null).cast(rpayType).as("__rpay"),
        lit(null).cast(tieType).as("__tie")): _*)
    val rAligned = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__isLeft"),
        lit(null).cast(lrowType).as("__lrow"),
        rpayStruct.as("__rpay"),
        tieStruct.as("__tie")): _*)
    (lAligned.unionByName(rAligned), leftCols)
  }

  /** The common output projection: original left columns back out of
    * `__lrow`, matched right time + payload out of `__match`.
    */
  private def projectOut(withMatch: DataFrame, leftCols: Seq[String],
      rightTime: String, payload: Seq[String], prefix: String): DataFrame = {
    val out = leftCols.map(c => col(s"__lrow.$c").as(c)) ++
      (col("__match.__rt").as(s"$prefix$rightTime") +:
        payload.map(c => col(s"__match.$c").as(s"$prefix$c")))
    withMatch.select(out: _*)
  }

  private def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tiebreakCols: Seq[String],
      prefix: String,
      toleranceMicros: Option[Long],
      forward: Boolean): DataFrame = {
    val (unioned, leftCols) = alignSides(
      left, right, keys, leftTime, rightTime, payload, tiebreakCols)
    // backward scans time ascending: the carried last-right is the
    // LATEST rt <= lt, max tiebreak among equals. forward scans
    // descending: the carried last-right is the EARLIEST rt >= lt
    // (scanned closest-last), min tiebreak among equals. Right rows
    // sort before left at equal __t either way — <=/>= inclusive.
    val (tOrd, tieOrd) =
      if (forward) (col("__t").desc, col("__tie").desc)
      else (col("__t").asc, col("__tie").asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tOrd, col("__isLeft").asc, tieOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__isLeft") === 1)

    val withTol = toleranceMicros match {
      case Some(tol) =>
        val age =
          if (forward) epochUs(col("__match.__rt")) - epochUs(col("__t"))
          else epochUs(col("__t")) - epochUs(col("__match.__rt"))
        carried.withColumn("__match",
          when(col("__match").isNotNull && age <= tol, col("__match")))
      case None => carried
    }
    projectOut(withTol, leftCols, rightTime, payload, prefix)
  }

  /** Nearest as-of join: the right row closest in ABSOLUTE time
    * distance, either direction (merge_asof `direction='nearest'`).
    * Contract on ties: equal backward/forward distance → the backward
    * match wins; among equal-timestamp right rows the per-direction
    * rule applies (backward: max tiebreak, forward: min tiebreak).
    * Mirror in SQL as `ORDER BY abs(lt - rt), (rt > lt), CASE WHEN
    * rt <= lt THEN -tie ELSE tie END LIMIT 1`.
    *
    * Shape: the SAME single union as backward/forward, with TWO window
    * passes over the SAME key partitioning (ascending and descending
    * time) — Catalyst plans one exchange and two sorts, so the cost is
    * one shuffle + one extra local sort, never a second shuffle. Time
    * columns must be timestamps (distances compare in epoch-µs).
    */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tiebreakCols: Seq[String] = Nil,
      prefix: String = "asof_",
      toleranceMicros: Option[Long] = None): DataFrame = {
    val (unioned, leftCols) = alignSides(
      left, right, keys, leftTime, rightTime, payload, tiebreakCols)
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__isLeft").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__isLeft").asc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__bm", last(col("__rpay"), ignoreNulls = true).over(wB))
      .withColumn("__fm", last(col("__rpay"), ignoreNulls = true).over(wF))
      .filter(col("__isLeft") === 1)
    val bAge = epochUs(col("__t")) - epochUs(col("__bm.__rt"))
    val fAge = epochUs(col("__fm.__rt")) - epochUs(col("__t"))
    def valid(m: Column, age: Column): Column = toleranceMicros match {
      case Some(tol) => m.isNotNull && age <= tol
      case None => m.isNotNull
    }
    val bOk = valid(col("__bm"), bAge)
    val fOk = valid(col("__fm"), fAge)
    val withMatch = carried.withColumn("__match",
      when(bOk && (!fOk || bAge <= fAge), col("__bm"))
        .when(fOk, col("__fm")))
    projectOut(withMatch, leftCols, rightTime, payload, prefix)
  }

  /** Point-in-interval range join via bin-granular equi-join: every
    * `points` row joins every `intervals` row whose `[startCol,
    * endCol]` contains its `pointTime` (inclusive both ends), plus any
    * `extraKeys` equality.
    *
    * Shape: each point maps to exactly ONE time bin of width
    * `binMicros`; each interval explodes into the bins it spans. The
    * join is then a plain equi-join on (extraKeys, bin) + a residual
    * `BETWEEN` filter — no cross product, and each qualifying pair is
    * produced exactly once (the point's single bin). Pick `binMicros`
    * near the typical interval length: explosion factor =
    * len/bin + 1, candidate waste ≈ bin/len.
    */
  def rangeJoinBinned(
      points: DataFrame,
      pointTime: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binMicros: Long,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    def bin(c: Column): Column = floor(epochUs(c) / binMicros)
    val p = points.withColumn("__bin", bin(col(pointTime)))
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    p.join(iv, extraKeys :+ "__bin")
      .filter(col(pointTime) >= col(startCol) &&
        col(pointTime) <= col(endCol))
      .drop("__bin")
  }

  /** Multi-scale point-in-interval range join: the skew-proof
    * generalization of [[rangeJoinBinned]] for corpora whose interval
    * lengths span orders of magnitude (mixed 1-second and 1-day
    * intervals force any SINGLE bin width to either explode the long
    * intervals into ~86,400 bins or flood every short interval's bin
    * with irrelevant candidates).
    *
    * Each interval is assigned to the LEVEL whose bin width
    * `baseBinMicros * 2^level` first covers its own length — so every
    * interval explodes into AT MOST 2 bins regardless of length. Each
    * point probes once per level PRESENT IN THE DATA (the distinct
    * level set is an aggregate, broadcast — never collected), i.e. at
    * most log2(maxLen/baseLen) + 1 rows. The join is an equi-join on
    * (extraKeys, level, bin) + residual BETWEEN; a qualifying pair
    * meets exactly once (the interval lives at one level, the point
    * has one bin there). Total explode factor is O(2·|intervals| +
    * levels·|points|) — bounded, data-independent per row, vs the
    * unbounded `len/bin` of the single-width form.
    */
  def rangeJoinMultiScale(
      points: DataFrame,
      pointTime: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      baseBinMicros: Long,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(baseBinMicros > 0, s"baseBinMicros must be positive, got $baseBinMicros")
    val iv = intervalLevelBins(intervals, startCol, endCol, baseBinMicros)
    val levels = iv.select(col("__lvl")).distinct()
    val p = points
      .join(broadcast(levels)) // one probe row per level present
      .withColumn("__bin",
        floor(epochUs(col(pointTime)) / levelWidth(baseBinMicros, col("__lvl"))))
    p.join(iv, extraKeys ++ Seq("__lvl", "__bin"))
      .filter(col(pointTime) >= col(startCol) &&
        col(pointTime) <= col(endCol))
      .drop("__lvl", "__bin")
  }

  /** Bin width at a level: `baseBinMicros * 2^level`. `pow` is exact
    * for 2^lvl up to 2^52 and the result is cast back to long before
    * the multiply, so bin boundaries are exact integers on both the
    * point and interval sides (levels are clamped to 40 at assignment).
    */
  private def levelWidth(baseBinMicros: Long, lvl: Column): Column =
    lit(baseBinMicros) * pow(2.0, lvl.cast("double")).cast("long")

  /** Intervals exploded into their level-local bins — at most 2 rows
    * per interval by construction (level width ≥ interval length).
    * Engine-visible so specs and probes can measure the explode bound
    * directly.
    */
  private[graft] def intervalLevelBins(
      intervals: DataFrame, startCol: String, endCol: String,
      baseBinMicros: Long): DataFrame = {
    val len = epochUs(col(endCol)) - epochUs(col(startCol))
    // smallest L with base·2^L ≥ len; clamped to [0, 40] (2^40 · base
    // covers any realistic span and keeps the shift exact)
    val lvl = least(lit(40), greatest(lit(0),
      ceil(log(2.0, len.cast("double") / baseBinMicros)).cast("int")))
    val w = levelWidth(baseBinMicros, lvl)
    intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__lvl", lvl)
      .withColumn("__bin", explode(sequence(
        floor(epochUs(col(startCol)) / w), floor(epochUs(col(endCol)) / w))))
  }

  /** Interval×interval OVERLAP join: every left/right pair whose
    * closed intervals intersect (`lStart ≤ rEnd ∧ rStart ≤ lEnd`),
    * plus any `extraKeys` equality — the operator behind temporal
    * "which sessions overlap which incidents" queries, which Spark
    * would otherwise plan as a cross product + filter.
    *
    * Shape: the classic start-point decomposition. Two intervals
    * overlap iff the right's start lies inside the left
    * (`rStart ∈ [lStart, lEnd]`) OR the left's start lies STRICTLY
    * inside the right (`lStart ∈ (rStart, rEnd]`) — exactly one
    * disjunct holds per qualifying pair (the strict bound kills the
    * `lStart = rStart` double count), so the union needs no distinct.
    * Each disjunct is a [[rangeJoinMultiScale]] with one side's starts
    * as the points — both sides get the skew-proof ≤2-bins-per-interval
    * guarantee regardless of how wildly either side's lengths vary.
    * Column names must be disjoint across the two frames (beyond
    * `extraKeys`).
    */
  def intervalOverlapJoin(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      baseBinMicros: Long,
      extraKeys: Seq[String] = Nil): DataFrame = {
    val p1 = rangeJoinMultiScale(right, rStart, left, lStart, lEnd,
      baseBinMicros, extraKeys)
    val p2 = rangeJoinMultiScale(left, lStart, right, rStart, rEnd,
      baseBinMicros, extraKeys)
      .filter(col(lStart) > col(rStart))
    p1.unionByName(p2)
  }
}
