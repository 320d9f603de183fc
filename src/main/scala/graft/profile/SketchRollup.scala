package graft.profile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.Warehouse

/** Pre-aggregated distinct-count sketches — the pattern that replaces
  * "rescan history" with "union tiny summaries" at 100 TB: one HLL
  * sketch per day (Spark 4's Datasketches `hll_sketch_agg`), stored as
  * a normal warehouse table, answering `count(DISTINCT …)` over ANY
  * date range by `hll_union_agg` over the matching day rows — KBs
  * read instead of the raw corpus, error bound unchanged (HLL union
  * is register-wise max: merging day sketches never loses information
  * or degrades the error bound. The union's ESTIMATE can differ from
  * a direct one-shot sketch's below the sparse threshold, where the
  * direct sketch is still coupon-exact — q_sketch_rollup bounds both
  * against the exact count).
  *
  * Late/incremental data: [[updateDaily]] re-sketches only the
  * incoming batch's days and `hll_union`s them into the stored rows
  * (MERGE keyed by day) — history is never rescanned.
  */
object SketchRollup {

  /** One HLL sketch per day of `timeCol` over `keyCol`.
    * Output: `(day date, sketch binary)`. */
  def dailySketches(df: DataFrame, timeCol: String, keyCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(to_date(col(timeCol)).as("day"))
      .agg(call_function("hll_sketch_agg", col(keyCol), lit(lgK))
        .as("sketch"))

  /** Distinct estimate over `[from, to]` (inclusive date strings) by
    * unioning the stored day sketches. One row: `(estimate bigint)`. */
  def estimateRange(sketches: DataFrame, from: String, to: String): DataFrame =
    sketches
      .filter(col("day").between(lit(from).cast("date"), lit(to).cast("date")))
      .agg(call_function("hll_sketch_estimate",
        call_function("hll_union_agg", col("sketch"))).as("estimate"))

  /** Fold a new batch into the stored per-day sketch table: sketch the
    * batch's days, `hll_union` with existing same-day rows, MERGE back.
    * Only the touched day rows rewrite; the raw history is not read.
    */
  def updateDaily(warehouse: Warehouse, table: String, batch: DataFrame,
      timeCol: String, keyCol: String, lgK: Int = 12): Unit =
    mergeDaily(warehouse, table, dailySketches(batch, timeCol, keyCol, lgK),
      "hll_union")

  /** One KLL quantile sketch per day of `timeCol` over double `valCol`
    * (Spark 4's Datasketches `kll_sketch_agg_double`). Output:
    * `(day date, sketch binary)`. k=200 gives ~1.65% normalized rank
    * error, preserved exactly under merge — any-range percentiles from
    * KB-sized day rows, same shape as the HLL distinct rollup.
    */
  def dailyQuantileSketches(df: DataFrame, timeCol: String, valCol: String,
      k: Int = 200): DataFrame =
    df.groupBy(to_date(col(timeCol)).as("day"))
      .agg(call_function("kll_sketch_agg_double", col(valCol), lit(k))
        .as("sketch"))

  /** Percentiles over `[from, to]` by merging the stored day sketches:
    * one row, a `p_<q>` double column per requested quantile (dots
    * stripped: 0.95 → `p_95`) plus `n` (exact item count — KLL tracks
    * n losslessly through merges).
    */
  def quantileRange(sketches: DataFrame, from: String, to: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1))
    val merged = sketches
      .filter(col("day").between(lit(from).cast("date"), lit(to).cast("date")))
      .agg(call_function("kll_merge_agg_double", col("sketch")).as("msk"))
    val cols = qs.map { q =>
      val pct = (BigDecimal(q) * 100).bigDecimal.stripTrailingZeros
        .toPlainString.replace(".", "_")
      call_function("kll_sketch_get_quantile_double", col("msk"), lit(q))
        .as(s"p_$pct")
    } :+ call_function("kll_sketch_get_n_double", col("msk")).as("n")
    merged.select(cols: _*)
  }

  /** Incremental twin of [[updateDaily]] for quantile sketches: only
    * the batch's days re-sketch and MERGE (`kll_sketch_merge_double`
    * with existing same-day rows); history is never rescanned.
    */
  def updateDailyQuantiles(warehouse: Warehouse, table: String,
      batch: DataFrame, timeCol: String, valCol: String,
      k: Int = 200): Unit =
    mergeDaily(warehouse, table,
      dailyQuantileSketches(batch, timeCol, valCol, k),
      "kll_sketch_merge_double")

  /** MERGE `fresh` `(day, sketch)` rows into `table`, combining
    * same-day sketches with the binary scalar `mergeFn`. */
  private def mergeDaily(warehouse: Warehouse, table: String,
      fresh: DataFrame, mergeFn: String): Unit = {
    if (!warehouse.tableExists(table)) {
      warehouse.createTable(table, fresh.schema, uniqueKeys = Seq("day"))
      warehouse.append(table, fresh)
    } else {
      val existing = warehouse.read(table)
        .withColumnRenamed("sketch", "__old_sketch")
      val combined = fresh.join(existing, Seq("day"), "left")
        .select(col("day"),
          when(col("__old_sketch").isNull, col("sketch"))
            .otherwise(call_function(mergeFn,
              col("__old_sketch"), col("sketch"))).as("sketch"))
      warehouse.merge(table, combined, Seq("day"))
    }
  }
}
