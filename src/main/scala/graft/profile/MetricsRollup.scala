package graft.profile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.Warehouse

/** Pre-aggregated ADDITIVE metrics — the exact-arithmetic twin of
  * [[SketchRollup]]: one `(day, dims…) → (count, sum, min, max)` row
  * per day per dimension tuple, stored as a normal warehouse table.
  * Any-date-range aggregates come from re-aggregating the matching day
  * rows — KBs read instead of the raw corpus — and, unlike the sketch
  * family, the answers are EXACT: counts add, decimal sums add, min/
  * max compose, and avg derives from sum/count. That exactness is the
  * whole point of keeping sums in DECIMAL through the rollup (IEEE
  * double addition is order-sensitive; decimal addition is not), so
  * the rollup read is bit-equal to a direct aggregate of the raw rows.
  *
  * Late/incremental data: [[updateDaily]] aggregates only the incoming
  * batch and MERGEs it into the stored rows, combining same-(day,dims)
  * summaries additively — history is never rescanned, and only touched
  * partitions rewrite (Warehouse.merge semantics).
  */
object MetricsRollup {

  /** Decimal type carried through the rollup: wide enough to add ~1e12
    * rows of ±1e9 values without overflow, exact to 6 places. */
  private val SumType = "decimal(30,6)"

  /** One additive summary row per (day of `timeCol`, `dims…`). */
  def dailyMetrics(df: DataFrame, timeCol: String, dims: Seq[String],
      valCol: String): DataFrame =
    df.groupBy(to_date(col(timeCol)).as("day") +: dims.map(col): _*)
      .agg(count(lit(1)).as("m_count"),
        sum(col(valCol).cast(SumType)).as("m_sum"),
        min(col(valCol)).as("m_min"),
        max(col(valCol)).as("m_max"))

  /** Exact aggregates over `[from, to]` (inclusive date strings) per
    * dimension tuple, computed from the stored day rows: count, total,
    * min, max, and avg (sum cast to double once, then divided — the
    * same IEEE operation any engine computes from the same exact sum).
    */
  def metricsRange(rollup: DataFrame, from: String, to: String,
      dims: Seq[String]): DataFrame =
    rollup
      .filter(col("day").between(lit(from).cast("date"), lit(to).cast("date")))
      .groupBy(dims.map(col): _*)
      .agg(sum(col("m_count")).as("n"),
        sum(col("m_sum")).as("__total"),
        min(col("m_min")).as("vmin"),
        max(col("m_max")).as("vmax"))
      .select(dims.map(col) ++ Seq(
        col("n"),
        col("__total").cast("double").as("total"),
        col("vmin"), col("vmax"),
        (col("__total").cast("double") / col("n").cast("double")).as("vavg")): _*)

  /** Fold a new batch into the stored rollup: aggregate ONLY the batch,
    * combine with existing same-(day,dims) rows additively, MERGE back.
    * Idempotence caveat (same as any additive rollup): replaying the
    * same batch double-counts — feed this from an exactly-once channel
    * (e.g. [[graft.streaming.StreamIngest]]'s checkpointed batches).
    */
  def updateDaily(warehouse: Warehouse, table: String, batch: DataFrame,
      timeCol: String, dims: Seq[String], valCol: String): Unit = {
    val fresh = dailyMetrics(batch, timeCol, dims, valCol)
    val keys = "day" +: dims
    if (!warehouse.tableExists(table)) {
      // partition by day: a late batch then rewrites ONLY its days'
      // directories (Warehouse.merge partitioned branch), not the
      // whole rollup history
      warehouse.createTable(table, fresh.schema, uniqueKeys = keys,
        partitionBy = Seq("day"))
      warehouse.append(table, fresh)
    } else {
      val existing = warehouse.read(table).select(
        (keys.map(col) :+ col("m_count").as("__c") :+ col("m_sum").as("__s")
          :+ col("m_min").as("__mn") :+ col("m_max").as("__mx")): _*)
      // m_sum must combine like SQL sum: NULL+x would null out a stored
      // sum when a late group's values are all NULL. Coalesce the
      // OPERANDS (not the result of the add): coalescing the sum would
      // also swallow a non-ANSI overflow NULL into a silently-wrong
      // batch-only total. NULL only when both sides are (least/greatest
      // already skip NULLs; count is never NULL).
      val bothNull = col("m_sum").isNull && col("__s").isNull
      val combined = fresh.join(existing, keys, "left")
        .select((keys.map(col) ++ Seq(
          (col("m_count") + coalesce(col("__c"), lit(0L))).as("m_count"),
          when(bothNull, lit(null).cast(SumType))
            .otherwise((coalesce(col("m_sum"), lit(0).cast(SumType))
              + coalesce(col("__s"), lit(0).cast(SumType))).cast(SumType))
            .as("m_sum"),
          least(col("m_min"), coalesce(col("__mn"), col("m_min"))).as("m_min"),
          greatest(col("m_max"), coalesce(col("__mx"), col("m_max"))).as("m_max"))): _*)
      warehouse.merge(table, combined, keys)
    }
  }
}
