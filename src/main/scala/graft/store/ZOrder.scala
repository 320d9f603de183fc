package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-column data-skipping
  * layout: rows sorted by the interleaved bits of several columns land
  * in files whose per-file min/max footers are narrow in EVERY
  * dimension, so a scan filtered on ANY of the z-columns skips most
  * files. A single-column sort gives perfect skipping on one column
  * and none on the others; the Morton curve trades a little of each
  * for useful bounds on all.
  *
  * The z-value is a static expression tree (fixed shift/mask/or
  * terms — no higher-order functions, stays in whole-stage codegen),
  * and the layout write is `repartitionByRange` on it: Spark's range
  * partitioner samples the z-value distribution, so files get
  * contiguous z-ranges — exactly the property the footer bounds need.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each (non-negative integral)
    * column round-robin: bit j of column c lands at position
    * `j * k + (k - 1 - c)` — column 0 owns the most significant slot
    * of each group. Result width = bits * k ≤ 63.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits * cols must fit a signed long, got $bits * ${cols.size}")
    val k = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), j).bitwiseAND(lit(1L)),
      j * k + (k - 1 - ci))
    terms.reduce(_ bitwiseOR _)
  }

  /** Scale a numeric column into [0, 2^bits) by its global min/max
    * (computed in `bounds`, a broadcast single-row frame with columns
    * `<name>_lo` / `<name>_hi`). Degenerate constant columns map to 0.
    */
  private def scaled(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val span = hi.cast("double") - lo.cast("double")
    val unit = (c.cast("double") - lo.cast("double")) / span
    val top = (1L << bits) - 1
    when(span === 0.0, lit(0L))
      .otherwise(least(floor(unit * (top + 1)).cast("long"), lit(top)))
  }

  /** Write `df` z-ordered on `zCols` into `nFiles` parquet files at
    * `path`. Two jobs: a scalar min/max aggregate per z-column (the
    * scaling bounds), then one range-shuffle write on the z-value.
    * At 100 TB this is the same shape as any global sort write —
    * sample, range-exchange, write — with the z-value as sort key.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      nFiles: Int, bits: Int = 16): Unit = {
    require(zCols.nonEmpty && nFiles > 0)
    val aggs = zCols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}__lo"), max(col(c)).as(s"${c}__hi")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val scaledCols = zCols.map(c =>
      scaled(col(c), col(s"${c}__lo"), col(s"${c}__hi"), bits))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", zValue(scaledCols, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop((zCols.flatMap(c => Seq(s"${c}__lo", s"${c}__hi")) :+ "__z"): _*)
      .write.mode("overwrite").parquet(path)
  }
}
