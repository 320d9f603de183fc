package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.TimeCols.epochUs

/** The reference's transform stage re-expressed as declarative Spark
  * plans (SURVEY §3.2).
  *
  * Reference behavior being reproduced:
  *  - melt: wide per-meter CSV → long `(timestamp, building_id,
  *    meter_reading, meter)` with the meter name taken from the file
  *    stem (`src/data_transformation/data_transformer.py:169-211`,
  *    constant column at `:208`, stem at `:260`).
  *  - normalize: min-max scaling of a measure column
  *    (`data_transformer.py:139-167`). The reference computes min/max
  *    PER 50k-ROW CHUNK — an artifact of its chunked executor, not a
  *    well-defined dataset operator (documented wart, SURVEY §7.4.2).
  *    Here normalization is defined over the whole dataset or per
  *    group, which is the semantics the reference's own tests assert
  *    (bounds 0/1 per processed unit).
  *  - transform routing by folder name
  *    (`data_transformer.py:376-383`): metadata/weather folders pass
  *    through unchanged, everything else melts.
  *
  * Scale: melt is a Generate (UNPIVOT) — no shuffle at all; each input
  * split expands locally by the number of value columns. Global
  * normalize is one scalar aggregate broadcast back over the scan;
  * per-group normalize is one window shuffle on the group key.
  */
object Transforms {

  /** Wide → long melt. `idCols` are kept as identifiers; every other
    * column (or `valueCols` if given) becomes a row of
    * (`variableName`, `valueName`).
    *
    * Mirrors `pd.melt(frame, id_vars=['timestamp'],
    * var_name='building_id', value_name='meter_reading')`
    * (`data_transformer.py:195-207`).
    */
  def melt(
      df: DataFrame,
      idCols: Seq[String],
      valueCols: Seq[String] = Nil,
      variableName: String = "building_id",
      valueName: String = "meter_reading"): DataFrame = {
    val values =
      if (valueCols.nonEmpty) valueCols
      else df.columns.filterNot(idCols.contains).toSeq
    require(values.nonEmpty, "melt needs at least one value column")
    df.unpivot(
      idCols.map(col).toArray,
      values.map(col).toArray,
      variableName,
      valueName)
  }

  /** Melt + constant meter column from the source file stem —
    * the full per-file transform (`data_transformer.py:195-211`). */
  def meltMeterFile(df: DataFrame, meterType: String): DataFrame =
    melt(df, idCols = Seq("timestamp"))
      .withColumn("meter", lit(meterType))

  /** Dataset-global min-max normalize: (x - min) / (max - min).
    * Degenerate range (min == max) maps to 0.0, matching the
    * reference's guard (`data_transformer.py:155-158` returns the
    * column unscaled only when the range is 0; tests only assert the
    * non-degenerate case — we pin 0.0 and document it).
    *
    * Plan shape: scalar agg + broadcast nested-loop join of one row —
    * the big side is never shuffled.
    */
  def normalizeGlobal(df: DataFrame, valueCol: String,
      outCol: String = "normalized"): DataFrame = {
    val bounds = df.agg(
      min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(outCol, normExpr(col(valueCol), col("__lo"), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Per-group min-max normalize — one window shuffle on the keys. */
  def normalizePerGroup(df: DataFrame, valueCol: String,
      groupCols: Seq[String], outCol: String = "normalized"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("__lo", min(col(valueCol).cast("double")).over(w))
      .withColumn("__hi", max(col(valueCol).cast("double")).over(w))
      .withColumn(outCol, normExpr(col(valueCol), col("__lo"), col("__hi")))
      .drop("__lo", "__hi")
  }

  private def normExpr(x: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0.0))
      .otherwise((x.cast("double") - lo) / (hi - lo))

  /** Folder-name → transform routing (`data_transformer.py:376-383`):
    * metadata/weather folders get identity, everything else melts with
    * the file stem as the meter name.
    */
  def transformForFolder(folderName: String, fileStem: String): DataFrame => DataFrame = {
    val lower = folderName.toLowerCase
    if (lower.contains("metadata") || lower.contains("weather")) identity
    else meltMeterFile(_, fileStem)
  }

  /** Round-trip inverse of [[melt]] for property tests: long → wide. */
  def pivotWide(df: DataFrame, idCol: String, variableCol: String,
      valueCol: String): DataFrame =
    df.groupBy(col(idCol))
      .pivot(variableCol)
      .agg(first(col(valueCol)))

  /** Linear interpolation of NULL readings between each entity's
    * nearest non-null neighbors — the sensor-gap repair one step past
    * LOCF (which EventQueries' gap fill covers): interior gaps take
    * the time-weighted line between the bracketing readings, leading
    * gaps backfill, trailing gaps carry forward, and an all-null
    * series stays null. One window shuffle on the entity key serves
    * all four navigation functions (two running frames over one sort).
    * Arithmetic is exact-integer µs deltas into one IEEE multiply-add,
    * so results are engine-reproducible (the q_interpolate oracle).
    */
  def interpolateLinear(df: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    // tieBreak: ROWS frames over duplicate timestamps are order-
    // sensitive — pass a unique suffix (e.g. the event id) whenever
    // (entity, ts) is not already unique
    val order = col(tsCol) +: tieBreak.map(col)
    val wPrev = Window.partitionBy(col(entityCol))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(entityCol))
      .orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val tUs = epochUs(col(tsCol))
    val prevV = last(v, ignoreNulls = true).over(wPrev)
    val prevT = last(when(v.isNotNull, tUs), ignoreNulls = true).over(wPrev)
    val nextV = first(v, ignoreNulls = true).over(wNext)
    val nextT = first(when(v.isNotNull, tUs), ignoreNulls = true).over(wNext)
    val interp = when(v.isNotNull, v)
      .when(prevV.isNull, nextV) // leading gap: backfill
      .when(nextV.isNull, prevV) // trailing gap: carry forward
      .otherwise(prevV + (nextV - prevV)
        * ((tUs - prevT).cast("double") / (nextT - prevT).cast("double")))
    df.withColumn(s"${valueCol}_interp", interp)
  }
}
