package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data capture between two table snapshots: classify every key
  * as insert / delete / update by ONE keyed full-outer join — the
  * "what changed since yesterday" primitive (Delta's CDF / Iceberg's
  * changelog analogue) for plain parquet layouts.
  *
  * Scale shape: the join is a co-partitioned merge on the key columns
  * — one exchange per side, zero when both snapshots are bucketed on
  * the key. Value comparison is null-safe per column inside the join
  * projection (whole-stage codegen, no UDFs); [[diffHashed]] narrows
  * the compare to one xxhash64 fingerprint per side so wide tables
  * ship two longs through the join instead of every value column —
  * same verdicts ([[SnapshotDiffSpec]] pins the equivalence).
  */
object SnapshotDiff {

  /** Rows that changed between `before` and `after`, keyed by `keys`:
    * output is the key columns plus a `change` tag in
    * {insert, delete, update}; unchanged keys are not emitted.
    * Key columns must be non-null (they identify rows).
    */
  def diff(before: DataFrame, after: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs key columns")
    val vals = before.columns.filterNot(keys.contains)
    require(after.columns.filterNot(keys.contains).sorted.sameElements(
      vals.sorted), "snapshots must share the same value columns")
    val b = prefixed(before, "b_", keys)
    val a = prefixed(after, "a_", keys)
    val joined = b.join(a, keys.map(k =>
      b(s"b_$k") <=> a(s"a_$k")).reduce(_ && _), "full_outer")
    val bKey = col(s"b_${keys.head}")
    val aKey = col(s"a_${keys.head}")
    val changed = vals.map(v => !(col(s"b_$v") <=> col(s"a_$v")))
      .reduceOption(_ || _).getOrElse(lit(false))
    classify(joined, keys, bKey, aKey, changed)
  }

  /** [[diff]] with the value compare collapsed to one fingerprint per
    * side: `xxhash64` over the value columns travels through the join
    * instead of the columns themselves — the wide-table form. A hash
    * collision (~2⁻⁶⁴ per key) would misreport an update as unchanged;
    * use [[diff]] when that cannot be tolerated.
    *
    * Null positions are part of the fingerprint: xxhash64 skips a null
    * child WITHOUT advancing its fold state, so hashing the bare
    * columns would fingerprint (a=5, b=null) and (a=null, b=5)
    * identically — a SYSTEMATIC miss for any value migrating between
    * same-typed columns, not a random collision. Interleaving each
    * column with its null indicator makes the folded sequence differ
    * whenever a null moves (the indicator is never null, so it always
    * advances the state at its column's position).
    */
  def diffHashed(before: DataFrame, after: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs key columns")
    val vals = before.columns.filterNot(keys.contains).sorted
    def slim(df: DataFrame, p: String) = prefixed(
      df.select(keys.map(col) ++
        Seq(xxhash64(vals.flatMap(c =>
          Seq(col(c), col(c).isNull)): _*).as("__fp")): _*), p, keys)
    val b = slim(before, "b_")
    val a = slim(after, "a_")
    val joined = b.join(a, keys.map(k =>
      b(s"b_$k") <=> a(s"a_$k")).reduce(_ && _), "full_outer")
    classify(joined, keys, col(s"b_${keys.head}"), col(s"a_${keys.head}"),
      col("b___fp") =!= col("a___fp"))
  }

  /** [[diff]] carrying the AFTER-side payload — a complete change
    * feed: `keys ++ value columns (null on delete) ++ change`.
    * [[applyChanges]] of this feed transforms `before` into `after`
    * exactly (the round-trip contract pinned in SnapshotDiffSpec and
    * IvmPropertiesSpec) — the produce-ship-apply cycle that
    * replicates a 100 TB table with one keyed join per side instead
    * of re-shipping the snapshot.
    */
  def changes(before: DataFrame, after: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "changes needs key columns")
    val vals = before.columns.filterNot(keys.contains).toSeq
    val b = prefixed(before, "b_", keys)
    val a = prefixed(after, "a_", keys)
    val joined = b.join(a, keys.map(k =>
      b(s"b_$k") <=> a(s"a_$k")).reduce(_ && _), "full_outer")
    val changed = vals.map(v => !(col(s"b_$v") <=> col(s"a_$v")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.select(
      keys.map(k => coalesce(col(s"b_$k"), col(s"a_$k")).as(k)) ++
        vals.map(v => col(s"a_$v").as(v)) :+
        when(col(s"b_${keys.head}").isNull, lit("insert"))
          .when(col(s"a_${keys.head}").isNull, lit("delete"))
          .when(changed, lit("update")).as("change"): _*)
      .filter(col("change").isNotNull)
  }

  /** Apply a [[changes]] feed: deleted/updated keys leave `before`
    * by one anti join, inserted/updated rows enter with their new
    * payload — two keyed passes at any scale, no snapshot re-ship.
    */
  def applyChanges(before: DataFrame, feed: DataFrame,
      keys: Seq[String]): DataFrame = {
    val vals = before.columns.filterNot(keys.contains).toSeq
    val gone = feed.filter(col("change").isin("delete", "update"))
      .select(keys.map(col): _*)
    val incoming = feed.filter(col("change").isin("insert", "update"))
      .select((keys ++ vals).map(col): _*)
    before.join(gone, keys, "left_anti").unionByName(incoming)
  }

  /** Disk form of [[applyChanges]]: fold a change feed into a
    * warehouse table through the crash-safe replace — the subscriber
    * half of snapshot replication (the publisher ships [[changes]]
    * feeds, which are delta-sized; the table never re-ships).
    */
  def applyChangesTable(wh: Warehouse, table: String, feed: DataFrame,
      keys: Seq[String]): Unit =
    wh.replaceTable(table, applyChanges(wh.read(table), feed, keys))

  private def prefixed(df: DataFrame, p: String,
      keys: Seq[String]): DataFrame =
    df.select(df.columns.map(c => col(c).as(s"$p$c")).toSeq: _*)

  private def classify(joined: DataFrame, keys: Seq[String],
      bKey: Column, aKey: Column, changed: Column): DataFrame =
    joined.select(
      keys.map(k => coalesce(col(s"b_$k"), col(s"a_$k")).as(k)) :+
        when(bKey.isNull, lit("insert"))
          .when(aKey.isNull, lit("delete"))
          .when(changed, lit("update")).as("change"): _*)
      .filter(col("change").isNotNull)
}
