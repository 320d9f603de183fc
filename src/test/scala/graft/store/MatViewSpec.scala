package graft.store

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[MatView]] contracts: an incrementally-refreshed view is EXACTLY
  * the one-shot aggregation — for every measure kind including the HLL
  * distinct sketch (register merge is associative, so estimates are
  * bit-identical, not merely close) — under any batch order, with the
  * durable state replaced crash-safely.
  */
class MatViewSpec extends SparkSpec {
  import spark.implicits._

  private val mv = MatViewDef("t", Seq("k"), Seq(
    MvMeasure("count"), MvMeasure("sum", "v"), MvMeasure("min", "v"),
    MvMeasure("max", "v"), MvMeasure("avg", "w"), MvMeasure("hll", "id")))

  // 1000 rows over 10 keys; ids deliberately collide across batches so
  // the HLL merge has real overlap to get right.
  private def data: DataFrame =
    spark.range(1000).select(
      col("id"),
      pmod(col("id"), lit(10)).as("k"),
      (col("id") % 97).cast("double").as("v"),
      when(col("id") % 13 === 0, lit(null))
        .otherwise((col("id") % 7).cast("double")).as("w"))

  private def batch(i: Int): DataFrame =
    data.filter(pmod(col("id"), lit(3)) === i)

  private def rows(df: DataFrame): Seq[String] =
    df.orderBy("k").collect().map(_.toString).toSeq

  test("disk-backed 3-batch refresh == one-shot aggregation, HLL included") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_mv").toString)
    (0 to 2).foreach(i => MatView.refresh(wh, mv, batch(i)))
    val oneShot = MatView.finalizeView(MatView.partial(data, mv), mv)
    assert(rows(MatView.readView(wh, mv)) === rows(oneShot))
    // state is key-cardinality-sized — the O(delta + state) refresh claim
    assert(wh.read(mv.stateTable).count() === 10)
  }

  test("merge is order-independent: reversed batch schedule, same state") {
    val fwd = (0 to 2).map(i => MatView.partial(batch(i), mv))
      .reduce(MatView.mergeStates(_, _, mv))
    val rev = (2 to 0 by -1).map(i => MatView.partial(batch(i), mv))
      .reduce(MatView.mergeStates(_, _, mv))
    assert(rows(MatView.finalizeView(fwd, mv)) ===
      rows(MatView.finalizeView(rev, mv)))
  }

  test("uneven schedules agree: one big batch vs many small ones") {
    val bySize = MatView.mergeStates(
      MatView.partial(data.filter(col("id") < 900), mv),
      MatView.partial(data.filter(col("id") >= 900), mv), mv)
    val oneShot = MatView.partial(data, mv)
    assert(rows(MatView.finalizeView(bySize, mv)) ===
      rows(MatView.finalizeView(oneShot, mv)))
  }

  test("replaceTable leaves no working dirs and survives a re-read") {
    val dir = Files.createTempDirectory("graft_mv2").toString
    val wh = new Warehouse(spark, dir)
    MatView.refresh(wh, mv, batch(0))
    MatView.refresh(wh, mv, batch(1)) // read-modify-replace path
    val names = new java.io.File(dir).list().toSeq
    assert(!names.exists(n => n.endsWith("__replace") || n.endsWith("__old")),
      s"transient dirs left behind: $names")
    // the replaced state must still be a valid parquet table
    assert(wh.read(mv.stateTable).count() === 10)
  }

  test("bottomk measure: incremental quantile sample is BIT-identical to one-shot") {
    // priority from the id's Knuth multiply — the deterministic KMV form
    val d = data.withColumn("p",
      (col("id") * 2654435761L) % 4294967296L)
    val mvQ = MatViewDef("q", Seq("k"), Seq(
      MvMeasure("count"), MvMeasure("bottomk", "v", aux = "p")))
    def batchQ(i: Int) = d.filter(pmod(col("id"), lit(3)) === i)
    val inc = (0 to 2).map(i => MatView.partial(batchQ(i), mvQ))
      .reduce(MatView.mergeStates(_, _, mvQ))
    val incRows = rows(MatView.finalizeView(inc, mvQ))
    assert(incRows === rows(MatView.finalizeView(MatView.partial(d, mvQ), mvQ)))
    // the sample is k wide (100 rows per key >> k=64)
    val widths = MatView.finalizeView(inc, mvQ)
      .select(size(col("bottomk_v"))).collect().map(_.getInt(0)).toSet
    assert(widths === Set(MatView.BottomK))
  }

  test("cube state: 3-batch incremental cube == one-shot cube, all grouping sets") {
    val mvC = MatViewDef("c", Seq("k"), Seq(
      MvMeasure("count"), MvMeasure("sum", "v"), MvMeasure("avg", "w")))
    def rowsC(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("__gid", "k").collect().map(_.toString).toSeq
    val inc = (0 to 2).map(i => MatView.partialCube(batch(i), mvC))
      .reduce(MatView.mergeCubes(_, _, mvC))
    assert(rowsC(MatView.finalizeCube(inc, mvC)) ===
      rowsC(MatView.finalizeCube(MatView.partialCube(data, mvC), mvC)))
    // both grouping sets present: per-key rows (gid 0) and the total (gid 1)
    val gids = inc.select("__gid").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(gids === Set(0L, 1L))
    assert(inc.filter(col("__gid") === 1).count() === 1)
  }

  test("null-heavy avg: count(col) excludes nulls like the one-shot") {
    val mvW = MatViewDef("w", Seq("k"), Seq(MvMeasure("avg", "w")))
    val inc = MatView.mergeStates(
      MatView.partial(batch(0), mvW), MatView.mergeStates(
        MatView.partial(batch(1), mvW), MatView.partial(batch(2), mvW), mvW), mvW)
    assert(rows(MatView.finalizeView(inc, mvW)) ===
      rows(MatView.finalizeView(MatView.partial(data, mvW), mvW)))
  }
}
