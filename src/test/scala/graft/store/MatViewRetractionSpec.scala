package graft.store

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Retraction support for incremental views: a view over a base
  * maintained by deletes/updates (merge, CDC apply) must track the
  * base exactly — signed partials for invertible measures with ZERO
  * base I/O, bounded per-affected-group rescan for semilattice
  * measures, empty groups leaving the state, and any mutation
  * schedule finalizing identically to a one-shot aggregation.
  */
class MatViewRetractionSpec extends SparkSpec {
  import spark.implicits._

  private def rows(xs: Seq[(Long, Long, Double)]): DataFrame =
    xs.toDF("id", "k", "v")

  private val invertibleMv = MatViewDef("ret_inv", Seq("k"), Seq(
    MvMeasure("count"), MvMeasure("sum", "v"), MvMeasure("avg", "v")))
  private val mixedMv = MatViewDef("ret_mix", Seq("k"), Seq(
    MvMeasure("count"), MvMeasure("sum", "v"),
    MvMeasure("min", "v"), MvMeasure("max", "v")))

  private def finalized(state: DataFrame, mv: MatViewDef): Seq[Row] =
    MatView.finalizeView(state, mv)
      .orderBy("k").collect().toSeq

  private def oneShot(base: DataFrame, mv: MatViewDef): Seq[Row] =
    finalized(MatView.partial(base, mv), mv)

  test("invertible measures retract via signed partials — base NEVER read") {
    val base = rows(Seq((1L, 0L, 1.0), (2L, 0L, 2.0), (3L, 1L, 3.0),
      (4L, 1L, 4.0), (5L, 2L, 5.0)))
    val state0 = MatView.partial(base, invertibleMv)
    // delete id=2, update id=3 (v 3.0 -> 30.0), insert id=6
    val removed = rows(Seq((2L, 0L, 2.0), (3L, 1L, 3.0)))
    val added = rows(Seq((3L, 1L, 30.0), (6L, 2L, 6.0)))
    val after = rows(Seq((1L, 0L, 1.0), (3L, 1L, 30.0), (4L, 1L, 4.0),
      (5L, 2L, 5.0), (6L, 2L, 6.0)))
    // poison pill: the invertible path must never evaluate baseAfter
    val state1 = MatView.mutateState(state0, removed, added,
      sys.error("invertible retraction touched the base"), invertibleMv)
    assert(finalized(state1, invertibleMv) === oneShot(after, invertibleMv))
  }

  test("semilattice measures rebuild ONLY removal-affected groups") {
    val base = rows(Seq((1L, 0L, 1.0), (2L, 0L, 2.0), (3L, 1L, 3.0),
      (4L, 1L, 4.0), (5L, 2L, 5.0)))
    val state0 = MatView.partial(base, mixedMv)
    // remove the group-0 max and the group-1 min; insert into group 2
    val removed = rows(Seq((2L, 0L, 2.0), (3L, 1L, 3.0)))
    val added = rows(Seq((6L, 2L, 0.5)))
    val after = rows(Seq((1L, 0L, 1.0), (4L, 1L, 4.0), (5L, 2L, 5.0),
      (6L, 2L, 0.5)))
    val state1 = MatView.mutateState(state0, removed, added, after, mixedMv)
    assert(finalized(state1, mixedMv) === oneShot(after, mixedMv))
  }

  test("COUNT(DISTINCT) retracts exactly via keyed sub-state") {
    val dd = MatView.distinctDef("ret_dist", Seq("k"), "v")
    def distinctView(state: DataFrame): Map[Long, Long] =
      MatView.finalizeDistinct(state, Seq("k"), "v")
        .as[(Long, Long)].collect().toMap
    // group 0 holds v=1.0 TWICE (multiplicity 2) and v=2.0 once
    val base = rows(Seq((1L, 0L, 1.0), (2L, 0L, 1.0), (3L, 0L, 2.0),
      (4L, 1L, 3.0)))
    val state0 = MatView.partial(base, dd)
    assert(distinctView(state0) === Map(0L -> 2L, 1L -> 1L))
    // delete ONE of the two v=1.0 rows: the value survives, the
    // distinct count must NOT drop (the HLL-can't-do-this case)
    val s1 = MatView.mutateState(state0, rows(Seq((1L, 0L, 1.0))),
      rows(Seq()), sys.error("distinct retraction read the base"), dd)
    assert(distinctView(s1) === Map(0L -> 2L, 1L -> 1L))
    // delete the LAST v=1.0 row: now the value leaves
    val s2 = MatView.mutateState(s1, rows(Seq((2L, 0L, 1.0))),
      rows(Seq()), sys.error("distinct retraction read the base"), dd)
    assert(distinctView(s2) === Map(0L -> 1L, 1L -> 1L))
    // update moves group 1's only value to a value group 0 already
    // has: group 1 empties out of the state entirely
    val s3 = MatView.mutateState(s2, rows(Seq((4L, 1L, 3.0))),
      rows(Seq((4L, 0L, 2.0))), sys.error("base read"), dd)
    assert(distinctView(s3) === Map(0L -> 1L))
    // ≡ one-shot COUNT(DISTINCT) over the mutated base
    val after = rows(Seq((3L, 0L, 2.0), (4L, 0L, 2.0)))
    val oneShotDistinct = after.groupBy("k")
      .agg(countDistinct(col("v")).as("d"))
      .as[(Long, Long)].collect().toMap
    assert(distinctView(s3) === oneShotDistinct)
  }

  test("COUNT(DISTINCT) sub-state round-trips the warehouse lifecycle") {
    val wh = new Warehouse(spark, Files.createTempDirectory("mvd").toString)
    val dd = MatView.distinctDef("wh_dist", Seq("k"), "v")
    MatView.refresh(wh, dd, rows(Seq((1L, 0L, 1.0), (2L, 0L, 1.0),
      (3L, 0L, 2.0), (4L, 1L, 3.0))))
    MatView.refreshMutation(wh, dd, rows(Seq((1L, 0L, 1.0))),
      rows(Seq((5L, 1L, 9.0))), sys.error("base read"))
    val got = MatView.readDistinct(wh, dd)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 2L, 1L -> 2L))
  }

  test("a group retracting to empty leaves the state entirely") {
    val base = rows(Seq((1L, 0L, 1.0), (2L, 1L, 2.0), (3L, 1L, 3.0)))
    // invertible path: delete the whole of group 0
    val s0 = MatView.partial(base, invertibleMv)
    val afterInv = rows(Seq((2L, 1L, 2.0), (3L, 1L, 3.0)))
    val s1 = MatView.mutateState(s0, rows(Seq((1L, 0L, 1.0))),
      rows(Nil), sys.error("no base"), invertibleMv)
    assert(s1.select("k").as[Long].collect().toSet === Set(1L))
    assert(finalized(s1, invertibleMv) === oneShot(afterInv, invertibleMv))
    // rescan path: same deletion under a min/max view
    val m0 = MatView.partial(base, mixedMv)
    val m1 = MatView.mutateState(m0, rows(Seq((1L, 0L, 1.0))),
      rows(Nil), afterInv, mixedMv)
    assert(m1.select("k").as[Long].collect().toSet === Set(1L))
    assert(finalized(m1, mixedMv) === oneShot(afterInv, mixedMv))
  }

  test("property: ANY mutation schedule finalizes as the one-shot aggregate") {
    // deterministic pseudo-random schedules over both measure families
    val rnd = new scala.util.Random(42)
    for (mv <- Seq(invertibleMv, mixedMv); trial <- 0 until 4) {
      var live = (0 until 40).map(i =>
        (i.toLong, (rnd.nextInt(5)).toLong, rnd.nextInt(100) / 10.0))
      var nextId = 40L
      var state = MatView.partial(rows(live), mv)
      for (step <- 0 until 5) {
        val removed = rnd.shuffle(live).take(rnd.nextInt(8))
        val updatedOld = rnd.shuffle(live.filterNot(removed.contains))
          .take(rnd.nextInt(6))
        val updatedNew = updatedOld.map { case (id, k, _) =>
          (id, k, rnd.nextInt(100) / 10.0) }
        val inserted = (0 until rnd.nextInt(6)).map { _ =>
          nextId += 1
          (nextId, rnd.nextInt(6).toLong, rnd.nextInt(100) / 10.0)
        }
        val allRemoved = removed ++ updatedOld
        val allAdded = updatedNew ++ inserted
        live = live.filterNot(allRemoved.contains) ++ allAdded
        val liveNow = live
        state = MatView.mutateState(state, rows(allRemoved), rows(allAdded),
          rows(liveNow), mv).localCheckpoint(eager = true)
        assert(finalized(state, mv) === oneShot(rows(liveNow), mv),
          s"mv=${mv.name} trial=$trial step=$step")
      }
    }
  }

  test("cube retraction: signed grouping-set fold == one-shot cube") {
    val mv = MatViewDef("ret_cube", Seq("k", "k2"), Seq(
      MvMeasure("count"), MvMeasure("sum", "v"), MvMeasure("avg", "v")))
    def cubeRows(xs: Seq[(Long, Long, Long, Double)]) =
      xs.toDF("id", "k", "k2", "v")
    val base = cubeRows(Seq((1L, 0L, 0L, 1.0), (2L, 0L, 1L, 2.0),
      (3L, 1L, 0L, 3.0), (4L, 1L, 1L, 4.0), (5L, 1L, 1L, 5.0)))
    val state0 = MatView.partialCube(base, mv)
    // delete id=2 (group (0,1) empties), update id=4, insert id=6
    val removed = cubeRows(Seq((2L, 0L, 1L, 2.0), (4L, 1L, 1L, 4.0)))
    val added = cubeRows(Seq((4L, 1L, 1L, 40.0), (6L, 2L, 0L, 6.0)))
    val after = cubeRows(Seq((1L, 0L, 0L, 1.0), (3L, 1L, 0L, 3.0),
      (4L, 1L, 1L, 40.0), (5L, 1L, 1L, 5.0), (6L, 2L, 0L, 6.0)))
    val state1 = MatView.mutateCube(state0, removed, added, mv)
    def fin(st: DataFrame) = MatView.finalizeCube(st, mv)
      .orderBy("__gid", "k", "k2").collect().toSeq
    assert(fin(state1) === fin(MatView.partialCube(after, mv)))
    // the emptied (0,1) leaf left the state; its rollups retracted
    val leaf = state1.filter(col("__gid") === 0 &&
      col("k") === 0L && col("k2") === 1L)
    assert(leaf.isEmpty)
    // semilattice cube measures refuse the signed path loudly
    val bad = MatViewDef("ret_cube_bad", Seq("k"),
      Seq(MvMeasure("max", "v")))
    intercept[RuntimeException] {
      MatView.mutateCube(MatView.partialCube(base, bad),
        removed, added, bad)
    }
  }

  test("disk round-trip: a SnapshotDiff feed drives the view through a merge") {
    val wh = new Warehouse(spark,
      Files.createTempDirectory("ret_wh").toString)
    val before = rows(Seq((1L, 0L, 1.0), (2L, 0L, 2.0), (3L, 1L, 3.0),
      (4L, 2L, 4.0)))
    val after = rows(Seq((1L, 0L, 1.0), (3L, 1L, 33.0), (4L, 2L, 4.0),
      (5L, 2L, 5.0))) // id=2 deleted, id=3 updated, id=5 inserted
    wh.createTable("facts", before.schema)
    wh.append("facts", before)
    val mv = MatViewDef("ret_disk", Seq("k"), Seq(
      MvMeasure("count"), MvMeasure("sum", "v"), MvMeasure("max", "v")))
    MatView.rebuild(wh, mv, wh.read("facts"))
    // ship the delta as a changes feed; fold it BEFORE applying
    val feed = SnapshotDiff.changes(wh.read("facts"), after, Seq("id"))
      .localCheckpoint(eager = true)
    MatView.refreshChanges(wh, mv, feed, Seq("id"), wh.read("facts"), after)
    SnapshotDiff.applyChangesTable(wh, "facts", feed, Seq("id"))
    assert(finalized(wh.read(mv.stateTable), mv) ===
      oneShot(wh.read("facts"), mv))
    // rowsCovered tracks the mutated table exactly
    assert(MatView.rowsCovered(wh, mv) === wh.read("facts").count())
  }

  test("orchestrator merge folds views exactly — even count-preserving updates") {
    // a pure update keeps the table's row count, so the count-based
    // divergence sweep CANNOT see it — only the mutation fold keeps
    // the view honest; this is the drift case the retraction layer
    // exists for
    import graft.pipeline.{EngineConfig, Orchestrator}
    val root = Files.createTempDirectory("ret_merge").toString
    val orch = new Orchestrator(spark, EngineConfig(warehouseDir = s"$root/wh"))
    val mv = MatViewDef("merged", Seq("k"), Seq(
      MvMeasure("count"), MvMeasure("sum", "v"), MvMeasure("max", "v")))
    orch.registerView("facts", mv)
    val dir = s"$root/b1"
    rows(Seq((1L, 0L, 1.0), (2L, 0L, 2.0), (3L, 1L, 3.0)))
      .coalesce(1).write.parquet(dir)
    orch.loadFile(dir, Some("facts"))
    // count-preserving update: id=2's value changes, nothing else
    orch.merge("facts", rows(Seq((2L, 0L, 20.0))), Seq("id"))
    val view = orch.readView(mv).orderBy("k")
      .select(col("k"), col("cnt"), col("sum_v").cast("double"),
        col("max_v"))
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(view === Seq((0L, 2L, 21.0, 20.0), (1L, 1L, 3.0, 3.0)))
    // and a mixed merge (insert + update) stays exact too
    orch.merge("facts", rows(Seq((2L, 0L, 5.0), (4L, 1L, 7.0))), Seq("id"))
    val v2 = orch.readView(mv).orderBy("k")
      .select(col("k"), col("cnt"), col("sum_v").cast("double"),
        col("max_v"))
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(v2 === Seq((0L, 2L, 6.0, 5.0), (1L, 2L, 10.0, 7.0)))
    assert(MatView.rowsCovered(orch.warehouse, mv) ===
      orch.warehouse.read("facts").count())
  }

  test("pipeline self-heals a crash that appended without folding") {
    import graft.pipeline.{EngineConfig, Orchestrator}
    val root = Files.createTempDirectory("ret_orch").toString
    val orch = new Orchestrator(spark, EngineConfig(warehouseDir = s"$root/wh"))
    val mv = MatViewDef("per_key", Seq("k"),
      Seq(MvMeasure("count"), MvMeasure("sum", "v")))
    orch.registerView("facts", mv)
    def stage(name: String, xs: Seq[(Long, Long, Double)]): String = {
      val dir = s"$root/$name"
      rows(xs).coalesce(1).write.mode("overwrite").parquet(dir)
      dir
    }
    orch.loadFile(stage("b1", Seq((1L, 0L, 1.0), (2L, 1L, 2.0))),
      Some("facts"))
    // simulate the crash window: rows land in the table but the fold
    // never runs (append behind the pipeline's back)
    orch.warehouse.append("facts", rows(Seq((3L, 0L, 3.0))))
    assert(MatView.rowsCovered(orch.warehouse, mv) === 2L) // stale
    // the next load's sweep (or an explicit sync) detects and rebuilds
    val healed = orch.syncViews("facts")
    assert(healed === Seq("per_key"))
    val view = orch.readView(mv).orderBy("k")
      .select(col("k"), col("cnt"), col("sum_v").cast("double"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(view === Seq((0L, 2L, 4.0), (1L, 1L, 2.0)))
    assert(MatView.rowsCovered(orch.warehouse, mv) === 3L)
    assert(orch.syncViews("facts").isEmpty) // consistent → no rebuild
  }
}
