package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.pipeline.{EngineConfig, Orchestrator}
import graft.store.{MatView, MatViewDef, MvMeasure}
import org.apache.spark.sql.functions._

/** Streaming CDC routed THROUGH view retraction
  * ([[StreamIngest.mergeStreamViews]]): a live rollup over a
  * CDC-maintained table must equal the one-shot aggregation after
  * every wave — updates RETRACT their pre-images (the drift the
  * direct-merge path permits is count-preserving, so the syncViews
  * row detector can never heal it) — and stay equal through
  * checkpoint loss.
  */
class StreamCdcViewSpec extends SparkSpec {
  import spark.implicits._

  private def oneShot(orch: Orchestrator, mv: MatViewDef) = {
    val t = orch.warehouse.read("cdc")
    MatView.finalizeView(MatView.partial(t, mv), mv)
      .select(col("grp"), col("cnt"), col("sum_v").cast("double"),
        col("max_v"))
      .collect().map(_.toSeq).toSet
  }
  private def live(orch: Orchestrator, mv: MatViewDef) =
    orch.readView(mv)
      .select(col("grp"), col("cnt"), col("sum_v").cast("double"),
        col("max_v"))
      .collect().map(_.toSeq).toSet

  test("streamed upsert waves keep a registered view ≡ one-shot, incl. checkpoint loss") {
    val root = Files.createTempDirectory("cdcview").toString
    val orch = new Orchestrator(spark, EngineConfig(warehouseDir = s"$root/wh"))
    // mixed measure algebra: count/sum ride the signed path, max the
    // delta-keyed rescan path — both must stay exact under updates
    val mv = MatViewDef("cdc_rollup", Seq("grp"), Seq(
      MvMeasure("count"), MvMeasure("sum", "v"), MvMeasure("max", "v")))
    orch.registerView("cdc", mv)
    val in = s"$root/in"
    def drain(ckpt: String): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamIngest.mergeStreamViews(
        StreamIngest.readFileStream(spark, in, schema),
        orch, "cdc", Seq("id"), Some("ts"), ckpt)
    }
    // wave 1: inserts
    Seq((1L, "a", 10.0, 1L), (2L, "a", 50.0, 1L), (3L, "b", 7.0, 1L))
      .toDF("id", "grp", "v", "ts")
      .coalesce(1).write.mode("append").parquet(in)
    drain(s"$root/ck")
    assert(live(orch, mv) === oneShot(orch, mv))
    // wave 2: update id=2 DOWN to 5.0 (retracts the group max — the
    // case an append-only fold gets wrong forever), move id=3 from
    // grp b to c (cross-group retraction), insert id=4
    Seq((2L, "a", 5.0, 2L), (3L, "c", 7.5, 2L), (4L, "b", 1.0, 2L))
      .toDF("id", "grp", "v", "ts")
      .coalesce(1).write.mode("append").parquet(in)
    drain(s"$root/ck")
    assert(orch.warehouse.read("cdc").count() === 4)
    val afterW2 = live(orch, mv)
    assert(afterW2 === oneShot(orch, mv))
    // the retraction really happened: group a's max is 10 (not 50)
    assert(afterW2.exists(r => r.head == "a" && r.last == 10.0))
    assert(!afterW2.exists(r => r.head == "b" && r(1) == 2L))

    // checkpoint LOSS: a fresh checkpoint re-delivers both waves in
    // one batch — latest-per-key ('ts') re-merges the same final
    // rows, an empty effective mutation; table and view unchanged
    drain(s"$root/ck2")
    assert(orch.warehouse.read("cdc").count() === 4)
    assert(live(orch, mv) === afterW2)
    assert(live(orch, mv) === oneShot(orch, mv))
  }

  test("merge journal: a crash between base rewrite and view folds is recovered") {
    val root = Files.createTempDirectory("cdcj").toString
    val orch = new Orchestrator(spark, EngineConfig(warehouseDir = s"$root/wh"))
    val mv = MatViewDef("j_rollup", Seq("grp"), Seq(
      MvMeasure("count"), MvMeasure("sum", "v"), MvMeasure("max", "v")))
    orch.registerView("cdc", mv)
    val init = Seq((1L, "a", 10.0), (2L, "a", 50.0), (3L, "b", 7.0))
      .toDF("id", "grp", "v")
    orch.warehouse.createTable("cdc", init.schema, uniqueKeys = Seq("id"))
    orch.warehouse.append("cdc", init)
    MatView.rebuild(orch.warehouse, mv, orch.warehouse.read("cdc"))
    assert(live(orch, mv) === oneShot(orch, mv))

    // simulate the crash window: journal written, base REWRITTEN by a
    // count-preserving update (the syncViews row detector's blind
    // spot), process dies before any view folds
    val upd = Seq((2L, "a", 5.0)).toDF("id", "grp", "v")
    val removedPre = orch.warehouse.read("cdc")
      .join(upd.select("id"), Seq("id"), "left_semi")
    orch.warehouse.createTable("_pending_mut_cdc_removed",
      removedPre.schema, ifExists = "replace")
    orch.warehouse.append("_pending_mut_cdc_removed", removedPre)
    orch.warehouse.createTable("_pending_mut_cdc_updates", upd.schema,
      ifExists = "replace")
    orch.warehouse.append("_pending_mut_cdc_updates", upd)
    orch.warehouse.merge("cdc", upd, Seq("id"))
    // the view is now silently stale (same row count!)
    assert(live(orch, mv) !== oneShot(orch, mv))

    // the sweep sees the journal and rebuilds — drift healed
    assert(orch.syncViews("cdc") === Seq("j_rollup"))
    assert(live(orch, mv) === oneShot(orch, mv))
    // journal consumed: a second sweep is clean
    assert(orch.syncViews("cdc") === Seq.empty)
    assert(!orch.warehouse.tableExists("_pending_mut_cdc_removed"))
  }
}
