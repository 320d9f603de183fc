package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[JoinView]]: the incrementally-maintained join equals the full
  * join after any batch schedule, and a replayed micro-batch leaves
  * the batch-keyed layout unchanged.
  */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def left = spark.range(300).select(
    pmod(col("id"), lit(60)).as("k"), col("id").as("lid"))
  private def right = spark.range(200).select(
    pmod(col("id"), lit(50)).as("k"), (col("id") * 10).as("rid"))

  private def full: Set[(Long, Long, Long)] =
    left.join(right, Seq("k")).as[(Long, Long, Long)].collect().toSet

  test("3 uneven (dL, dR) batches fold to the full join") {
    val wh = new Warehouse(spark, Files.createTempDirectory("jv").toString)
    val cutsL = Seq(0L -> 100L, 100L -> 110L, 110L -> 300L)
    val cutsR = Seq(0L -> 20L, 20L -> 180L, 180L -> 200L)
    cutsL.zip(cutsR).foreach { case ((l0, l1), (r0, r1)) =>
      JoinView.refresh(wh, "v", Seq("k"),
        left.filter(col("lid") >= l0 && col("lid") < l1),
        right.filter(col("rid") >= r0 * 10 && col("rid") < r1 * 10))
    }
    val got = JoinView.read(wh, "v").as[(Long, Long, Long)].collect()
    assert(got.length === got.toSet.size, "duplicate join rows")
    assert(got.toSet === full)
  }

  test("refreshOnce: replayed batch id changes nothing (idempotent layout)") {
    val wh = new Warehouse(spark, Files.createTempDirectory("jv2").toString)
    val dL0 = left.filter(col("lid") < 150)
    val dR0 = right.filter(col("rid") < 1000)
    val dL1 = left.filter(col("lid") >= 150)
    val dR1 = right.filter(col("rid") >= 1000)
    JoinView.refreshOnce(wh, "v", Seq("k"), dL0, dR0, batchId = 0)
    JoinView.refreshOnce(wh, "v", Seq("k"), dL1, dR1, batchId = 1)
    val after = JoinView.read(wh, "v").as[(Long, Long, Long)].collect().toSet
    assert(after === full)
    // crash-recovery replay of the LAST batch: overwrites its own dirs
    JoinView.refreshOnce(wh, "v", Seq("k"), dL1, dR1, batchId = 1)
    val replayed = JoinView.read(wh, "v").as[(Long, Long, Long)].collect()
    assert(replayed.length === replayed.toSet.size, "replay duplicated rows")
    assert(replayed.toSet === full)
  }

  test("one-sided batches work (empty delta on either side)") {
    val wh = new Warehouse(spark, Files.createTempDirectory("jv3").toString)
    JoinView.refresh(wh, "v", Seq("k"), left, right.limit(0))
    JoinView.refresh(wh, "v", Seq("k"), left.limit(0), right)
    val got = JoinView.read(wh, "v").as[(Long, Long, Long)].collect()
    assert(got.length === got.toSet.size)
    assert(got.toSet === full)
  }

  test("refreshMutation refuses a refreshOnce-maintained (batch-keyed) view") {
    val wh = new Warehouse(spark, Files.createTempDirectory("jv5").toString)
    JoinView.refreshOnce(wh, "v", Seq("k"), left, right, batchId = 0)
    val e = intercept[IllegalArgumentException] {
      JoinView.refreshMutation(wh, "v", Seq("k"), Seq("lid"), Seq("rid"),
        left.limit(1), left.limit(0), right.limit(0), right.limit(0))
    }
    assert(e.getMessage.contains("batch_id") &&
      e.getMessage.contains("one mode per view"))
  }

  test("refreshOnce guards the checkpoint-loss wipe (refuse mode)") {
    val wh = new Warehouse(spark, Files.createTempDirectory("jv6").toString)
    JoinView.refreshOnce(wh, "v", Seq("k"), left, right, batchId = 0)
    JoinView.refreshOnce(wh, "v", Seq("k"), left.limit(0),
      right.limit(0), batchId = 1)
    spark.conf.set(RebuildGuard.ModeKey, "refuse")
    try {
      intercept[IllegalStateException] {
        JoinView.refreshOnce(wh, "v", Seq("k"), left.limit(1),
          right.limit(0), batchId = 0)
      }
      ()
    } finally spark.conf.unset(RebuildGuard.ModeKey)
    // state untouched by the refused wipe
    assert(JoinView.read(wh, "v").as[(Long, Long, Long)].collect().toSet
      === full)
  }

  test("mutateView: deletes/updates/inserts on both sides track the one-shot join") {
    // frame-level algebra under a deterministic mutation: delete some
    // left rows, update some right rows (remove old + add new), insert
    // fresh rows on both sides — the folded view must equal the
    // one-shot join of the mutated inputs, no duplicates
    val view0 = left.join(right, Seq("k"))
    val lRem = left.filter(col("lid") % 7 === 0)
    val lAdd = spark.range(300, 320).select(
      pmod(col("id"), lit(60)).as("k"), col("id").as("lid"))
    val rRemUpd = right.filter(col("rid") % 30 === 0) // update pre-images
    val rAddUpd = rRemUpd.withColumn("rid", col("rid") + 1000000L)
    val lAfter = left.join(lRem.select("lid"), Seq("lid"), "left_anti")
      .unionByName(lAdd).select("k", "lid")
    val rAfter = right.join(rRemUpd.select("rid"), Seq("rid"), "left_anti")
      .unionByName(rAddUpd).select("k", "rid")
    val got = JoinView.mutateView(view0, Seq("k"), lAfter, rAfter,
        Seq("lid"), Seq("rid"), lRem, lAdd, rRemUpd, rAddUpd)
      .select("k", "lid", "rid").as[(Long, Long, Long)].collect()
    val oneShot = lAfter.join(rAfter, Seq("k"))
      .select("k", "lid", "rid").as[(Long, Long, Long)].collect().toSet
    assert(got.length === got.toSet.size, "mutation fold duplicated rows")
    assert(got.toSet === oneShot)
  }

  test("refreshMutation: disk round-trip keeps view and archives in lockstep") {
    val wh = new Warehouse(spark, Files.createTempDirectory("jv4").toString)
    JoinView.refresh(wh, "v", Seq("k"), left, right)
    val lRem = left.filter(col("lid") < 30)
    val lAdd = spark.range(500, 520).select(
      pmod(col("id"), lit(60)).as("k"), col("id").as("lid"))
    val rRem = right.filter(col("rid") >= 1800)
    JoinView.refreshMutation(wh, "v", Seq("k"), Seq("lid"), Seq("rid"),
      lRem, lAdd, rRem, rRem.limit(0))
    val lAfter = left.filter(col("lid") >= 30).unionByName(lAdd)
    val rAfter = right.filter(col("rid") < 1800)
    val got = JoinView.read(wh, "v").select("k", "lid", "rid")
      .as[(Long, Long, Long)].collect()
    assert(got.length === got.toSet.size)
    assert(got.toSet === lAfter.join(rAfter, Seq("k"))
      .select("k", "lid", "rid").as[(Long, Long, Long)].collect().toSet)
    // archives mutated too: a later APPEND batch joins the mutated state
    val lNext = spark.range(600, 605).select(
      pmod(col("id"), lit(60)).as("k"), col("id").as("lid"))
    JoinView.refresh(wh, "v", Seq("k"), lNext, rAfter.limit(0))
    val got2 = JoinView.read(wh, "v").select("k", "lid", "rid")
      .as[(Long, Long, Long)].collect()
    assert(got2.length === got2.toSet.size)
    assert(got2.toSet === lAfter.unionByName(lNext).join(rAfter, Seq("k"))
      .select("k", "lid", "rid").as[(Long, Long, Long)].collect().toSet)
  }
}
