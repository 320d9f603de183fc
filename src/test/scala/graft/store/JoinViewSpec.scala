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
}
