package graft.streaming

import graft.SparkSpec
import graft.store.{MatView, MatViewDef, MvMeasure, Warehouse}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[StreamMatView]]: the live-maintained rollup equals a one-shot
  * aggregation over everything that has streamed through, and a
  * replayed micro-batch (crash-recovery delivery) changes nothing —
  * neither in the fact layout nor in the MV state.
  */
class StreamMatViewSpec extends SparkSpec {
  import spark.implicits._

  private val mv = MatViewDef("live", Seq("k"), Seq(
    MvMeasure("count"), MvMeasure("sum", "v"), MvMeasure("hll", "id")))

  private def viewRows(wh: Warehouse): Map[Long, (Long, Double)] =
    MatView.readView(wh, mv)
      .select(col("k"), col("cnt"),
        col("sum_v").cast("double").as("sum_v"))
      .as[(Long, Long, Double)].collect()
      .map { case (k, c, s) => k -> (c, s) }.toMap

  test("streamed batches fold to the one-shot aggregate; fact sink batch-keyed") {
    val in = Files.createTempDirectory("smv_in").toString
    val fact = Files.createTempDirectory("smv_fact").toString + "/fact"
    val ckpt = Files.createTempDirectory("smv_ckpt").toString
    val wh = new Warehouse(spark, Files.createTempDirectory("smv_wh").toString)

    def mkBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, i.toLong % 5, i * 1.0))
        .toDF("id", "k", "v")
        .coalesce(1).write.mode("append").parquet(in)

    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamMatView.maintainedAppend(
        StreamIngest.readFileStream(spark, in, schema),
        fact, wh, mv, ckpt).awaitTermination()
    }

    mkBatch(0 until 40); drain()
    mkBatch(40 until 100); drain()

    val all = (0 until 100).map(i => (i.toLong, i.toLong % 5, i * 1.0))
      .toDF("id", "k", "v")
    val oneShot = MatView.finalizeView(MatView.partial(all, mv), mv)
      .select(col("k"), col("cnt"), col("sum_v").cast("double"))
      .as[(Long, Long, Double)].collect()
      .map { case (k, c, s) => k -> (c, s) }.toMap
    assert(viewRows(wh) === oneShot)

    // fact layout is batch-id partitioned and holds every row exactly once
    val factDf = spark.read.parquet(fact)
    assert(factDf.count() === 100)
    assert(factDf.select("batch_id").distinct().count() >= 2)
  }

  test("streaming quantile monitor: live bottomk sample == one-shot, per key") {
    val in = Files.createTempDirectory("smvq_in").toString
    val fact = Files.createTempDirectory("smvq_fact").toString + "/fact"
    val ckpt = Files.createTempDirectory("smvq_ckpt").toString
    val wh = new Warehouse(spark, Files.createTempDirectory("smvq_wh").toString)
    val mvQ = MatViewDef("q", Seq("k"), Seq(
      MvMeasure("bottomk", "v", aux = "p")))

    def mkBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, i.toLong % 3,
        i * 1.0, (i * 2654435761L) % 4294967296L))
        .toDF("id", "k", "v", "p")
        .coalesce(1).write.mode("append").parquet(in)

    mkBatch(0 until 300)
    val schema = spark.read.parquet(in).schema
    StreamMatView.maintainedAppend(
      StreamIngest.readFileStream(spark, in, schema),
      fact, wh, mvQ, ckpt).awaitTermination()
    mkBatch(300 until 600)
    StreamMatView.maintainedAppend(
      StreamIngest.readFileStream(spark, in, schema),
      fact, wh, mvQ, ckpt).awaitTermination()

    val all = (0 until 600).map(i => (i.toLong, i.toLong % 3,
      i * 1.0, (i * 2654435761L) % 4294967296L))
      .toDF("id", "k", "v", "p")
    def med(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.select(col("k"),
        element_at(col("bottomk_v"), MatView.BottomK / 2).as("p50"))
        .as[(Long, Double)].collect().toMap
    val live = med(MatView.readView(wh, mvQ))
    val oneShot = med(MatView.finalizeView(MatView.partial(all, mvQ), mvQ))
    assert(live === oneShot)   // bit-identical, not approximately equal
  }

  test("checkpoint LOSS: fact layout and state rebuild from the re-delivery") {
    val in = Files.createTempDirectory("smvl_in").toString
    val fact = Files.createTempDirectory("smvl_fact").toString + "/fact"
    val ckptA = Files.createTempDirectory("smvl_ckptA").toString
    val ckptB = Files.createTempDirectory("smvl_ckptB").toString
    val wh = new Warehouse(spark, Files.createTempDirectory("smvl_wh").toString)
    def mkBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, i.toLong % 5, i * 1.0))
        .toDF("id", "k", "v")
        .coalesce(1).write.mode("append").parquet(in)
    def drain(ckpt: String): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamMatView.maintainedAppend(
        StreamIngest.readFileStream(spark, in, schema),
        fact, wh, mv, ckpt).awaitTermination()
    }
    mkBatch(0 until 40); drain(ckptA)
    mkBatch(40 until 70); drain(ckptA)
    // checkpoint dies: a fresh query re-reads everything at id 0 —
    // the stale marker must not suppress the re-batched folds, and
    // the stale fact dirs must not keep duplicate rows
    mkBatch(70 until 100); drain(ckptB)
    val all = (0 until 100).map(i => (i.toLong, i.toLong % 5, i * 1.0))
      .toDF("id", "k", "v")
    val oneShot = MatView.finalizeView(MatView.partial(all, mv), mv)
      .select(col("k"), col("cnt"), col("sum_v").cast("double"))
      .as[(Long, Long, Double)].collect()
      .map { case (k, c, s) => k -> (c, s) }.toMap
    assert(viewRows(wh) === oneShot, "state diverged after checkpoint loss")
    assert(spark.read.parquet(fact).count() === 100,
      "fact layout kept stale duplicate rows")
  }

  test("replayed batch id is a no-op for the state (exactly-once fold)") {
    val wh = new Warehouse(spark, Files.createTempDirectory("smv_wh2").toString)
    val b0 = Seq((1L, 0L, 1.0), (2L, 1L, 2.0)).toDF("id", "k", "v")
    assert(MatView.refreshOnce(wh, mv, b0, batchId = 0))
    val afterFirst = viewRows(wh)
    // crash-recovery replay of batch 0: the restart rule REBUILDS the
    // state from the replayed delta (true), but the state it builds is
    // the state it had — never a double-count
    assert(MatView.refreshOnce(wh, mv, b0, batchId = 0))
    assert(viewRows(wh) === afterFirst)
    // the next batch id applies; a replay of it is the no-op path
    assert(MatView.refreshOnce(wh, mv,
      Seq((3L, 0L, 5.0)).toDF("id", "k", "v"), batchId = 1))
    assert(viewRows(wh)(0L) === ((2L, 6.0)))
    assert(!MatView.refreshOnce(wh, mv,
      Seq((3L, 0L, 5.0)).toDF("id", "k", "v"), batchId = 1))
    assert(viewRows(wh)(0L) === ((2L, 6.0)))
  }
}
