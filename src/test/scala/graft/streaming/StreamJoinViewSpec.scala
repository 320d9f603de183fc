package graft.streaming

import graft.SparkSpec
import graft.store.{JoinView, Warehouse}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[StreamJoinView]]: the live-maintained join over a two-sided
  * envelope stream equals the one-shot join of everything delivered,
  * across batches that interleave the sides arbitrarily.
  */
class StreamJoinViewSpec extends SparkSpec {
  import spark.implicits._

  test("tagged-union stream folds to the full join across interleaved batches") {
    val in = Files.createTempDirectory("sjv_in").toString
    val ckpt = Files.createTempDirectory("sjv_ckpt").toString
    val wh = new Warehouse(spark, Files.createTempDirectory("sjv_wh").toString)

    // envelope schema: side, k, lid, rid (unused side's payload null)
    def sendL(rows: Seq[(Long, Long)]): Unit =
      rows.map { case (k, lid) => ("L", k, Some(lid), None: Option[Long]) }
        .toDF("side", "k", "lid", "rid")
        .coalesce(1).write.mode("append").parquet(in)
    def sendR(rows: Seq[(Long, Long)]): Unit =
      rows.map { case (k, rid) => ("R", k, None: Option[Long], Some(rid)) }
        .toDF("side", "k", "lid", "rid")
        .coalesce(1).write.mode("append").parquet(in)

    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamJoinView.maintained(
        StreamIngest.readFileStream(spark, in, schema),
        wh, "v", Seq("k"),
        leftCols = Seq("k", "lid"), rightCols = Seq("k", "rid"),
        checkpoint = ckpt).awaitTermination()
    }

    // batch 1: left-only; batch 2: both sides incl. same-instant pairs;
    // batch 3: right rows matching batch-1 lefts
    sendL(Seq((1L, 10L), (2L, 20L))); drain()
    sendL(Seq((3L, 30L))); sendR(Seq((3L, 300L), (2L, 200L))); drain()
    sendR(Seq((1L, 100L), (1L, 101L))); drain()

    val got = JoinView.read(wh, "v")
      .select("k", "lid", "rid").as[(Long, Long, Long)].collect().toSeq
    val expected = Set(
      (3L, 30L, 300L), (2L, 20L, 200L), (1L, 10L, 100L), (1L, 10L, 101L))
    assert(got.size === got.toSet.size, s"duplicates: $got")
    assert(got.toSet === expected)
  }

  test("checkpoint LOSS: restarted stream rebuilds view and archives exactly") {
    val in = Files.createTempDirectory("sjvl_in").toString
    val ckptA = Files.createTempDirectory("sjvl_ckptA").toString
    val ckptB = Files.createTempDirectory("sjvl_ckptB").toString
    val wh = new Warehouse(spark, Files.createTempDirectory("sjvl_wh").toString)
    def sendL(rows: Seq[(Long, Long)]): Unit =
      rows.map { case (k, lid) => ("L", k, Some(lid), None: Option[Long]) }
        .toDF("side", "k", "lid", "rid")
        .coalesce(1).write.mode("append").parquet(in)
    def sendR(rows: Seq[(Long, Long)]): Unit =
      rows.map { case (k, rid) => ("R", k, None: Option[Long], Some(rid)) }
        .toDF("side", "k", "lid", "rid")
        .coalesce(1).write.mode("append").parquet(in)
    def drain(ckpt: String): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamJoinView.maintained(
        StreamIngest.readFileStream(spark, in, schema),
        wh, "vl", Seq("k"),
        leftCols = Seq("k", "lid"), rightCols = Seq("k", "rid"),
        checkpoint = ckpt).awaitTermination()
    }
    sendL(Seq((1L, 10L), (2L, 20L))); drain(ckptA)
    sendR(Seq((2L, 200L))); drain(ckptA)
    // checkpoint dies: batch 0 of the restart drops view + archives,
    // and the re-delivered (re-batched) envelope rebuilds them — the
    // delta algebra must not join re-batched history against stale
    // archives (every pre-loss pair would duplicate)
    sendR(Seq((1L, 100L))); drain(ckptB)
    val got = JoinView.read(wh, "vl")
      .select("k", "lid", "rid").as[(Long, Long, Long)].collect().toSeq
    assert(got.size === got.toSet.size, s"loss replay duplicated: $got")
    assert(got.toSet === Set((2L, 20L, 200L), (1L, 10L, 100L)))
  }
}
