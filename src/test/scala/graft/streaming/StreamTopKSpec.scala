package graft.streaming

import graft.SparkSpec
import graft.store.Warehouse
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[StreamTopK]] — bounded mergeable heavy-hitter summary. The spec
  * replays the documented merge rule driver-side wave by wave and
  * requires the streamed snapshot to match it EXACTLY, then asserts
  * the textbook guarantees on a truncating workload.
  */
class StreamTopKSpec extends SparkSpec {
  import spark.implicits._

  private case class Summ(entries: Map[String, Long], theta: Long)

  /** Driver-side reference of the documented merge. */
  private def foldBatch(s: Summ, batch: Seq[String], cap: Int): Summ = {
    val sorted = batch.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (k, c) => (-c, k) }
    val bTop = sorted.take(cap).toMap
    val thetaB = if (sorted.size <= cap) 0L else sorted(cap)._2
    val keys = s.entries.keySet ++ bTop.keySet
    val est = keys.toSeq.map(k => k ->
        (s.entries.getOrElse(k, s.theta) + bTop.getOrElse(k, thetaB)))
      .sortBy { case (k, c) => (-c, k) }
    val nth = if (est.size <= cap) 0L else est(cap)._2
    Summ(est.take(cap).toMap, math.max(s.theta + thetaB, nth))
  }

  private def harness(cap: Int) = {
    val wh = new Warehouse(spark, Files.createTempDirectory("tk_wh").toString)
    val in = Files.createTempDirectory("tk_in").toString
    val ckpt = Files.createTempDirectory("tk_ckpt").toString
    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = StreamIngest.readFileStream(spark, in, schema)
      StreamTopK.topkStream(wh, "hh", stream, "key", cap,
        checkpoint = ckpt).awaitTermination()
    }
    def push(wave: Seq[String]): Unit =
      wave.toDF("key").coalesce(1).write.mode("append").parquet(in)
    (wh, drain _, push _)
  }

  private def snapshot(wh: Warehouse, k: Int): Seq[(String, Long, Long)] =
    StreamTopK.currentTopK(wh, "hh", k)
      .as[(String, Long, Long)].collect().toSeq

  test("few keys, no truncation: exact counts, theta stays 0") {
    val (wh, drain, push) = harness(cap = 10)
    push(Seq("a", "a", "b")); drain()
    push(Seq("a", "b", "c", "c", "c")); drain()
    val got = snapshot(wh, 10).map(r => (r._1, r._2)).toMap
    assert(got === Map("a" -> 3L, "b" -> 2L, "c" -> 3L))
    assert(snapshot(wh, 10).forall(_._3 == 0L))
  }

  test("streamed summary ≡ driver-side merge replay under truncation; guarantees hold") {
    val cap = 10
    val (wh, drain, push) = harness(cap)
    // 3 waves: heavies h1/h2 at 50 per wave, a mid key, unique noise
    val waves = (0 until 3).map { w =>
      Seq.fill(50)("h1") ++ Seq.fill(50)("h2") ++ Seq.fill(5)("mid") ++
        (0 until 30).map(i => s"n${w}_$i")
    }
    var ref = Summ(Map.empty, 0L)
    waves.foreach { wave =>
      push(wave); drain()
      ref = foldBatch(ref, wave, cap)
    }
    val got = snapshot(wh, cap)
    assert(got.map(r => (r._1, r._2)).toMap === ref.entries)
    assert(got.forall(_._3 == ref.theta))
    assert(got.size <= cap)

    // guarantees vs TRUE counts
    val truth = waves.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val theta = ref.theta
    got.foreach { case (k, est, _) =>
      assert(est >= truth(k), s"underestimate for $k")
      assert(est - truth(k) <= theta, s"error bound broken for $k")
    }
    // any key with true count > theta MUST be in the summary
    val kept = got.map(_._1).toSet
    truth.filter(_._2 > theta).keys.foreach(k =>
      assert(kept.contains(k), s"heavy key $k dropped"))
    // always-surviving heavies are counted EXACTLY
    assert(got.find(_._1 == "h1").get._2 === 150L)
    assert(got.find(_._1 == "h2").get._2 === 150L)
  }

  test("checkpoint LOSS: restarted stream rebuilds the summary, no double-count") {
    val wh = new Warehouse(spark, Files.createTempDirectory("tkl_wh").toString)
    val in = Files.createTempDirectory("tkl_in").toString
    val ckptA = Files.createTempDirectory("tkl_ckptA").toString
    val ckptB = Files.createTempDirectory("tkl_ckptB").toString
    def drain(ckpt: String): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamTopK.topkStream(wh, "hh", StreamIngest.readFileStream(spark, in, schema),
        "key", 10, checkpoint = ckpt).awaitTermination()
    }
    def push(wave: Seq[String]): Unit =
      wave.toDF("key").coalesce(1).write.mode("append").parquet(in)
    push(Seq("a", "a", "b")); drain(ckptA)
    push(Seq("a", "b", "c")); drain(ckptA)
    // checkpoint dies: re-delivery at id 0 must not fold into the
    // stale newest snapshot (every pre-loss row would double-count)
    push(Seq("c", "d")); drain(ckptB)
    // capacity > distinct keys -> exact counts
    val got = StreamTopK.currentTopK(wh, "hh", 10)
      .as[(String, Long, Long)].collect()
      .map { case (k, est, _) => k -> est }.toMap
    assert(got === Map("a" -> 3L, "b" -> 2L, "c" -> 2L, "d" -> 1L),
      s"double-counted after loss: $got")
  }

  test("re-drain with nothing new is a no-op; state stays bounded") {
    val cap = 5
    val (wh, drain, push) = harness(cap)
    push(Seq("x", "x", "y", "z", "w", "v", "u", "t")); drain()
    val before = snapshot(wh, cap)
    drain() // no new files
    assert(snapshot(wh, cap) === before)
    // at most the previous + current snapshot survive pruning
    assert(wh.read(StreamTopK.summaryTable("hh")).count() <= 2L * cap)
  }
}
