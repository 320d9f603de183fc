package graft.streaming

import graft.SparkSpec
import graft.store.Warehouse
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Per-batch PSI parity with a driver-side recomputation: an in-band
  * wave scores near zero, a shifted wave scores high, the numbers
  * match the formula exactly, and replays never double-count.
  */
class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  private val cuts = Seq(10.0, 20.0, 30.0, 40.0)

  private def psiOf(batch: Seq[Double], ref: Map[Int, Double]): Double = {
    val bins = batch.map(v => cuts.count(v > _))
    val n = batch.size.toDouble
    val k = cuts.size + 1
    (0 until k).map { b =>
      val p = (bins.count(_ == b) + 0.5) / (n + k * 0.5)
      val q = ref(b)
      (p - q) * math.log(p / q)
    }.sum
  }

  test("in-band batch ≈ 0, shifted batch large, exact formula parity") {
    val wh = new Warehouse(spark, Files.createTempDirectory("sd_wh").toString)
    val in = Files.createTempDirectory("sd_in").toString
    val ckpt = Files.createTempDirectory("sd_ckpt").toString
    val rnd = new scala.util.Random(31)
    val train = Seq.fill(4000)(rnd.nextDouble() * 50)
    val refDf = StreamDrift.referenceShares(train.toDF("value"), "value", cuts)
      .localCheckpoint(eager = true)
    val ref = refDf.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamDrift.psiStream(wh, "m", StreamIngest.readFileStream(spark, in, schema),
        "value", cuts, refDf, ckpt).awaitTermination()
    }
    val wave1 = Seq.fill(1000)(rnd.nextDouble() * 50) // same distribution
    wave1.toDF("value").coalesce(1).write.mode("append").parquet(in)
    drain()
    val wave2 = Seq.fill(1000)(40.0 + rnd.nextDouble() * 10) // all top bin
    wave2.toDF("value").coalesce(1).write.mode("append").parquet(in)
    drain()

    val got = wh.read(StreamDrift.psiTable("m"))
      .orderBy("batch_id")
      .select(col("n_rows"), col("psi")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length === 2)
    val (n1, psi1) = got(0)
    val (n2, psi2) = got(1)
    assert(n1 === 1000L && n2 === 1000L)
    assert(psi1 < 0.05, s"in-band psi $psi1")
    assert(psi2 > 1.0, s"shifted psi $psi2")
    assert(math.abs(psi1 - psiOf(wave1, ref)) < 1e-6)
    assert(math.abs(psi2 - psiOf(wave2, ref)) < 1e-6)
  }

  test("checkpoint LOSS: restarted monitor rebuilds a consistent history") {
    val wh = new Warehouse(spark, Files.createTempDirectory("sdl_wh").toString)
    val in = Files.createTempDirectory("sdl_in").toString
    val ckptA = Files.createTempDirectory("sdl_ckptA").toString
    val ckptB = Files.createTempDirectory("sdl_ckptB").toString
    val rnd = new scala.util.Random(7)
    val train = Seq.fill(2000)(rnd.nextDouble() * 50)
    val refDf = StreamDrift.referenceShares(train.toDF("value"), "value", cuts)
      .localCheckpoint(eager = true)
    def drain(ckpt: String): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamDrift.psiStream(wh, "ml", StreamIngest.readFileStream(spark, in, schema),
        "value", cuts, refDf, ckpt).awaitTermination()
    }
    Seq.fill(500)(rnd.nextDouble() * 50).toDF("value")
      .coalesce(1).write.mode("append").parquet(in)
    drain(ckptA)
    Seq.fill(500)(rnd.nextDouble() * 50).toDF("value")
      .coalesce(1).write.mode("append").parquet(in)
    drain(ckptA)
    assert(wh.read(StreamDrift.psiTable("ml")).count() === 2)
    // checkpoint dies: re-delivery re-batches the whole retained input
    // at id 0 — stale rows describing the OLD batching must clear, or
    // the history holds rows for batches that no longer exist
    Seq.fill(500)(40.0 + rnd.nextDouble() * 10).toDF("value")
      .coalesce(1).write.mode("append").parquet(in)
    drain(ckptB)
    val got = wh.read(StreamDrift.psiTable("ml")).orderBy("batch_id")
      .select(col("batch_id"), col("n_rows")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // one consistent history under the NEW batching: every retained
    // row re-delivered exactly once
    assert(got.map(_._2).sum === 1500L,
      s"stale rows linger or rows lost: $got")
  }

  test("replay with no new files adds nothing") {
    val wh = new Warehouse(spark, Files.createTempDirectory("sd_wh2").toString)
    val in = Files.createTempDirectory("sd_in2").toString
    val ckpt = Files.createTempDirectory("sd_ckpt2").toString
    Seq.fill(100)(5.0).toDF("value").coalesce(1)
      .write.mode("append").parquet(in)
    val refDf = StreamDrift.referenceShares(
      Seq.fill(100)(5.0).toDF("value"), "value", cuts)
    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamDrift.psiStream(wh, "m2",
        StreamIngest.readFileStream(spark, in, schema),
        "value", cuts, refDf, ckpt).awaitTermination()
    }
    drain()
    val first = wh.read(StreamDrift.psiTable("m2")).count()
    drain()
    assert(wh.read(StreamDrift.psiTable("m2")).count() === first)
  }
}
