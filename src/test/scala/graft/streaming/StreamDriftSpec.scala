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
