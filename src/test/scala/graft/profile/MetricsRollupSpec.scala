package graft.profile

import graft.SparkSpec
import graft.store.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class MetricsRollupSpec extends SparkSpec {
  import spark.implicits._

  // 6 days × 3 keys × 20 rows, deterministic values
  private def rows(days: Range, salt: Int): Seq[(Timestamp, String, Double)] =
    for {
      d <- days; k <- Seq("a", "b", "c"); i <- 0 until 20
    } yield (Timestamp.valueOf(f"2024-03-${d + 1}%02d 0$salt:30:00"),
      k, (d * 100 + i + salt).toDouble / 7.0)

  private def direct(df: DataFrame, from: String, to: String): Array[(String, Long, Double, Double, Double)] =
    df.filter(to_date($"ts").between(from, to))
      .groupBy($"k")
      .agg(count(lit(1)).as("n"),
        sum($"v".cast("decimal(30,6)")).cast("double").as("total"),
        min($"v").as("vmin"), max($"v").as("vmax"))
      .orderBy("k")
      .as[(String, Long, Double, Double, Double)].collect()
      .asInstanceOf[Array[(String, Long, Double, Double, Double)]]

  private def viaRollup(rollup: DataFrame, from: String, to: String) =
    MetricsRollup.metricsRange(rollup, from, to, Seq("k"))
      .select($"k", $"n", $"total", $"vmin", $"vmax")
      .orderBy("k")
      .as[(String, Long, Double, Double, Double)].collect()

  test("range read from day rows equals the direct aggregate exactly") {
    val df = rows(0 until 6, 1).toDF("ts", "k", "v")
    val rollup = MetricsRollup.dailyMetrics(df, "ts", Seq("k"), "v")
    assert(rollup.count() === 18) // 6 days × 3 keys
    assert(viaRollup(rollup, "2024-03-02", "2024-03-05").toSeq ===
      direct(df, "2024-03-02", "2024-03-05").toSeq)
  }

  test("incremental MERGE update: late same-day rows fold in; equals full recompute") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_mr").toString)
    val batch1 = rows(0 until 4, 1).toDF("ts", "k", "v")
    // batch2 overlaps days 2..3 (late data) and adds days 4..5
    val batch2 = rows(2 until 6, 2).toDF("ts", "k", "v")
    MetricsRollup.updateDaily(wh, "m", batch1, "ts", Seq("k"), "v")
    MetricsRollup.updateDaily(wh, "m", batch2, "ts", Seq("k"), "v")
    val all = batch1.union(batch2)
    assert(viaRollup(wh.read("m"), "2024-03-01", "2024-03-06").toSeq ===
      direct(all, "2024-03-01", "2024-03-06").toSeq)
    // day×key cardinality: 6 days × 3 keys — same-day rows merged, not duplicated
    assert(wh.read("m").count() === 18)
  }

  test("rollup update aggregates only the batch, not history") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_mr2").toString)
    MetricsRollup.updateDaily(wh, "m",
      rows(0 until 3, 1).toDF("ts", "k", "v"), "ts", Seq("k"), "v")
    // a one-day batch must rewrite exactly the rows it touches: the
    // merged table keeps 3 days × 3 keys + 1 new day × 3 keys
    MetricsRollup.updateDaily(wh, "m",
      rows(3 until 4, 1).toDF("ts", "k", "v"), "ts", Seq("k"), "v")
    val m = wh.read("m")
    assert(m.count() === 12)
    // untouched day rows carry their original sums (no double counting)
    val day1 = m.filter($"day" === lit("2024-03-01").cast("date") && $"k" === "a")
      .select($"m_count").as[Long].head()
    assert(day1 === 20L)
  }
}
