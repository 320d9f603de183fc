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

  test("rollup update rewrites only the touched day partitions") {
    val dir = Files.createTempDirectory("graft_mr2").toString
    val wh = new Warehouse(spark, dir)
    def partFiles(date: String): Seq[String] = {
      val d = new java.io.File(s"$dir/m/day=$date")
      Option(d.listFiles()).map(_.map(_.getName)
        .filter(_.endsWith(".parquet")).sorted.toSeq).getOrElse(Nil)
    }
    MetricsRollup.updateDaily(wh, "m",
      rows(0 until 3, 1).toDF("ts", "k", "v"), "ts", Seq("k"), "v")
    val untouched = partFiles("2024-03-01")
    assert(untouched.nonEmpty)
    // a one-day batch rewrites exactly the day it touches: the merged
    // table keeps 3 days × 3 keys + 1 new day × 3 keys, and day-1's
    // physical files are byte-for-byte the ones written before
    MetricsRollup.updateDaily(wh, "m",
      rows(3 until 4, 1).toDF("ts", "k", "v"), "ts", Seq("k"), "v")
    val m = wh.read("m")
    assert(m.count() === 12)
    assert(partFiles("2024-03-01") === untouched)
    assert(partFiles("2024-03-04").nonEmpty)
    // untouched day rows carry their original sums (no double counting)
    val day1 = m.filter($"day" === lit("2024-03-01").cast("date") && $"k" === "a")
      .select($"m_count").as[Long].head()
    assert(day1 === 20L)
  }

  test("late batch with all-NULL values never nulls out a stored sum") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_mr3").toString)
    MetricsRollup.updateDaily(wh, "m",
      Seq((Timestamp.valueOf("2024-03-01 10:00:00"), "a", Some(5.0)),
        (Timestamp.valueOf("2024-03-01 11:00:00"), "a", Some(7.0)))
        .toDF("ts", "k", "v"), "ts", Seq("k"), "v")
    // late same-day rows whose value column is entirely NULL
    MetricsRollup.updateDaily(wh, "m",
      Seq((Timestamp.valueOf("2024-03-01 12:00:00"), "a",
        Option.empty[Double])).toDF("ts", "k", "v"), "ts", Seq("k"), "v")
    val r = wh.read("m").filter($"k" === "a").collect().head
    assert(r.getAs[Long]("m_count") === 3L)
    assert(r.getAs[java.math.BigDecimal]("m_sum").doubleValue() === 12.0)
    assert(r.getAs[Double]("m_min") === 5.0 && r.getAs[Double]("m_max") === 7.0)
  }
}
