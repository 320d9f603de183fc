package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_acf / q_cusum engine logic on planted series: a pure sinusoid-free
  * level shift must put the CUSUM peak at the shift point, and a
  * period-2 alternating series must have ACF ≈ -1 at lag 1 and ≈ +1 at
  * lag 2. Both specs drive the catalog queries end to end over a
  * temporary parquet dir shaped like the testdata `events` table.
  */
class TimeSeriesStatsSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("tsstats").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ts(i: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
      .plusSeconds(i * 3600L))

  test("q_cusum peaks at a planted mean shift") {
    // 40 points at level 10, then 40 at level 20: S_i drifts most negative
    // exactly at the last low point (i = 39).
    val rows = (0 until 80).map { i =>
      val v = if (i < 40) 10.0 else 20.0
      (i.toLong, ts(i), 1L, "shift", v, "{}")
    }
    val dir = writeEvents(rows)
    val out = Catalog.byName("q_cusum").run(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_points") == 80)
    // deviation from the global mean (15): first 40 rows contribute -5 each
    assert(r.getAs[String]("cp_ts") == "2024-01-02 15:00:00") // i = 39
    assert(math.abs(r.getAs[Double]("max_drift") - 200.0) < 1e-9)
  }

  test("q_acf sees period-2 alternation") {
    val rows = (0 until 60).map { i =>
      val v = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, ts(i), 1L, "alt", v, "{}")
    }
    val dir = writeEvents(rows)
    val acf = Catalog.byName("q_acf").run(spark, dir)
      .select("lag_k", "acf").as[(Int, Double)].collect().toMap
    assert(acf(1) < -0.9)
    assert(acf(2) > 0.9)
    assert(acf(3) < -0.9)
  }

  test("q_acf of white-noise-free constant series is NaN-safe (den = 0)") {
    val rows = (0 until 20).map(i => (i.toLong, ts(i), 1L, "const", 5.0, "{}"))
    val dir = writeEvents(rows)
    val out = Catalog.byName("q_acf").run(spark, dir).collect()
    // den = 0 → division yields null/NaN but never crashes; rows present
    assert(out.length == 6)
  }

  test("q_twa matches the hand-computed trapezoidal integral") {
    // values 0, 10, 10 at t = 0h, 1h, 3h: area = 5·1h + 10·2h = 25h·v
    // over span 3h → twa = 25/3
    val rows = Seq(
      (0L, ts(0), 1L, "m", 0.0, "{}"),
      (1L, ts(1), 1L, "m", 10.0, "{}"),
      (2L, ts(3), 1L, "m", 10.0, "{}"))
    val dir = writeEvents(rows)
    val r = Catalog.byName("q_twa").run(spark, dir).collect().head
    assert(r.getAs[Long]("n_segments") == 2)
    assert(math.abs(r.getAs[Double]("twa") - 25.0 / 3) < 1e-6)
  }

  test("q_cusum drift is layout-independent (exact decimal cumsum)") {
    val rows = (0 until 101).map { i =>
      (i.toLong, ts(i), 1L, "x", math.sin(i * 0.37) * 13.7, "{}")
    }
    val dir = writeEvents(rows)
    val a = Catalog.byName("q_cusum").run(spark, dir).collect().head
    val ev = spark.read.parquet(s"$dir/events.parquet").repartition(7)
    val dir2 = java.nio.file.Files.createTempDirectory("tsstats2").toString
    ev.write.parquet(s"$dir2/events.parquet")
    val b = Catalog.byName("q_cusum").run(spark, dir2).collect().head
    assert(a.getAs[Double]("max_drift") == b.getAs[Double]("max_drift"))
    assert(a.getAs[String]("cp_ts") == b.getAs[String]("cp_ts"))
  }
}
