package graft.analytics

import graft.SparkSpec
import java.sql.Timestamp

class EnergyAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def raw = Seq(
    (ts("2016-01-01 00:00:00"), "b1", "electricity", 10.0),
    (ts("2016-01-01 01:00:00"), "b1", "electricity", 20.0),
    (ts("2016-01-02 00:00:00"), "b1", "electricity", 30.0),
    (ts("2016-01-01 00:00:00"), "b2", "electricity", 5.0),
    (ts("2016-01-01 00:00:00"), "b1", "water", 1.0)
  ).toDF("timestamp", "building_id", "meter", "meter_reading")

  private def metadata = Seq(
    ("b1", "s1", 100.0), ("b2", "s1", 50.0)
  ).toDF("building_id", "site_id", "sqft")

  private def weather = Seq(
    (ts("2016-01-01 00:30:00"), "s1", 12.5),
    (ts("2016-01-01 01:15:00"), "s1", 13.0)
  ).toDF("timestamp", "site_id", "airTemperature")

  test("daily consumption rollup per building+meter") {
    val daily = EnergyAnalytics.consumptionRollup(raw, "1 day")
      .collect().map(r => (r.getTimestamp(0).toString.take(10),
        r.getString(1), r.getString(2), r.getDouble(3))).toSet
    assert(daily.contains(("2016-01-01", "b1", "electricity", 30.0)))
    assert(daily.contains(("2016-01-02", "b1", "electricity", 30.0)))
    assert(daily.contains(("2016-01-01", "b1", "water", 1.0)))
  }

  test("site rollup joins metadata and aggregates per site") {
    val sites = EnergyAnalytics.siteRollup(raw, metadata, "site_id", "1 day")
      .collect().map(r => (r.getTimestamp(0).toString.take(10),
        r.getString(1), r.getDouble(2)))
    assert(sites.contains(("2016-01-01", "s1", 36.0))) // 10+20+5+1
  }

  test("weather join matches on (site, hour); unmatched hours stay null") {
    val joined = EnergyAnalytics.withWeather(raw, metadata, weather)
    val byKey = joined.collect().map(r =>
      (r.getAs[Timestamp]("timestamp").toString,
        r.getAs[String]("building_id"),
        Option(r.getAs[java.lang.Double]("airTemperature")))).toSet
    assert(byKey.contains(("2016-01-01 00:00:00.0", "b1", Some(12.5))))
    assert(byKey.contains(("2016-01-01 01:00:00.0", "b1", Some(13.0))))
    assert(byKey.contains(("2016-01-02 00:00:00.0", "b1", None)))
  }

  test("energy use intensity divides by sqft with zero/null guard") {
    val eui = EnergyAnalytics.energyUseIntensity(raw, metadata)
      .collect().map(r => r.getAs[String]("building_id") ->
        r.getAs[Double]("eui")).toMap
    assert(eui("b1") === 61.0 / 100.0)
    assert(eui("b2") === 5.0 / 50.0)
  }

  test("anomaly detection flags outliers per building+meter") {
    // a lone outlier among n points maxes out at z=(n-1)/sqrt(n) with
    // population stddev, so n must be large enough for 2-sigma to bite
    val baseline = (0 until 12).map { h =>
      (ts(f"2016-01-03 $h%02d:00:00"), "b3", "electricity",
        1.0 + (h % 3) * 0.1)
    }
    val spiky = raw.union((baseline :+
      ((ts("2016-01-03 23:00:00"), "b3", "electricity", 1000.0)))
      .toDF("timestamp", "building_id", "meter", "meter_reading"))
    val flagged = EnergyAnalytics.anomalies(spiky, nSigma = 2.0)
      .select("building_id", "meter_reading")
      .as[(String, Double)].collect()
    assert(flagged.toSeq === Seq(("b3", 1000.0)))
  }

  test("degree days: daily-mean HDD/CDD, heating and cooling regimes") {
    val obs = Seq(
      // day 1: mean T = 10 → HDD 8, CDD 0
      (ts("2016-01-01 01:00:00"), "s1", 8.0),
      (ts("2016-01-01 13:00:00"), "s1", 12.0),
      // day 2: mean T = 25 → HDD 0, CDD 7
      (ts("2016-01-02 01:00:00"), "s1", 20.0),
      (ts("2016-01-02 13:00:00"), "s1", 30.0),
      // day 3: exactly base → both zero
      (ts("2016-01-03 12:00:00"), "s1", 18.0)
    ).toDF("timestamp", "site_id", "air_temperature")
    val dd = EnergyAnalytics.degreeDays(obs, base = 18.0)
      .collect().map(r => r.getDate(1).toString ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(dd("2016-01-01") === ((8.0, 0.0)))
    assert(dd("2016-01-02") === ((0.0, 7.0)))
    assert(dd("2016-01-03") === ((0.0, 0.0)))
  }

  test("weather-normalized model recovers a planted consumption ~ HDD line") {
    // building bl consumes exactly 100 + 10·HDD per day; the OLS must
    // return slope 10, intercept 100 with zero residual
    val temps = Seq(16.0, 12.0, 8.0, 14.0) // HDD = 2, 6, 10, 4
    val days = temps.indices.map(i => f"2016-01-${i + 1}%02d")
    val obs = temps.zip(days).map { case (t, d) =>
      (ts(s"$d 12:00:00"), "s1", t) }
      .toDF("timestamp", "site_id", "air_temperature")
    val readings = temps.zip(days).flatMap { case (t, d) =>
      val total = 100.0 + 10.0 * (18.0 - t)
      // split the day's consumption over two readings
      Seq((ts(s"$d 01:00:00"), "bl", total / 4),
        (ts(s"$d 13:00:00"), "bl", 3 * total / 4))
    }.toDF("timestamp", "building_id", "meter_reading")
    val meta = Seq(("bl", "s1")).toDF("building_id", "site_id")
    val m = EnergyAnalytics.weatherNormalizedModel(readings, meta, obs)
      .collect()
    assert(m.length === 1)
    val r = m.head
    assert(r.getString(0) === "bl")
    assert(r.getLong(r.fieldIndex("n_days")) === 4L)
    assert(r.getDouble(r.fieldIndex("hdd_total")) === 22.0)
    assert(r.getDouble(r.fieldIndex("cdd_total")) === 0.0)
    assert(math.abs(r.getDouble(r.fieldIndex("slope")) - 10.0) < 1e-9)
    assert(math.abs(r.getDouble(r.fieldIndex("intercept")) - 100.0) < 1e-9)
    // a building with constant HDD (undefined slope) is omitted
    val flat = Seq((ts("2016-01-01 01:00:00"), "bf", 5.0),
      (ts("2016-01-01 13:00:00"), "bf", 5.0))
      .toDF("timestamp", "building_id", "meter_reading")
    val metaF = Seq(("bf", "s1")).toDF("building_id", "site_id")
    assert(EnergyAnalytics.weatherNormalizedModel(flat, metaF, obs)
      .collect().isEmpty)
  }

  test("completeness compares observed to expected cadence") {
    val c = EnergyAnalytics.completeness(raw, intervalMinutes = 60)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(r.fieldIndex("n_observed")),
          r.getLong(r.fieldIndex("n_expected"))))).toMap
    // b1 electricity: 3 observed over 24h+1 hourly slots = 25 expected
    assert(c(("b1", "electricity")) === ((3L, 25L)))
    assert(c(("b2", "electricity")) === ((1L, 1L)))
  }
}
