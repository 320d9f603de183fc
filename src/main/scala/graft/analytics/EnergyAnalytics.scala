package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.TimeCols.epochUs

/** Domain analytics over the engine's canonical tables (SURVEY §1.4:
  * `raw(timestamp, building_id, meter, meter_reading)`,
  * `weather(timestamp, site_id, …)`, `metadata(building_id, sqft, …)`)
  * — the layer the reference intended but never wrote
  * (`src/analytics/__init__.py:1` is empty; SURVEY §7.1 step 9).
  *
  * Everything is a declarative plan over the long-format tables:
  * time-bucket rollups are single partial-aggregated shuffles on
  * (bucket, entity); the weather join broadcasts when weather is
  * dimension-sized and shuffles on (site_id, hour) otherwise; at
  * warehouse scale the tables are partitioned by date so every helper
  * is partition-pruned by its time filter.
  */
object EnergyAnalytics {

  /** Time-bucketed consumption rollup per building (+ meter):
    * `bucket` is any Spark interval string ("1 hour", "1 day", …).
    */
  def consumptionRollup(raw: DataFrame, bucket: String = "1 day"): DataFrame =
    raw.groupBy(
        window(col("timestamp"), bucket).as("w"),
        col("building_id"), col("meter"))
      .agg(
        sum(col("meter_reading")).as("total_reading"),
        avg(col("meter_reading")).as("avg_reading"),
        count(lit(1)).as("n_readings"))
      .select(col("w.start").as("bucket_start"), col("building_id"),
        col("meter"), col("total_reading"), col("avg_reading"),
        col("n_readings"))

  /** Per-site rollup: raw ⋈ metadata (building→site) then bucketed
    * aggregation. Metadata is dimension-sized → broadcast.
    */
  def siteRollup(raw: DataFrame, metadata: DataFrame,
      siteCol: String = "site_id", bucket: String = "1 day"): DataFrame =
    raw.join(broadcast(metadata.select(col("building_id"), col(siteCol))),
        Seq("building_id"))
      .groupBy(window(col("timestamp"), bucket).as("w"), col(siteCol))
      .agg(sum(col("meter_reading")).as("total_reading"),
        count(lit(1)).as("n_readings"))
      .select(col("w.start").as("bucket_start"), col(siteCol),
        col("total_reading"), col("n_readings"))

  /** Readings joined to the closest-hour weather observation:
    * both sides truncate to the hour and equi-join on
    * (site_id, hour) — the (timestamp, site_id) natural key of the
    * weather table (SURVEY §1.4).
    */
  def withWeather(raw: DataFrame, metadata: DataFrame, weather: DataFrame,
      siteCol: String = "site_id"): DataFrame = {
    val r = raw
      .join(broadcast(metadata.select(col("building_id"), col(siteCol))),
        Seq("building_id"))
      .withColumn("__hour", date_trunc("hour", col("timestamp")))
    val w = weather
      .withColumn("__hour", date_trunc("hour", col("timestamp")))
      .drop("timestamp")
    r.join(w, Seq(siteCol, "__hour"), "left_outer").drop("__hour")
  }

  /** Energy-use intensity: total consumption per square foot over the
    * window, per building.
    */
  def energyUseIntensity(raw: DataFrame, metadata: DataFrame): DataFrame =
    raw.groupBy(col("building_id"))
      .agg(sum(col("meter_reading")).as("total_reading"))
      .join(broadcast(metadata.select(col("building_id"), col("sqft"))),
        Seq("building_id"))
      .withColumn("eui",
        when(col("sqft").isNull || col("sqft") === 0, lit(null))
          .otherwise(col("total_reading") / col("sqft")))

  /** Anomaly flags: readings more than `nSigma` standard deviations
    * from the building+meter mean. One window shuffle on the entity.
    */
  def anomalies(raw: DataFrame, nSigma: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(col("building_id"), col("meter"))
    raw
      .withColumn("__mean", avg(col("meter_reading")).over(w))
      .withColumn("__std", stddev_pop(col("meter_reading")).over(w))
      .filter(col("__std") > 0 &&
        abs(col("meter_reading") - col("__mean")) > lit(nSigma) * col("__std"))
      .drop("__mean", "__std")
  }

  /** Daily heating/cooling degree days per site (ASHRAE / UK Met
    * Office daily-mean method): HDD = max(0, base − T̄_day),
    * CDD = max(0, T̄_day − base) from hourly observations. One
    * (site, day) aggregation shuffle; output is days × sites rows —
    * dimension-sized however dense the observations.
    */
  def degreeDays(weather: DataFrame, base: Double = 18.0): DataFrame =
    weather.groupBy(col("site_id"), to_date(col("timestamp")).as("day"))
      .agg(avg(col("air_temperature")).as("t_avg"))
      .select(col("site_id"), col("day"), col("t_avg"),
        greatest(lit(0.0), lit(base) - col("t_avg")).as("hdd"),
        greatest(lit(0.0), col("t_avg") - lit(base)).as("cdd"))

  /** Weather-normalized consumption model per building: OLS of DAILY
    * consumption on heating degree days via the engine's
    * sufficient-statistics idiom (decimal-exact Σx Σy Σxx Σxy, closed
    * form in double) — the regression that separates weather-driven
    * load (slope × HDD) from baseload (intercept), the standard
    * normalization behind energy benchmarking. Plan shape: one
    * (building, day) rollup of the readings, a broadcast join to the
    * dimension-sized degree-day table, one per-building aggregation —
    * no window, no cross join; the readings shuffle once.
    * Buildings with under 2 days or constant HDD (slope undefined)
    * are omitted. Output: (building_id, n_days, hdd_total, cdd_total,
    * slope, intercept).
    */
  def weatherNormalizedModel(raw: DataFrame, metadata: DataFrame,
      weather: DataFrame, base: Double = 18.0): DataFrame = {
    val dd = degreeDays(weather, base)
    val daily = raw
      .join(broadcast(metadata.select(col("building_id"), col("site_id"))),
        Seq("building_id"))
      .groupBy(col("building_id"), col("site_id"),
        to_date(col("timestamp")).as("day"))
      .agg(sum(col("meter_reading").cast("decimal(20,4)"))
        .cast("double").as("y"))
    val xy = daily.join(broadcast(dd.select(col("site_id"), col("day"),
      col("hdd"), col("cdd"))), Seq("site_id", "day"))
    val stats = xy.groupBy(col("building_id")).agg(
      count(lit(1)).as("n"),
      sum(col("hdd").cast("decimal(20,6)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(24,6)")).cast("double").as("sy"),
      sum((col("hdd") * col("hdd")).cast("decimal(24,6)"))
        .cast("double").as("sxx"),
      sum((col("hdd") * col("y")).cast("decimal(30,6)"))
        .cast("double").as("sxy"),
      sum(col("cdd").cast("decimal(20,6)")).cast("double").as("cdd_total"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / den
    stats.filter(col("n") >= 2 && den =!= 0)
      .select(col("building_id"), col("n").as("n_days"),
        col("sx").as("hdd_total"), col("cdd_total"),
        slope.as("slope"),
        ((col("sy") - slope * col("sx")) / col("n")).as("intercept"))
  }

  /** Data-completeness report per building+meter: observed vs expected
    * reading count for a regular `intervalMinutes` cadence over the
    * table's own [min, max] time range.
    */
  def completeness(raw: DataFrame, intervalMinutes: Int = 60): DataFrame =
    raw.groupBy(col("building_id"), col("meter"))
      .agg(count(lit(1)).as("n_observed"),
        min(col("timestamp")).as("t_min"),
        max(col("timestamp")).as("t_max"))
      .withColumn("n_expected",
        ((epochUs(col("t_max")) - epochUs(col("t_min")))
          / (intervalMinutes * 60000000L) + 1).cast("long"))
      .withColumn("completeness",
        round(col("n_observed").cast("double") / col("n_expected"), 4))
}
