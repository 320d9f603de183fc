package graft

import graft.core.SparkEnv
import graft.pipeline.{EngineConfig, Orchestrator}
import java.nio.file.{Files, Paths}

/** Runnable end-to-end slice (SURVEY §7.2): BDG2-shaped wide CSV →
  * melt → schema inference → table create → idempotent dedup-load →
  * analytical SQL. `runMain graft.PipelineDemo [workDir]`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      Files.createTempDirectory("graft_demo").toString)
    val spark = SparkEnv.session(appName = "graft-pipeline-demo")

    // stage a BDG2-shaped wide meter CSV + metadata CSV
    val meterDir = s"$work/in/electricity_meters"
    new java.io.File(meterDir).mkdirs()
    Files.writeString(Paths.get(s"$meterDir/electricity.csv"),
      """timestamp,bldg_1,bldg_2,bldg_3
        |2016-01-01 00:00:00,11.5,20.1,3.2
        |2016-01-01 01:00:00,12.0,21.7,2.9
        |2016-01-01 02:00:00,12.8,19.4,3.6
        |2016-01-01 03:00:00,11.1,18.2,3.1""".stripMargin)
    val metaDir = s"$work/in/building_metadata"
    new java.io.File(metaDir).mkdirs()
    Files.writeString(Paths.get(s"$metaDir/metadata.csv"),
      """building_id,sqft,yearbuilt,occupants
        |bldg_1,12000,1998,140
        |bldg_2,55000,2004,800
        |bldg_3,3000,2015,22""".stripMargin)

    val orch = new Orchestrator(spark, EngineConfig(s"$work/warehouse"))

    println("== transform (melt) ==")
    val staged = orch.transformData(s"$work/in", s"$work/staged")
    staged.foreach { case (k, v) => println(s"  $k -> $v") }

    println("== load raw (run 1) ==")
    val r1 = orch.loadFile(staged("electricity_meters"), Some("raw"))
    println(s"  appended=${r1.stats.get.appendedRows} overlap=${r1.overlap.hasOverlap}")
    println(r1.ddl.linesIterator.map("  " + _).mkString("\n"))

    println("== load raw (run 2, must be no-op) ==")
    val r2 = orch.loadFile(staged("electricity_meters"), Some("raw"))
    println(s"  appended=${r2.stats.get.appendedRows} overlap=${r2.overlap.hasOverlap}" +
      s" overlapRows=${r2.overlap.overlapCount} entities=${r2.overlap.affectedEntities}")

    println("== load metadata ==")
    val r3 = orch.loadFile(staged("building_metadata"), Some("metadata"))
    println(s"  appended=${r3.stats.get.appendedRows}")

    println("== analytics: hourly mean per building joined to sqft ==")
    orch.sql(
      """SELECT r.building_id, m.sqft, avg(r.meter_reading) AS avg_reading
        |FROM raw r JOIN metadata m ON r.building_id = m.building_id
        |WHERE r.meter = 'electricity'
        |GROUP BY r.building_id, m.sqft
        |ORDER BY r.building_id""".stripMargin)
      .show(truncate = false)

    println("== analytics layer: daily rollup + energy-use intensity ==")
    val raw = orch.warehouse.read("raw")
    val meta = orch.warehouse.read("metadata")
    graft.analytics.EnergyAnalytics.consumptionRollup(raw, "1 day")
      .orderBy("building_id", "bucket_start").show(truncate = false)
    graft.analytics.EnergyAnalytics.energyUseIntensity(raw, meta)
      .orderBy("building_id").show(truncate = false)
    spark.stop()
  }
}
