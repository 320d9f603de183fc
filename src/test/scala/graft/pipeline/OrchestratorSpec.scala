package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files

/** End-to-end vertical slice (SURVEY §7.2): BDG2-shaped wide CSV →
  * melt → schema inference → table create → idempotent load →
  * analytical SQL — every layer once, run twice to prove idempotency.
  */
class OrchestratorSpec extends SparkSpec {
  import spark.implicits._

  private def bdg2Fixture(): (String, String, String) = {
    val root = Files.createTempDirectory("bdg2").toString
    val meterDir = new java.io.File(s"$root/in/electricity_meters")
    meterDir.mkdirs()
    val csv =
      """timestamp,bldg_1,bldg_2
        |2016-01-01 00:00:00,1.5,10.0
        |2016-01-01 01:00:00,2.5,20.0
        |2016-01-01 02:00:00,3.5,30.0""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"${meterDir}/electricity.csv"), csv)
    val metaDir = new java.io.File(s"$root/in/building_metadata")
    metaDir.mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"${metaDir}/metadata.csv"),
      """building_id,sqft,yearbuilt
        |bldg_1,1000.0,1999
        |bldg_2,2500.7,2005""".stripMargin)
    (s"$root/in", s"$root/staged", s"$root/warehouse")
  }

  test("full pipeline: transform -> load -> query, idempotent on re-run") {
    val (in, staged, wh) = bdg2Fixture()
    val orch = new Orchestrator(spark, EngineConfig(warehouseDir = wh))

    // §3.2 transform: melt the meter folder, pass metadata through
    val outputs = orch.transformData(in, staged)
    assert(outputs.keySet === Set("electricity_meters", "building_metadata"))
    val melted = spark.read.parquet(outputs("electricity_meters"))
    assert(melted.columns.toSet ===
      Set("timestamp", "building_id", "meter_reading", "meter"))
    assert(melted.count() === 6) // 3 rows x 2 buildings

    // §3.1 load: schema gen + create + merge (as table "raw")
    val r1 = orch.loadFile(outputs("electricity_meters"), Some("raw"))
    assert(r1.ddl.contains("CREATE TABLE IF NOT EXISTS \"raw\""))
    assert(r1.stats.get.appendedRows === 6)
    assert(!r1.overlap.hasOverlap)

    // re-load the same file: overlap detected, zero rows appended
    val r2 = orch.loadFile(outputs("electricity_meters"), Some("raw"))
    assert(r2.overlap.hasOverlap)
    assert(r2.stats.get.appendedRows === 0)
    assert(orch.warehouse.read("raw").count() === 6)

    // metadata load with BDG2 coercions
    val meta = Coercions.coerceBdg2Integers(
      spark.read.parquet(outputs("building_metadata")))
    assert(meta.schema("sqft").dataType.typeName === "long")
    val r3 = orch.loadFile(outputs("building_metadata"), Some("metadata"))
    assert(r3.stats.get.appendedRows === 2)

    // analytics over the warehouse
    val monthly = orch.sql(
      """SELECT building_id, avg(meter_reading) AS avg_reading
        |FROM raw WHERE meter = 'electricity'
        |GROUP BY building_id ORDER BY building_id""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(monthly.toSeq === Seq(("bldg_1", 2.5), ("bldg_2", 20.0)))
  }

  test("coercions: bad values null out, floats round to long") {
    val df = Seq(("1000.6", "x"), ("nope", "2"), ("250", "3"))
      .toDF("sqft", "occupants")
    val out = Coercions.coerceBdg2Integers(df)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(out(0) === (Some(1001L), None))
    assert(out(1) === (None, Some(2L)))
    assert(out(2) === (Some(250L), Some(3L)))
  }
}
