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

  test("schema persists on first load, is reused without re-profiling, replace re-profiles") {
    val (in, staged, wh) = bdg2Fixture()
    val orch = new Orchestrator(spark, EngineConfig(warehouseDir = wh))
    val outputs = orch.transformData(in, staged)
    val path = outputs("electricity_meters")

    val runs0 = graft.profile.Profiler.profileRuns.get()
    val r1 = orch.loadFile(path, Some("raw"))
    assert(graft.profile.Profiler.profileRuns.get() > runs0,
      "first load must profile")
    assert(orch.warehouse.readDdl("raw") === Some(r1.ddl))

    // second load: DDL read back, NO profiling scan
    val runs1 = graft.profile.Profiler.profileRuns.get()
    val r2 = orch.loadFile(path, Some("raw"))
    assert(graft.profile.Profiler.profileRuns.get() === runs1,
      "re-load must reuse the persisted schema, not re-profile")
    assert(r2.ddl === r1.ddl)

    // replace: table dropped and re-created, schema re-profiled
    val runs2 = graft.profile.Profiler.profileRuns.get()
    val r3 = orch.loadFile(path, Some("raw"), ifExists = "replace")
    assert(graft.profile.Profiler.profileRuns.get() > runs2,
      "replace must re-profile")
    assert(r3.stats.get.appendedRows === 6) // fresh table got all rows
    assert(orch.warehouse.read("raw").count() === 6)
  }

  test("retrieveData chains download -> folder-filtered unzip -> transform (offline fixture)") {
    import java.nio.file.{Files => NF, Paths}
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val root = NF.createTempDirectory("retr").toString
    // fixture zip: one wanted folder, one filtered-out folder
    val zipSrc = Paths.get(root, "fixture.zip")
    val zos = new ZipOutputStream(NF.newOutputStream(zipSrc))
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(body.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("data/electricity_meters/electricity.csv",
      "timestamp,bldg_1\n2016-01-01 00:00:00,1.5\n2016-01-01 01:00:00,2.5")
    put("data/ignored_folder/junk.csv", "a,b\n1,2")
    zos.close()

    val rawDir = s"$root/raw"
    val cfgDir = NF.createTempDirectory("retr_cfg")
    NF.write(cfgDir.resolve("app.yaml"),
      s"""project_data:
         |  record_id: "3887306"
         |  file_name: "fixture.zip"
         |  raw_data_file_path: "$rawDir"
         |  zip_file_folders_to_extract: ['electricity_meters']
         |""".stripMargin.getBytes("UTF-8"))
    val cm = new graft.config.ConfigManager(Seq("app.yaml"), cfgDir.toString)

    val orch = new Orchestrator(spark, EngineConfig(warehouseDir = s"$root/wh"))
    var requested: (String, String) = null
    val fakeDownload = (recordId: String, fileName: String, dir: String) => {
      requested = (recordId, fileName)
      NF.createDirectories(Paths.get(dir))
      val dst = Paths.get(dir, fileName)
      NF.copy(zipSrc, dst)
      dst
    }
    val outputs = orch.retrieveAndTransform(cm, s"$root/staged", fakeDownload)
    assert(requested === ("3887306", "fixture.zip"))
    // filtered folder never extracted
    assert(!NF.exists(Paths.get(rawDir, "data/ignored_folder/junk.csv")))
    assert(outputs.keySet === Set("electricity_meters"))
    val melted = spark.read.parquet(outputs("electricity_meters"))
    assert(melted.count() === 2)

    // missing project_data block raises, like the reference's ValueError
    NF.write(cfgDir.resolve("empty.yaml"), "other: 1\n".getBytes("UTF-8"))
    val cmBad = new graft.config.ConfigManager(Seq("empty.yaml"), cfgDir.toString)
    intercept[IllegalArgumentException] { orch.retrieveData(cmBad, fakeDownload) }
  }

  test("runPipeline: retrieve -> transform -> loadAll end-to-end, idempotent re-run") {
    import java.nio.file.{Files => NF, Paths}
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val root = NF.createTempDirectory("runp").toString
    val zipSrc = Paths.get(root, "bundle.zip")
    val zos = new ZipOutputStream(NF.newOutputStream(zipSrc))
    zos.putNextEntry(new ZipEntry("data/raw/electricity.csv"))
    zos.write(("timestamp,bldg_1,bldg_2\n" +
      "2016-01-01 00:00:00,1.5,10.0\n" +
      "2016-01-01 01:00:00,2.5,20.0").getBytes("UTF-8"))
    zos.closeEntry(); zos.close()

    val cfgDir = NF.createTempDirectory("runp_cfg")
    NF.write(cfgDir.resolve("app.yaml"),
      s"""project_data:
         |  record_id: "r"
         |  file_name: "bundle.zip"
         |  raw_data_file_path: "$root/raw"
         |  zip_file_folders_to_extract: ['raw']
         |""".stripMargin.getBytes("UTF-8"))
    val cm = new graft.config.ConfigManager(Seq("app.yaml"), cfgDir.toString)
    val fakeDownload = (_: String, _: String, d: String) => {
      NF.createDirectories(Paths.get(d))
      NF.copy(zipSrc, Paths.get(d, "bundle.zip"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val orch = new Orchestrator(spark, EngineConfig(warehouseDir = s"$root/wh"))

    val r1 = orch.runPipeline(cm, s"$root/staged", fakeDownload)
    assert(r1.keySet === Set("raw"))
    assert(r1("raw").stats.get.appendedRows === 4) // 2 rows x 2 buildings
    assert(orch.warehouse.read("raw").count() === 4)

    // full re-run: overlap detected, zero rows appended, nothing breaks
    val r2 = orch.runPipeline(cm, s"$root/staged", fakeDownload)
    assert(r2("raw").stats.get.appendedRows === 0)
    assert(orch.warehouse.read("raw").count() === 4)
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
  test("registered MatViews stay table-consistent across dedup-append loads") {
    import graft.store.{MatView, MatViewDef, MvMeasure}
    import org.apache.spark.sql.functions.{col => c}
    val root = Files.createTempDirectory("orch_mv").toString
    val orch = new Orchestrator(spark, EngineConfig(warehouseDir = s"$root/wh"))
    val mv = MatViewDef("per_key", Seq("k"), Seq(
      MvMeasure("count"), MvMeasure("sum", "v")))
    orch.registerView("facts", mv)

    def stage(name: String, rows: Seq[(Long, Long, Double)]): String = {
      val dir = s"$root/$name"
      rows.toDF("id", "k", "v").coalesce(1)
        .write.mode("overwrite").parquet(dir)
      dir
    }
    // batch 1, then a batch that REPEATS two keys (dedup drops them):
    // the view must fold only the genuinely appended delta
    orch.loadFile(stage("b1", Seq((1L, 0L, 1.0), (2L, 1L, 2.0))),
      Some("facts"))
    orch.loadFile(stage("b2",
      Seq((1L, 0L, 99.0), (2L, 1L, 99.0), (3L, 0L, 3.0))), Some("facts"))

    val view = orch.readView(mv)
      .select(c("k"), c("cnt"), c("sum_v").cast("double"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val table = orch.warehouse.read("facts")
      .groupBy("k").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.sum(c("v")).as("s"))
      .select(c("k"), c("cnt"), c("s").cast("double"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(view === table)
    assert(view(0L) === ((2L, 4.0))) // dup rows never double-folded
  }

}
