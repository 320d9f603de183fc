package graft.config

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Mirrors the reference's `config_manager.py` behaviors: ordered
  * shallow merge, missing-file skip, empty-file tolerance, dot-path
  * get, parse failure, required-key validation.
  */
class ConfigManagerSpec extends AnyFunSuite {

  private def writeConfigs(files: (String, String)*): String = {
    val dir = Files.createTempDirectory("graft_cfg")
    files.foreach { case (name, body) =>
      Files.write(dir.resolve(name), body.getBytes("UTF-8"))
    }
    dir.toString
  }

  private val baseYaml =
    """project_data:
      |  record_id: "3887306"
      |  unique_columns: {'metadata': ['building_id'],
      |                   'weather': ['timestamp', 'site_id'],
      |                   'raw': ['timestamp', 'building_id', 'meter']}
      |logging:
      |  log_file_name: 'application.log'
      |engine:
      |  warehouse_dir: "/tmp/wh"
      |  time_column: "timestamp"
      |""".stripMargin

  test("later files override earlier ones per top-level key (dict.update semantics)") {
    val dir = writeConfigs(
      "a.yaml" -> baseYaml,
      "b.yaml" ->
        """logging:
          |  log_file_name: 'other.log'
          |""".stripMargin)
    val cm = new ConfigManager(Seq("a.yaml", "b.yaml"), dir)
    // top-level `logging` replaced wholesale by b.yaml
    assert(cm.get("logging.log_file_name") === Some("other.log"))
    // untouched top-level keys survive
    assert(cm.get("project_data.record_id") === Some("3887306"))
  }

  test("dot-path get walks nested maps; miss returns None / provided default") {
    val dir = writeConfigs("a.yaml" -> baseYaml)
    val cm = new ConfigManager(Seq("a.yaml"), dir)
    assert(cm.get("engine.warehouse_dir") === Some("/tmp/wh"))
    assert(cm.get("engine.nope") === None)
    assert(cm.get("nope.deep.path") === None)
    assert(cm.get("") === None)
    assert(cm.getOrElse("engine.nope", "dflt") === "dflt")
    assert(cm.getSeq("project_data.unique_columns.raw") ===
      Seq("timestamp", "building_id", "meter"))
  }

  test("missing listed file is skipped; empty file contributes nothing") {
    val dir = writeConfigs("a.yaml" -> baseYaml, "empty.yaml" -> "")
    val cm = new ConfigManager(Seq("ghost.yaml", "a.yaml", "empty.yaml"), dir)
    assert(cm.get("project_data.record_id") === Some("3887306"))
  }

  test("explicitly loading a missing file raises FileNotFound; bad YAML raises") {
    intercept[java.io.FileNotFoundException] {
      ConfigManager.loadYamlFile(Paths.get("/nonexistent/x.yaml"))
    }
    val dir = writeConfigs("bad.yaml" -> "a: {unclosed")
    intercept[Exception] {
      ConfigManager.loadYamlFile(Paths.get(dir).resolve("bad.yaml"))
    }
  }

  test("validate raises on missing required key, passes when present") {
    val dir = writeConfigs("a.yaml" -> baseYaml)
    val cm = new ConfigManager(Seq("a.yaml"), dir)
    cm.validate() // project_data present
    val err = intercept[IllegalArgumentException] {
      cm.validate(Seq("project_data", "ssl"))
    }
    assert(err.getMessage.contains("ssl"))
  }

  test("EngineConfig.fromConfig maps unique_columns and engine settings") {
    val dir = writeConfigs("a.yaml" -> baseYaml)
    val cm = new ConfigManager(Seq("a.yaml"), dir)
    val ec = graft.pipeline.EngineConfig.fromConfig(cm)
    assert(ec.warehouseDir === "/tmp/wh")
    assert(ec.timeColumn === "timestamp")
    assert(ec.uniqueColumns("raw") === Seq("timestamp", "building_id", "meter"))
    assert(ec.uniqueColumns("metadata") === Seq("building_id"))
    // defaults kick in when the engine block is absent
    val cm2 = new ConfigManager(Nil, dir)
    val ec2 = graft.pipeline.EngineConfig.fromConfig(cm2, "/tmp/dflt")
    assert(ec2.warehouseDir === "/tmp/dflt")
    assert(ec2.uniqueColumns === graft.pipeline.EngineConfig.DefaultUniqueColumns)
  }
}
