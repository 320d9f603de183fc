package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** YAML configuration manager — the reference's `ConfigManager`
  * (`config_manager.py:8-182`) re-expressed for the Scala engine.
  *
  * Semantics kept from the reference:
  *  - a list of YAML files merged in order, later files overriding
  *    earlier ones per TOP-LEVEL key (`config_manager.py:105`
  *    `dict.update` — a shallow merge, not a deep one);
  *  - files missing from the list are skipped with a warning
  *    (`:108-110`); a file that fails to parse raises (`:67-72`);
  *    an empty file contributes an empty map (`:66`);
  *  - dot-path lookup for nested keys (`:112-144`);
  *  - required-key validation raising on the first missing key
  *    (`:152-182`).
  *
  * Documented divergence: the reference's `get(key, default)` returns
  * `self.config.get(default)` on a miss — it looks the DEFAULT up as a
  * config key, so `get("missing", "fallback")` returns the value of
  * the `fallback` key or None. That is an accident of implementation;
  * here a miss returns the provided default itself ([[getOrElse]]) or
  * `None` ([[get]]).
  *
  * Parsing uses Jackson's YAML dataformat (already on the Spark
  * classpath); the tree converts to immutable Scala Map/Seq values.
  */
final class ConfigManager(
    configFiles: Seq[String] = ConfigManager.DefaultFiles,
    basePath: String = "./config") {

  /** Merged configuration: later files override per top-level key. */
  val config: Map[String, Any] = {
    configFiles.foldLeft(Map.empty[String, Any]) { (acc, name) =>
      val p = Paths.get(basePath).resolve(name)
      if (Files.exists(p)) acc ++ ConfigManager.loadYamlFile(p)
      else {
        System.err.println(s"[graft.config] Config file $name not found. Skipping.")
        acc
      }
    }
  }

  /** Dot-path lookup (`config_manager.py:112-144`): `"a.b.c"` walks
    * nested maps; any miss → None. An empty key → None.
    */
  def get(key: String): Option[Any] = {
    if (key == null || key.isEmpty) return None
    key.split("\\.").foldLeft(Option[Any](config)) {
      case (Some(m: Map[_, _]), k) =>
        m.asInstanceOf[Map[String, Any]].get(k)
      case _ => None
    }
  }

  def getOrElse(key: String, default: => Any): Any =
    get(key).getOrElse(default)

  def getString(key: String): Option[String] = get(key).map(_.toString)

  def getSeq(key: String): Seq[Any] = get(key) match {
    case Some(s: Seq[_]) => s
    case _ => Nil
  }

  def getMap(key: String): Map[String, Any] = get(key) match {
    case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
    case _ => Map.empty
  }

  /** Required-key validation (`config_manager.py:152-182`): raises on
    * the first missing/empty key, mirroring the reference's ValueError.
    * The reference requires ssl/default_database/project_data; those
    * are Postgres-server concerns (SURVEY §2.12 drops), so the engine
    * default requires only `project_data`.
    */
  def validate(requiredKeys: Seq[String] = Seq("project_data")): Unit =
    requiredKeys.foreach { key =>
      val v = get(key)
      val missing = v.isEmpty || (v.get match {
        case m: Map[_, _] => m.isEmpty
        case s: Seq[_] => s.isEmpty
        case s: String => s.isEmpty
        case null => true
        case _ => false
      })
      if (missing)
        throw new IllegalArgumentException(s"Missing required configuration: $key")
    }
}

object ConfigManager {

  /** `config_manager.py:33-38` defaults. */
  val DefaultFiles: Seq[String] =
    Seq("project_structure_config.yaml", "app_config.yaml")

  private val mapper = new ObjectMapper(new YAMLFactory())

  /** Load one YAML file (`config_manager.py:45-78`): empty → empty
    * map; a non-mapping root or syntax error raises; a missing path
    * raises `FileNotFoundException`.
    */
  def loadYamlFile(path: Path): Map[String, Any] = {
    if (!Files.exists(path))
      throw new java.io.FileNotFoundException(path.toString)
    val node = mapper.readTree(Files.readAllBytes(path))
    if (node == null || node.isNull || node.isMissingNode) Map.empty
    else if (!node.isObject)
      throw new IllegalArgumentException(
        s"YAML root of $path must be a mapping, got ${node.getNodeType}")
    else fromNode(node).asInstanceOf[Map[String, Any]]
  }

  /** Parse YAML from a string (testing / inline config). */
  def parse(yaml: String): Map[String, Any] = {
    val node = mapper.readTree(yaml)
    if (node == null || node.isNull || node.isMissingNode) Map.empty
    else fromNode(node).asInstanceOf[Map[String, Any]]
  }

  /** JsonNode → immutable Scala values (Map/Seq/String/Long/Double/
    * Boolean/null). */
  private def fromNode(n: JsonNode): Any =
    if (n.isObject)
      n.properties().asScala.map(e => e.getKey -> fromNode(e.getValue)).toMap
    else if (n.isArray) n.elements().asScala.map(fromNode).toSeq
    else if (n.isTextual) n.asText()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isNull) null
    else n.asText()
}
