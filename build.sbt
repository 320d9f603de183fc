ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "building_energy_data_pipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// `sbt gate`: the round's correctness gate in one command — dump every
// catalog query at sf0.01 and oracle-compare via DuckDB (tools/check.py),
// first at the default core count, then again at 7 cores (odd
// parallelism changes partition boundaries and partial-aggregation
// order, shaking out any order-sensitive aggregate before the driver
// gate would).
lazy val gateDir = settingKey[File]("output root for gate dumps")
gateDir := target.value / "gate"
def gateCheck(outSub: String, label: String) = Def.task {
  import scala.sys.process._
  val out = (gateDir.value / outSub).getPath
  val code = Process(Seq("python3", "tools/check.py",
    "/root/testdata/sf0.01", out)).!
  require(code == 0, s"gate FAILED at $label parallelism (see above)")
}
def gateRun(outSub: String, cpus: Int) = Def.taskDyn {
  val out = (gateDir.value / outSub).getPath
  (Compile / runMain).toTask(s" graft.Verify /root/testdata/sf0.01 $out $cpus")
}
lazy val gate = taskKey[Unit](
  "correctness gate: oracle compare at default + 7-core parallelism")
gate := Def.sequential(
  gateRun("default", 4),
  gateCheck("default", "default (4-core)"),
  gateRun("odd7", 7),
  gateCheck("odd7", "odd (7-core)")
).value
