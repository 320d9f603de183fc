package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg overrides the core count (the `sbt gate` task
    // runs the suite at default AND odd parallelism in one command)
    val (sfDir, outDir, cpus) = args match {
      case Array(s, o)    => (s, o, sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      case Array(s, o, c) => (s, o, c)
      case _ => sys.error("usage: Verify <sfDir> <outDir> [cpus]")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true") // pinned, as in SparkEnv
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A crashed query must fail LOUD: a _FAILED marker file (picked up by
    // tools/check.py as a red row) instead of a silently-absent dump that
    // shrinks the gate (round-5 postmortem: 6 crashed queries read as a
    // clean 114/114 sheet because nothing recorded them).
    var failed = List.empty[String]
    // recursive stale-dump removal: a refusal/crash must not leave the
    // PREVIOUS run's parquet dump alongside its marker
    def deleteDump(dir: String): Unit = {
      val p = Paths.get(dir)
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
        finally walk.close()
      }
    }
    // SPARK_GRAFT_ONLY=q_a,q_b reruns a subset during local iteration;
    // unset (the driver path) dumps the whole catalog.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.filter {
      case (name, _) => only.forall(_.contains(name))
    }
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        Files.deleteIfExists(Paths.get(s"$outDir/$name._FAILED")) // stale marker
        Files.deleteIfExists(Paths.get(s"$outDir/$name._REFUSED"))
      } catch {
        case r: graft.core.PreflightRefusal =>
          // intended refusal ≠ crash: its own marker so tools/check.py
          // reports pass-with-note instead of a red row. A query that
          // TRANSITIONED crash→refusal (or success→refusal) must also
          // shed the stale _FAILED marker / parquet dump of the prior
          // run, or check.py keeps reporting the old state forever.
          System.err.println(s"[verify] $name REFUSED: ${r.getMessage}")
          Files.deleteIfExists(Paths.get(s"$outDir/$name._FAILED"))
          deleteDump(s"$outDir/$name")
          Files.writeString(Paths.get(s"$outDir/$name._REFUSED"),
            s"${r.getMessage}\n")
        case e: Throwable =>
          failed ::= name
          System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
          Files.deleteIfExists(Paths.get(s"$outDir/$name._REFUSED"))
          deleteDump(s"$outDir/$name")
          Files.writeString(Paths.get(s"$outDir/$name._FAILED"),
            s"${e.getClass.getName}: ${e.getMessage}\n")
      }
    }
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] ${failed.size}/${selected.size} queries FAILED: " +
          failed.sorted.mkString(", "))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
