package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query steady-state timer: run any catalog subset against
  * any data directory (typically a ScaleUp replica) and print one JSON
  * line of per-query seconds — the evidence harness behind the
  * BASELINE.md scale tables.
  *
  * Usage: `runMain graft.QueryBench <sfDir> <q1,q2,...|all>`; each
  * query gets one warm pass (JIT/codegen/IO cache) and one timed
  * pass, same protocol as the steady-state rows in BASELINE.md.
  * `all` sweeps the entire catalog; a query that throws records -1
  * (and its error on stderr) instead of killing the sweep — the
  * full-catalog scale sweep must report every red, not stop at the
  * first.
  *
  * Noise adjudication: one-shot sweep rows feed the DERIVED budget
  * gate, so a single load spike must not be able to loosen a budget
  * silently (a round-10 spike recorded q_range_join at 4.6× its real
  * wall). Two defenses: (a) a timed pass that reads ≥1.5× its own
  * warm pass (and ≥0.3 s absolute) is re-timed once and the MINIMUM
  * is recorded — the warm pass is the row's own noise baseline, no
  * checked-in reference needed; (b) every row carries telemetry
  * (warm-pass wall, every timed pass, 1-min load average before/
  * after, GC ms during the passes) in a sibling `telemetry` object,
  * so a residual outlier is adjudicable from the JSON alone.
  * `queries` values stay plain scalars — existing sweep tooling
  * parses unchanged.
  */
object QueryBench {

  private def loadAvg: Double = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.getSystemLoadAverage

  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // one config source: the engine's own session factory — a timed
    // plan must run under the same planner settings (AQE, extensions,
    // timestamp handling) as the engine it measures
    val spark = graft.core.SparkEnv.session(appName = "graft-qbench",
      cores = cpus)
    spark.sparkContext.setLogLevel("WARN")
    val selected =
      if (names == "all") analytics.Catalog.all.map(_.name)
      else names.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val telemetry = scala.collection.mutable.LinkedHashMap
      .empty[String, String]
    def fmt(d: Double): String = (math.rint(d * 1000) / 1000).toString
    val results = selected.zipWithIndex.map { case (q, i) =>
      try {
        val load0 = loadAvg
        def pass(): Double = {
          val t0 = System.nanoTime()
          analytics.Catalog.byName(q).run(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val gc0 = gcMs
        val warm = pass()
        val first = pass()
        // self-adjudicating outlier retry: the warm pass (which also
        // paid codegen/JIT) bounds what a clean timed pass can cost
        val passes =
          if (first >= warm * 1.5 && first - warm >= 0.3)
            Seq(first, pass())
          else Seq(first)
        val sec = passes.min
        telemetry += q -> (s"""{"warm":${fmt(warm)},"passes":[${
          passes.map(fmt).mkString(",")}],"load0":${fmt(load0)},""" +
          s""""load1":${fmt(loadAvg)},"gc_ms":${gcMs - gc0}}""")
        // live progress so a long sweep is monitorable mid-flight
        System.err.println(
          f"[qbench] ${i + 1}/${selected.size} $q ${sec}%.2f s" +
            (if (passes.length > 1)
              f" (retimed: first ${passes.head}%.2f s)" else ""))
        q -> sec
      } catch {
        case r: graft.core.PreflightRefusal =>
          // an INTENDED pre-flight refusal, not a crash — recorded as
          // a distinct value so the gate can pass-with-note while a
          // genuine crash in the same query stays red
          System.err.println(s"[qbench] $q REFUSED: ${r.getMessage}")
          q -> Double.NaN
        case e: Throwable =>
          System.err.println(s"[qbench] $q FAILED: ${e.getMessage}")
          q -> -1.0
      }
    }
    val queriesJson = results
      .map { case (q, s) =>
        if (s.isNaN) s""""$q":"refused""""
        else s""""$q":${math.rint(s * 1000) / 1000}"""
      }
      .mkString(",")
    val telemetryJson = telemetry
      .map { case (q, t) => s""""$q":$t""" }.mkString(",")
    println("{\"sf\":\"" + sfDir + "\",\"queries\":{" + queriesJson +
      "},\"telemetry\":{" + telemetryJson + "}}")
    spark.stop()
  }
}
