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
  */
object QueryBench {
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
    val results = selected.zipWithIndex.map { case (q, i) =>
      try {
        val run = analytics.Catalog.byName(q).run(spark, sfDir)
        run.write.format("noop").mode("overwrite").save() // warm
        val t0 = System.nanoTime()
        analytics.Catalog.byName(q).run(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // live progress so a long sweep is monitorable mid-flight
        System.err.println(
          f"[qbench] ${i + 1}/${selected.size} $q ${sec}%.2f s")
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
    val json = results
      .map { case (q, s) =>
        if (s.isNaN) s""""$q":"refused""""
        else s""""$q":${math.rint(s * 1000) / 1000}"""
      }
      .mkString("{\"sf\":\"" + sfDir + "\",\"queries\":{", ",", "}}")
    println(json)
    spark.stop()
  }
}
