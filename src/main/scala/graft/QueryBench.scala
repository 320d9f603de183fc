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
  * warm pass (and ≥0.3 s absolute) OR ≥1.5× the CHECKED-IN
  * historical minimum for the same query and scale (files ending
  * _10x.json / _100x.json under tools/sweeps, matched from the data
  * dir name) is re-timed — up to TWICE total — and the MINIMUM is
  * recorded; the historical arm exists because the round-11 escape
  * was a row whose warm AND timed passes were BOTH
  * mid-sweep-elevated, which the warm-only criterion cannot see. A
  * row still above the historical bar after the retries ships with
  * `hist_flag: true` in its telemetry and a stderr warning naming
  * the standalone re-time it needs. (b) every row carries telemetry
  * (warm-pass wall, every timed pass, the historical minimum, 1-min
  * load average before/after, GC ms) in a sibling `telemetry`
  * object, so a residual outlier is adjudicable from the JSON alone.
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

  /** Per-query historical MINIMUM walls from every checked-in sweep
    * of the same scale (files ending _10x.json under tools/sweeps for
    * a scale10 dir, _100x.json for scale100) — the noise baseline the
    * round-11 q_join_inner escape needed. Refusals/crashes (≤0) are
    * excluded; an absent directory or unmatched scale returns empty
    * (the warm-pass criterion still applies).
    */
  private[graft] def historyMins(sfDir: String,
      sweepsDir: String = "tools/sweeps"): Map[String, Double] = {
    val base = new java.io.File(sfDir).getName
    val suffix =
      if (base.contains("scale100") || base.contains("100x")) "_100x.json"
      else if (base.contains("scale10") || base.contains("10x")) "_10x.json"
      else return Map.empty
    val dir = new java.io.File(sweepsDir)
    val files = Option(dir.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(suffix))
    // whitespace-TOLERANT matching: checked-in sweeps serialize both
    // compact ("queries":{"q":1.2) and pretty ("queries": { "q": 1.2)
    // — a space-blind parser silently reads minima from a stale
    // subset, hollowing out the defense
    val qrx = """"queries"\s*:\s*\{""".r
    val rx = """"([A-Za-z0-9_]+)"\s*:\s*(-?\d+(?:\.\d+)?)""".r
    files.toSeq.flatMap { f =>
      val txt = {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.mkString finally src.close()
      }
      qrx.findFirstMatchIn(txt) match {
        case None => Seq.empty
        case Some(m) =>
          val qStart = m.start
          val qEnd = txt.indexOf("}", qStart)
          if (qEnd < 0) Seq.empty
          else rx.findAllMatchIn(txt.substring(qStart, qEnd))
            .map(g => g.group(1) -> g.group(2).toDouble).toSeq
      }
    }.groupBy(_._1)
      .flatMap { case (q, vs) =>
        val pos = vs.map(_._2).filter(_ > 0)
        if (pos.isEmpty) None else Some(q -> pos.min)
      }
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
    val hist = historyMins(sfDir)
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
        val histMin = hist.get(q)
        // self-adjudicating outlier retries: the warm pass (which also
        // paid codegen/JIT) bounds what a clean timed pass can cost,
        // and the checked-in historical minimum catches the case the
        // warm criterion cannot — BOTH passes elevated mid-sweep
        def warmHot(v: Double) = v >= warm * 1.5 && v - warm >= 0.3
        def histHot(v: Double) =
          histMin.exists(h => v >= h * 1.5 && v - h >= 0.3)
        // at most TWO re-times total (matching the doc) — a box
        // uniformly slower than history must not quadruple a
        // 200-query sweep's work only to ship flagged rows anyway
        var passes = List(first)
        var extra = 0
        while ((warmHot(passes.min) || histHot(passes.min)) && extra < 2) {
          passes :+= pass()
          extra += 1
        }
        val sec = passes.min
        val histFlag = histHot(sec)
        telemetry += q -> (s"""{"warm":${fmt(warm)},"passes":[${
          passes.map(fmt).mkString(",")}],"load0":${fmt(load0)},""" +
          s""""load1":${fmt(loadAvg)},"gc_ms":${gcMs - gc0}""" +
          histMin.map(h => s""","hist_min":${fmt(h)}""").getOrElse("") +
          (if (histFlag) s""","hist_flag":true""" else "") + "}")
        if (histFlag) System.err.println(
          f"[qbench] WARNING $q settled at ${sec}%.2f s, still ≥1.5× its " +
            f"checked-in minimum ${histMin.get}%.2f s after retries — " +
            "re-time standalone on an idle box and adjudicate before " +
            "shipping this row")
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
