package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side recomputation checks for the statistical-testing family:
  * each catalog query runs end to end on sf0.001 and its statistic is
  * re-derived with plain Scala collections — an oracle independent of
  * both Spark's and DuckDB's SQL engines.
  */
class StatsQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val events: Seq[(String, java.sql.Timestamp, Double)] =
    graft.io.Tables.table(spark, sf, "events")
      .select(col("event_type"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
      .toSeq

  test("q_mannwhitney U equals the brute-force pair count") {
    val a = events.filter(_._1 == "click").map(_._3)
    val b = events.filter(_._1 == "purchase").map(_._3)
    var u = 0.0
    for (x <- a; y <- b)
      u += (if (x > y) 1.0 else if (x == y) 0.5 else 0.0)
    val row = StatsQueries.qMannWhitney.run(spark, sf).collect().head
    assert(row.getLong(0) === a.size.toLong)
    assert(row.getLong(1) === b.size.toLong)
    assert(row.getDouble(2) === u)
  }

  test("q_weighted_median matches a sequential cumulative-weight scan") {
    val li = graft.io.Tables.table(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val expected = li.groupBy(_._1).map { case (flag, rows) =>
      val sorted = rows.sortBy(_._2)
      val total = rows.map(_._3).sum
      var cum = 0.0
      val wm = sorted.find { r => cum += r._3; cum * 2 >= total }.get._2
      flag -> wm
    }
    val got = StatsQueries.qWeightedMedian.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (flag, wm) =>
      assert(math.abs(got(flag) - wm) < 1e-9, s"flag $flag")
    }
  }

  test("q_ttest_welch reproduces the hand formula per event_type") {
    def isWeekend(t: java.sql.Timestamp): Boolean = {
      val d = t.toInstant.atZone(java.time.ZoneOffset.UTC).getDayOfWeek
      d == java.time.DayOfWeek.SATURDAY || d == java.time.DayOfWeek.SUNDAY
    }
    val byType = events.groupBy(_._1)
    val got = StatsQueries.qTtestWelch.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(4))).toMap
    byType.foreach { case (tp, rows) =>
      val we = rows.filter(r => isWeekend(r._2)).map(_._3)
      val wd = rows.filterNot(r => isWeekend(r._2)).map(_._3)
      def meanVar(xs: Seq[Double]): (Double, Double) = {
        val m = xs.sum / xs.size
        (m, xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
      }
      val (m1, v1) = meanVar(we)
      val (m2, v2) = meanVar(wd)
      val tstat = (m1 - m2) / math.sqrt(v1 / we.size + v2 / wd.size)
      val (n1, n2, gotT) = got(tp)
      assert(n1 === we.size.toLong)
      assert(n2 === wd.size.toLong)
      assert(math.abs(gotT - tstat) < 1e-4, s"type $tp: $gotT vs $tstat")
    }
  }

  test("q_chi2_independence matches the driver-side contingency math") {
    val cells = events.groupBy { case (tp, t, _) =>
      val h = t.toInstant.atZone(java.time.ZoneOffset.UTC).getHour
      (tp, if (h < 12) "am" else "pm")
    }.view.mapValues(_.size.toLong).toMap
    val n = cells.values.sum.toDouble
    val rowT = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val colT = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val chi2 = cells.map { case ((tp, dp), obs) =>
      val e = rowT(tp).toDouble * colT(dp) / n
      (obs - e) * (obs - e) / e
    }.sum
    val rows = StatsQueries.qChi2Independence.run(spark, sf).collect()
    assert(rows.length === cells.size)
    assert(math.abs(rows.head.getDouble(4) - chi2) < 1e-3)
    rows.foreach { r =>
      assert(r.getLong(2) === cells((r.getString(0), r.getString(1))))
      assert(r.getLong(5) ===
        (rowT.size - 1).toLong * (colT.size - 1))
    }
  }

  test("q_theilsen equals the median of pairwise hourly-mean slopes") {
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val hourly = events.groupBy { case (tp, t, _) =>
      (tp, java.time.Duration.between(t0, t.toInstant).toHours)
    }.view.mapValues(vs => vs.map(_._3).sum / vs.size).toMap
    def medianInterp(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.size - 1)
      val lo = s(pos.toInt)
      val hi = s(math.ceil(pos).toInt)
      lo + (hi - lo) * (pos - pos.toInt)
    }
    val expected = hourly.keys.map(_._1).toSet.map { (tp: String) =>
      val pts = hourly.collect { case ((`tp`, x), y) => (x, y) }.toSeq
      val slopes = for {
        (xa, ya) <- pts; (xb, yb) <- pts if xa < xb
      } yield (yb - ya) / (xb - xa)
      tp -> medianInterp(slopes.toSeq)
    }.toMap
    val got = StatsQueries.qTheilSen.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    expected.foreach { case (tp, sl) =>
      assert(math.abs(got(tp) - sl) < 1e-5, s"type $tp")
    }
  }

  test("q_kaplan_meier: survival is monotone decreasing in (0, 1); risk set shrinks") {
    val rows = StatsQueries.qKaplanMeier.run(spark, sf).collect()
    assert(rows.nonEmpty)
    var prevS = 1.0
    var prevN = Long.MaxValue
    rows.foreach { r =>
      val (n, s) = (r.getLong(2), r.getDouble(3))
      assert(s > 0.0 && s < 1.0 && s <= prevS + 1e-12, s"t=${r.getLong(0)}")
      assert(n <= prevN)
      prevS = s; prevN = n
    }
  }

  test("q_huber_trend shrugs off a planted outlier that drags OLS") {
    // clean slope 1.0/hour with one wild spike: OLS tilts, Huber holds
    val dir = java.nio.file.Files.createTempDirectory("huber").toString
    import spark.implicits._
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val rows = (0 until 200).map { i =>
      // spike at the END: max leverage on the slope
      val v = if (i == 199) 5000.0 else 10.0 + i * 1.0
      (i.toLong, java.sql.Timestamp.from(t0.plusSeconds(i * 3600L)),
        1L, "click", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val huber = StatsQueries.qHuberTrend.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val gotPerHour = huber("click") / 24.0 // slope_per_day → per hour
    assert(math.abs(gotPerHour - 1.0) < 0.05,
      s"huber slope/hour $gotPerHour should be ~1.0")
    // the naive OLS on the same data is visibly dragged by the spike
    val xs = rows.map(r => (r._1.toDouble, r._5))
    val n = xs.size.toDouble
    val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val sxy = xs.map(p => p._1 * p._2).sum
    val olsSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(olsSlope - 1.0) > 0.15,
      s"test premise: OLS should be dragged, got $olsSlope")
  }

  test("q_ks_test equals the brute-force two-sample D over pooled values") {
    val a = events.filter(_._1 == "click").map(_._3).sorted
    val b = events.filter(_._1 == "purchase").map(_._3).sorted
    val pooled = (a ++ b).distinct.sorted
    def cdf(xs: Seq[Double], v: Double): Double =
      xs.count(_ <= v).toDouble / xs.size
    val d = pooled.map(v => math.abs(cdf(a, v) - cdf(b, v))).max
    val row = StatsQueries.qKsTest.run(spark, sf).collect().head
    assert(math.abs(row.getDouble(0) - d) < 1e-6)
    assert(row.getLong(2) === a.size.toLong)
    assert(row.getLong(3) === b.size.toLong)
  }

  test("q_gini matches the driver-side rank-weighted formula") {
    val revs = graft.io.Tables.table(spark, sf, "orders")
      .select(col("o_custkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }.toSeq
    val sorted = revs.sortBy { case (k, v) => (v, k) }
    val n = sorted.size
    val t = sorted.map(_._2).sum.toDouble
    val s = sorted.zipWithIndex
      .map { case ((_, v), i) => (i + 1) * v.toDouble }.sum
    val gini = 2 * s / (n * t) - (n + 1.0) / n
    val got = AggregateQueries.qGini.run(spark, sf).collect().head
    assert(got.getLong(0) === n.toLong)
    assert(math.abs(got.getDouble(2) - gini) < 1e-6)
  }

  test("q_winsorize means sit between clipped bounds and raw mean shifts") {
    val rows = StatsQueries.qWinsorize.run(spark, sf).collect()
    rows.foreach { r =>
      val (p05, p95, wm) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p05 <= p95)
      assert(wm >= p05 - 1e-9 && wm <= p95 + 1e-9)
    }
  }
}
