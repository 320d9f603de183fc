package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** Statistical-testing and robust-estimation coverage: the hypothesis
  * tests and order-statistic estimators an analytics engine runs over
  * metric streams (A/B cohort comparison, independence screens, robust
  * trend/median under outliers). The reference's analytics package is
  * empty (`/root/reference/src/analytics/__init__.py:1`); this extends
  * the engine's profiling family (q_benford, q_anomalies_*) with the
  * inferential layer on top of the same sufficient-statistics idiom:
  * every test is one or two distributed aggregations of exact decimal
  * sums, with the final statistic computed in identical IEEE double
  * expression trees in both engines.
  *
  * Scale posture shared by all entries: no global single-partition
  * window ever touches raw rows. Where a global order is semantically
  * required (Mann-Whitney ranks), the cumulative count runs as a
  * range-partitioned local window plus a P-row broadcast offset roll —
  * the same distributed-prefix-sum shape as
  * [[graft.text.SequencePacking.balancedShards]].
  */
object StatsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Chi-squared test of independence between event_type and day-part
    * (AM/PM): the two-variable generalization of q_benford's
    * goodness-of-fit screen — "does the type mix drift by time of
    * day?". Observed counts are one grouped aggregation; row/column
    * margins are two more tiny aggregations broadcast back; expected
    * counts and per-cell terms are computed in double on exact integer
    * inputs, and the chi2 total goes through a DECIMAL(28,10) cast per
    * cell so partial-aggregation order can't perturb the sum. Output
    * is the full contingency diagnostic (cell, observed, expected)
    * plus the statistic and degrees of freedom on every row.
    */
  val qChi2Independence: QueryDef = QueryDef.sql(
    "q_chi2_independence",
    """WITH o AS (
      |  SELECT event_type,
      |    CASE WHEN extract(hour FROM ts) < 12 THEN 'am' ELSE 'pm' END
      |      AS daypart,
      |    count(*) AS n_obs
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT event_type, sum(n_obs) AS row_n FROM o GROUP BY 1),
      |ct AS (SELECT daypart, sum(n_obs) AS col_n FROM o GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM o),
      |e AS (
      |  SELECT o.event_type, o.daypart, o.n_obs,
      |    CAST(rt.row_n * ct.col_n AS DOUBLE) / tot.n AS exp_n
      |  FROM o
      |  JOIN rt ON o.event_type = rt.event_type
      |  JOIN ct ON o.daypart = ct.daypart
      |  CROSS JOIN tot),
      |x AS (
      |  SELECT CAST(sum(CAST((n_obs - exp_n) * (n_obs - exp_n) / exp_n
      |      AS DECIMAL(28,10))) AS DOUBLE) AS chi2,
      |    (count(DISTINCT event_type) - 1) * (count(DISTINCT daypart) - 1)
      |      AS dof
      |  FROM e)
      |SELECT e.event_type, e.daypart, e.n_obs,
      |  CAST(round(e.exp_n, 4) AS DOUBLE) AS exp_n,
      |  CAST(round(x.chi2, 4) AS DOUBLE) AS chi2, x.dof
      |FROM e CROSS JOIN x
      |ORDER BY e.event_type, e.daypart""".stripMargin,
    doc = "chi-squared independence test: event_type x day-part contingency") { (s, dir) =>
    val o = t(s, dir, "events")
      .select(col("event_type"),
        when(hour(col("ts")) < 12, "am").otherwise("pm").as("daypart"))
      .groupBy("event_type", "daypart").agg(count(lit(1)).as("n_obs"))
    val rt = o.groupBy("event_type").agg(sum("n_obs").as("row_n"))
    val ct = o.groupBy("daypart").agg(sum("n_obs").as("col_n"))
    val tot = o.agg(sum("n_obs").cast("long").as("n"))
    val e = o.join(broadcast(rt), "event_type")
      .join(broadcast(ct), "daypart")
      .crossJoin(broadcast(tot))
      .select(col("event_type"), col("daypart"), col("n_obs"),
        ((col("row_n") * col("col_n")).cast("double") / col("n"))
          .as("exp_n"))
    val x = e.agg(
      sum(((col("n_obs") - col("exp_n")) * (col("n_obs") - col("exp_n"))
        / col("exp_n")).cast("decimal(28,10)")).cast("double").as("chi2"),
      ((countDistinct(col("event_type")) - 1) *
        (countDistinct(col("daypart")) - 1)).as("dof"))
    e.crossJoin(broadcast(x))
      .select(col("event_type"), col("daypart"), col("n_obs"),
        round(col("exp_n"), 4).cast("double").as("exp_n"),
        round(col("chi2"), 4).cast("double").as("chi2"), col("dof"))
      .orderBy("event_type", "daypart")
  }

  /** Welch's unequal-variance t-test per event_type: weekend vs
    * weekday values — the A/B-comparison primitive. One grouped pass
    * collects (n, Σy, Σy²) per (type, cohort) with decimal-exact sums
    * (y quantized at 4 decimals, y² at 8 — both inputs carry ≤ 2
    * fractional digits so the casts are lossless); mean, variance, the
    * t statistic, and the Welch–Satterthwaite df are then identical
    * double expression trees in both engines. At scale this is a
    * single map-side-combined aggregation however many rows stream
    * through — the textbook sufficient-statistics shape.
    */
  val qTtestWelch: QueryDef = QueryDef.sql(
    "q_ttest_welch",
    """WITH c AS (
      |  SELECT event_type,
      |    CASE WHEN extract(dow FROM ts) IN (0, 6) THEN 1 ELSE 0 END
      |      AS we,
      |    value AS y
      |  FROM events),
      |s AS (
      |  SELECT event_type, we, count(*) AS n,
      |    CAST(sum(CAST(y AS DECIMAL(20,4))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(y * y AS DECIMAL(30,8))) AS DOUBLE) AS syy
      |  FROM c GROUP BY 1, 2),
      |w AS (
      |  SELECT a.event_type,
      |    a.n AS n_we, b.n AS n_wd,
      |    a.sy / a.n AS m_we, b.sy / b.n AS m_wd,
      |    (a.syy - a.sy * a.sy / a.n) / (a.n - 1) / a.n AS v_we,
      |    (b.syy - b.sy * b.sy / b.n) / (b.n - 1) / b.n AS v_wd
      |  FROM s a JOIN s b ON a.event_type = b.event_type
      |  WHERE a.we = 1 AND b.we = 0)
      |SELECT event_type, n_we, n_wd,
      |  round(m_we - m_wd, 6) AS mean_diff,
      |  round((m_we - m_wd) / sqrt(v_we + v_wd), 6) AS t_stat,
      |  round((v_we + v_wd) * (v_we + v_wd) /
      |    (v_we * v_we / (n_we - 1) + v_wd * v_wd / (n_wd - 1)), 4)
      |    AS df
      |FROM w ORDER BY event_type""".stripMargin,
    doc = "Welch t-test weekend vs weekday per event_type (sufficient statistics)") { (s, dir) =>
    val c = t(s, dir, "events")
      .select(col("event_type"),
        when(dayofweek(col("ts")).isin(1, 7), 1).otherwise(0).as("we"),
        col("value").as("y"))
    val st = c.groupBy("event_type", "we").agg(
      count(lit(1)).as("n"),
      sum(col("y").cast("decimal(20,4)")).cast("double").as("sy"),
      sum((col("y") * col("y")).cast("decimal(30,8)")).cast("double")
        .as("syy"))
    val a = st.filter(col("we") === 1)
      .select(col("event_type"), col("n").as("n_we"), col("sy").as("sy_a"),
        col("syy").as("syy_a"))
    val b = st.filter(col("we") === 0)
      .select(col("event_type"), col("n").as("n_wd"), col("sy").as("sy_b"),
        col("syy").as("syy_b"))
    val w = a.join(b, "event_type")
      .select(col("event_type"), col("n_we"), col("n_wd"),
        (col("sy_a") / col("n_we")).as("m_we"),
        (col("sy_b") / col("n_wd")).as("m_wd"),
        ((col("syy_a") - col("sy_a") * col("sy_a") / col("n_we"))
          / (col("n_we") - 1) / col("n_we")).as("v_we"),
        ((col("syy_b") - col("sy_b") * col("sy_b") / col("n_wd"))
          / (col("n_wd") - 1) / col("n_wd")).as("v_wd"))
    w.select(col("event_type"), col("n_we"), col("n_wd"),
        round(col("m_we") - col("m_wd"), 6).as("mean_diff"),
        round((col("m_we") - col("m_wd"))
          / sqrt(col("v_we") + col("v_wd")), 6).as("t_stat"),
        round((col("v_we") + col("v_wd")) * (col("v_we") + col("v_wd"))
          / (col("v_we") * col("v_we") / (col("n_we") - 1)
            + col("v_wd") * col("v_wd") / (col("n_wd") - 1)), 4).as("df"))
      .orderBy("event_type")
  }

  /** Weighted median: per return-flag, the smallest extended price at
    * which cumulative quantity reaches half the total — the
    * inventory-weighted "typical price". Entirely integral/decimal
    * arithmetic (no doubles anywhere), and the window is PARTITIONED
    * by the group key: one keyed exchange, each group sorted locally,
    * which scales with group count rather than collapsing to a single
    * partition. Tie-safe: if the threshold lands inside an equal-price
    * run, every qualifying row shares that price, so min() is
    * order-independent.
    */
  val qWeightedMedian: QueryDef = QueryDef.sql(
    "q_weighted_median",
    """WITH w AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
      |    CAST(l_quantity AS DECIMAL(18,2)) AS qty,
      |    sum(CAST(l_quantity AS DECIMAL(18,2)))
      |      OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice,
      |            l_orderkey, l_linenumber) AS cum,
      |    sum(CAST(l_quantity AS DECIMAL(18,2)))
      |      OVER (PARTITION BY l_returnflag) AS total
      |  FROM lineitem)
      |SELECT flag,
      |  CAST(min(price) AS DOUBLE) AS wmedian_price,
      |  CAST(max(total) AS DOUBLE) AS total_qty
      |FROM w WHERE cum * 2 >= total
      |GROUP BY flag ORDER BY flag""".stripMargin,
    doc = "quantity-weighted median price per return flag (bucket prefix sum, exact)") { (s, dir) =>
    // The naive per-group cumulative window funnels every row of a
    // group through ONE sort partition — with 3 return flags that is 3
    // threads however big lineitem gets (measured 7.4x wall at 10x).
    // Instead: price-bucket prefix sums locate the threshold bucket
    // (grid bounded by the price range), and only THAT bucket's
    // distinct prices see a window — the same deterministic
    // bucket-decomposition as q_mannwhitney's rank prefix sum.
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"),
        col("l_quantity").cast("decimal(18,2)").as("qty"))
      .withColumn("b", floor(col("price") / 64).cast("long"))
    val bsum = li.groupBy("flag", "b").agg(sum(col("qty")).as("bqty"))
    val wB = Window.partitionBy(col("flag")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bcum = bsum.withColumn("bcum", sum(col("bqty")).over(wB))
    val tot = bsum.groupBy("flag").agg(sum(col("bqty")).as("total"))
    // threshold bucket: first whose inclusive cum crosses half —
    // its exclusive prefix rides along for the in-bucket resolve
    val thr = bcum.join(broadcast(tot), "flag")
      .filter(col("bcum") * 2 >= col("total"))
      .groupBy("flag").agg(min_by(
        struct(col("b"), (col("bcum") - col("bqty")).as("prefix"),
          col("total")), col("b")).as("t"))
      .select(col("flag").as("tflag"), col("t.b").as("tb"),
        col("t.prefix").as("prefix"), col("t.total").as("total"))
    val inb = li.join(broadcast(thr),
        col("flag") === col("tflag") && col("b") === col("tb"))
      .select(col("flag"), col("price"), col("qty"), col("prefix"),
        col("total"))
      .groupBy("flag", "price", "prefix", "total")
      .agg(sum(col("qty")).as("pq"))
    val wP = Window.partitionBy(col("flag")).orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inb.withColumn("pcum", sum(col("pq")).over(wP))
      .filter((col("prefix") + col("pcum")) * 2 >= col("total"))
      .groupBy("flag")
      .agg(min(col("price")).cast("double").as("wmedian_price"),
        max(col("total")).cast("double").as("total_qty"))
      .orderBy("flag")
  }

  /** Theil-Sen robust trend per event_type: median of pairwise slopes
    * over HOURLY MEANS — the estimator q_trend_ols's least squares
    * can't give you when a meter glitches (one wild hour drags OLS,
    * the pairwise median shrugs). The pair explosion is bounded by
    * TIME RESOLUTION, not data volume: however many raw rows arrive,
    * each type contributes ≤ hours² pairs (720 hours → ~259k pairs per
    * type at any SF), so the self-join input is a pre-aggregated table
    * orders of magnitude smaller than the fact table. Hourly means are
    * exact-decimal-sum / count doubles; the slope median rides the
    * interpolated-percentile parity q_percentiles pins.
    */
  val qTheilSen: QueryDef = QueryDef.sql(
    "q_theilsen",
    """WITH h AS (
      |  SELECT event_type,
      |    CAST(date_diff('hour', TIMESTAMP '2024-01-01',
      |      date_trunc('hour', ts)) AS BIGINT) AS x,
      |    CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(*)
      |      AS y
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT a.event_type, (b.y - a.y) / (b.x - a.x) AS slope
      |  FROM h a JOIN h b
      |    ON a.event_type = b.event_type AND a.x < b.x)
      |SELECT event_type, count(*) AS n_pairs,
      |  round(quantile_cont(slope, 0.5), 6) AS ts_slope_per_hour
      |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin,
    doc = "Theil-Sen robust slope on hourly means (bounded pair explosion)") { (s, dir) =>
    val h = t(s, dir, "events")
      .groupBy(col("event_type"),
        ((unix_timestamp(date_trunc("hour", col("ts")))
          - unix_timestamp(lit("2024-01-01").cast("timestamp"))) / 3600L)
          .cast("long").as("x"))
      .agg((sum(col("value").cast("decimal(20,4)")).cast("double")
        / count(lit(1))).as("y"))
    val a = h.select(col("event_type"), col("x").as("xa"), col("y").as("ya"))
    val b = h.select(col("event_type"), col("x").as("xb"), col("y").as("yb"))
    a.join(b, Seq("event_type")).filter(col("xa") < col("xb"))
      .select(col("event_type"),
        ((col("yb") - col("ya")) / (col("xb") - col("xa"))).as("slope"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5)"), 6).as("ts_slope_per_hour"))
      .orderBy("event_type")
  }

  /** Winsorized mean per event_type: clip at the exact interpolated
    * p05/p95, then average the clipped values — the robust location
    * estimate feeding quality dashboards (q_anomalies_mad's location
    * twin). Two aggregate passes: percentile bounds per group (tiny,
    * broadcast back), then one clipped-sum pass with the clipped
    * values quantized to DECIMAL(18,4) before summing so both engines
    * add identical exact numbers in any order.
    */
  val qWinsorize: QueryDef = QueryDef.sql(
    "q_winsorize",
    """WITH b AS (
      |  SELECT event_type,
      |    quantile_cont(value, 0.05) AS lo,
      |    quantile_cont(value, 0.95) AS hi
      |  FROM events GROUP BY 1),
      |c AS (
      |  SELECT e.event_type,
      |    CAST(round(CASE WHEN e.value < b.lo THEN b.lo
      |                    WHEN e.value > b.hi THEN b.hi
      |                    ELSE e.value END, 4) AS DECIMAL(18,4)) AS cv,
      |    CAST(round(b.lo, 4) AS DOUBLE) AS lo,
      |    CAST(round(b.hi, 4) AS DOUBLE) AS hi
      |  FROM events e JOIN b ON e.event_type = b.event_type)
      |SELECT event_type, count(*) AS n, min(lo) AS p05, max(hi) AS p95,
      |  round(CAST(sum(cv) AS DOUBLE) / count(*), 6) AS winsorized_mean
      |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
    doc = "winsorized mean per event_type (p05/p95 clip, decimal-exact sum)") { (s, dir) =>
    val ev = t(s, dir, "events")
    val b = ev.groupBy("event_type").agg(
      expr("percentile(value, 0.05)").as("lo"),
      expr("percentile(value, 0.95)").as("hi"))
    val c = ev.join(broadcast(b), "event_type")
      .select(col("event_type"),
        round(when(col("value") < col("lo"), col("lo"))
          .when(col("value") > col("hi"), col("hi"))
          .otherwise(col("value")), 4).cast("decimal(18,4)").as("cv"),
        round(col("lo"), 4).cast("double").as("lo"),
        round(col("hi"), 4).cast("double").as("hi"))
    c.groupBy("event_type")
      .agg(count(lit(1)).as("n"), min(col("lo")).as("p05"),
        max(col("hi")).as("p95"),
        round(sum(col("cv")).cast("double") / count(lit(1)), 6)
          .as("winsorized_mean"))
      .orderBy("event_type")
  }

  /** Mann-Whitney U (rank-sum) test: click vs purchase values — the
    * nonparametric cohort comparison that needs a GLOBAL rank, which
    * is exactly the operation that can't be a naive window at scale.
    * The engine never ranks raw rows: it groups to distinct values
    * (with per-cohort counts), buckets them by a deterministic
    * value-derived key, computes the cumulative purchase-count with a
    * bucket-keyed window, and rolls bucket totals into broadcast
    * offsets — the distributed-prefix-sum shape of balancedShards with
    * a value-functional bucket key (physical partition ids are not
    * stable across plan branches; floor(v) is).
    * U = Σ_v n_click(v)·(purchases below v + half the
    * ties at v), kept in exact DECIMAL throughout; only the normal
    * z-approximation (with exact tie correction) runs in double.
    */
  val qMannWhitney: QueryDef = QueryDef.sql(
    "q_mannwhitney",
    """WITH g AS (
      |  SELECT value AS v,
      |    count(CASE WHEN event_type = 'click' THEN 1 END) AS na,
      |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS nb
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY value),
      |c AS (
      |  SELECT v, na, nb,
      |    coalesce(sum(nb) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum_b
      |  FROM g),
      |u AS (
      |  SELECT
      |    CAST(sum(na) AS BIGINT) AS n1, CAST(sum(nb) AS BIGINT) AS n2,
      |    CAST(sum(CAST(na AS DECIMAL(38,0)) * (2 * cum_b + nb))
      |      AS DECIMAL(38,0)) AS u2x,
      |    CAST(sum(CAST((na + nb) AS DECIMAL(38,0))
      |        * (na + nb) * (na + nb) - (na + nb)) AS DECIMAL(38,0))
      |      AS tie3
      |  FROM c)
      |SELECT n1, n2, CAST(u2x AS DOUBLE) / 2 AS u_stat,
      |  round((CAST(u2x AS DOUBLE) / 2 - CAST(n1 AS DOUBLE) * n2 / 2) /
      |    sqrt(CAST(n1 AS DOUBLE) * n2 / 12 *
      |      ((n1 + n2 + 1) - CAST(tie3 AS DOUBLE) /
      |        ((n1 + n2) * CAST(n1 + n2 - 1 AS DOUBLE)))), 6) AS z
      |FROM u""".stripMargin,
    doc = "Mann-Whitney U click vs purchase (distributed rank via prefix sum)") { (s, dir) =>
    val g = t(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("value").as("v"))
      .agg(count(when(col("event_type") === "click", 1)).as("na"),
        count(when(col("event_type") === "purchase", 1)).as("nb"))
    // Distributed prefix sum of nb over value order, bucketed by a
    // DETERMINISTIC value-derived key (floor(v)) — not by physical
    // partition id: spark_partition_id after repartitionByRange is
    // evaluation-order-dependent (range boundaries are sampled with a
    // per-RDD seed, so two branches of the same plan can disagree).
    // The in-bucket cumsum is a keyed window (scales with buckets);
    // the only unpartitioned window rolls bucket totals — a table
    // bounded by the metric's value range, not by data volume.
    val bucketed = g.withColumn("__b", floor(col("v")).cast("long"))
    val localW = Window.partitionBy(col("__b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = bucketed.withColumn("__lcum",
      coalesce(sum(col("nb")).over(localW), lit(0L)))
    val offW = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ptot = bucketed.groupBy(col("__b")).agg(sum(col("nb")).as("__psum"))
      .withColumn("__off", coalesce(sum(col("__psum")).over(offW), lit(0L)))
      .select(col("__b"), col("__off"))
    val c = withLocal.join(broadcast(ptot), Seq("__b"))
      .select(col("v"), col("na"), col("nb"),
        (col("__lcum") + col("__off")).as("cum_b"))
    val u = c.agg(
      sum(col("na")).cast("long").as("n1"),
      sum(col("nb")).cast("long").as("n2"),
      sum(col("na").cast("decimal(38,0)")
        * (lit(2) * col("cum_b") + col("nb")))
        .cast("decimal(38,0)").as("u2x"),
      sum((col("na") + col("nb")).cast("decimal(38,0)")
        * (col("na") + col("nb")) * (col("na") + col("nb"))
        - (col("na") + col("nb"))).cast("decimal(38,0)").as("tie3"))
    u.select(col("n1"), col("n2"),
      (col("u2x").cast("double") / 2).as("u_stat"),
      round((col("u2x").cast("double") / 2
          - col("n1").cast("double") * col("n2") / 2) /
        sqrt(col("n1").cast("double") * col("n2") / 12 *
          ((col("n1") + col("n2") + 1) - col("tie3").cast("double") /
            ((col("n1") + col("n2"))
              * (col("n1") + col("n2") - 1).cast("double")))), 6).as("z"))
  }

  /** Kaplan-Meier survival curve: time from each user's first event to
    * first purchase, censoring never-purchasers at the observation
    * end — the time-to-event family (churn/conversion curves) none of
    * the moment-based queries cover. Durations are quantized to whole
    * hours, so the risk table is bounded by the CALENDAR (≤ hours in
    * the window) however many users stream through; per-user reduction
    * is one grouped aggregation. S(t) = Π(1 − d/n) runs as
    * exp(cumsum(ln(1 − d/n))) with the ln terms cast to
    * DECIMAL(28,12) before the cumulative sum — exact partial-order-
    * proof summation, one exp at the end (identical inputs ⇒ identical
    * IEEE results, same precedent as the NLL queries). Terminal
    * all-events rows (d = n, S → 0) are excluded to keep ln finite —
    * the curve is reported up to the last partial-risk event time.
    */
  val qKaplanMeier: QueryDef = QueryDef.sql(
    "q_kaplan_meier",
    """WITH u AS (
      |  SELECT user_id, min(ts) AS start_ts,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS ev_ts
      |  FROM events GROUP BY user_id),
      |mx AS (SELECT max(ts) AS end_ts FROM events),
      |d AS (
      |  SELECT CASE WHEN ev_ts IS NOT NULL THEN 1 ELSE 0 END AS ev,
      |    CAST(floor((epoch_us(coalesce(ev_ts, end_ts))
      |      - epoch_us(start_ts)) / 3600000000.0) AS BIGINT) AS t
      |  FROM u, mx),
      |tot AS (SELECT count(*) AS n_users FROM d),
      |g AS (SELECT t, count(*) AS at_t, sum(ev) AS d_t FROM d GROUP BY t),
      |c AS (
      |  SELECT t, d_t, tot.n_users -
      |    coalesce(sum(at_t) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_t
      |  FROM g, tot),
      |s AS (
      |  SELECT t, d_t, n_t,
      |    CAST(sum(CAST(ln(1.0 - CAST(d_t AS DOUBLE) / n_t)
      |      AS DECIMAL(28,12))) OVER (ORDER BY t) AS DOUBLE) AS logs
      |  FROM c WHERE d_t > 0 AND d_t < n_t)
      |SELECT t, CAST(d_t AS BIGINT) AS d_t, CAST(n_t AS BIGINT) AS n_t,
      |  round(exp(logs), 6) AS survival
      |FROM s ORDER BY t""".stripMargin,
    doc = "Kaplan-Meier time-to-purchase with censoring (survival analysis)") { (s, dir) =>
    import graft.core.TimeCols.epochUs
    val ev = t(s, dir, "events")
    val u = ev.groupBy("user_id").agg(
      min(col("ts")).as("start_ts"),
      min(when(col("event_type") === "purchase", col("ts"))).as("ev_ts"))
    val mx = ev.agg(max(col("ts")).as("end_ts"))
    val d = u.crossJoin(broadcast(mx))
      .select(
        when(col("ev_ts").isNotNull, 1).otherwise(0).as("ev"),
        floor((epochUs(coalesce(col("ev_ts"), col("end_ts")))
          - epochUs(col("start_ts"))) / 3600000000.0).cast("long").as("t"))
    val tot = d.agg(count(lit(1)).as("n_users"))
    val g = d.groupBy("t").agg(count(lit(1)).as("at_t"),
      sum(col("ev")).as("d_t"))
    // risk-table windows run over the hour grid — bounded by calendar,
    // not by user count
    val cumW = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val c = g.crossJoin(broadcast(tot))
      .select(col("t"), col("d_t"),
        (col("n_users") -
          coalesce(sum(col("at_t")).over(cumW), lit(0L))).as("n_t"))
    val sW = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c.filter(col("d_t") > 0 && col("d_t") < col("n_t"))
      .withColumn("logs",
        sum(log(lit(1.0) - col("d_t").cast("double") / col("n_t"))
          .cast("decimal(28,12)")).over(sW).cast("double"))
      .select(col("t"), col("d_t").cast("long").as("d_t"),
        col("n_t").cast("long").as("n_t"),
        round(exp(col("logs")), 6).as("survival"))
      .orderBy("t")
  }

  /** Huber robust regression per event_type via IRLS (iteratively
    * reweighted least squares): ordinary OLS start, then three
    * reweighting rounds with the Huber ψ (weight 1 inside c, c/|r|
    * outside) — the between-world of q_trend_ols (efficient, outlier-
    * fragile) and q_theilsen (robust, pairwise-quadratic). Each round
    * is ONE broadcast join of the 5-row coefficient table onto the
    * fact scan plus ONE aggregation of decimal-cast weighted sums —
    * per-iteration cost is a constant number of scans at any data
    * size, no pair explosion. The oracle UNROLLS the identical three
    * rounds as generated CTE stages (same technique as q_kcore), so
    * both engines execute the same arithmetic step for step; weights
    * are doubles derived from identical inputs, every sum is
    * decimal-exact.
    */
  val qHuberTrend: QueryDef = {
    val iters = 3
    val c = 50.0 // Huber scale in value units (residual spread ~100)
    def sSql(i: Int, src: String, w: String): String =
      s"""s$i AS (
         |  SELECT event_type, count(*) AS n,
         |    CAST(sum(CAST($w AS DECIMAL(28,10))) AS DOUBLE) AS sw,
         |    CAST(sum(CAST($w * x AS DECIMAL(28,10))) AS DOUBLE) AS swx,
         |    CAST(sum(CAST($w * y AS DECIMAL(28,10))) AS DOUBLE) AS swy,
         |    CAST(sum(CAST($w * x * x AS DECIMAL(30,10))) AS DOUBLE) AS swxx,
         |    CAST(sum(CAST($w * x * y AS DECIMAL(30,10))) AS DOUBLE) AS swxy
         |  FROM $src GROUP BY event_type)""".stripMargin
    def fSql(i: Int): String =
      s"""f$i AS (
         |  SELECT event_type, n,
         |    (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS b,
         |    (swy - (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
         |      * swx) / sw AS a
         |  FROM s$i)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""h$i AS (
         |  SELECT h.event_type, h.x, h.y,
         |    CASE WHEN abs(h.y - (f.a + f.b * h.x)) <= $c THEN 1.0
         |         ELSE $c / abs(h.y - (f.a + f.b * h.x)) END AS w
         |  FROM h JOIN f${i - 1} f USING (event_type)),
         |${sSql(i, s"h$i", "w")},
         |${fSql(i)}""".stripMargin
    }.mkString(",\n")
    QueryDef.sql(
      "q_huber_trend",
      s"""WITH b0 AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
         |h AS (
         |  SELECT event_type,
         |    (epoch_us(ts) - t0) / 3600000000.0 AS x, value AS y
         |  FROM events, b0),
         |${sSql(0, "h", "1.0")},
         |${fSql(0)},
         |$rounds
         |SELECT event_type, n, round(a, 6) AS intercept,
         |  round(b * 24, 6) AS slope_per_day
         |FROM f$iters ORDER BY event_type""".stripMargin,
      doc = "Huber IRLS robust trend (3 reweighted rounds, generated unrolled oracle)") { (s, dir) =>
      import graft.core.TimeCols.epochUs
      val ev = t(s, dir, "events")
      val t0 = broadcast(ev.agg(min(epochUs(col("ts"))).as("t0")))
      val h = ev.crossJoin(t0)
        .select(col("event_type"),
          ((epochUs(col("ts")) - col("t0")) / 3600000000.0).as("x"),
          col("value").as("y"))
      def stats(src: DataFrame, w: Column): DataFrame =
        src.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum(w.cast("decimal(28,10)")).cast("double").as("sw"),
          sum((w * col("x")).cast("decimal(28,10)")).cast("double").as("swx"),
          sum((w * col("y")).cast("decimal(28,10)")).cast("double").as("swy"),
          sum((w * col("x") * col("x")).cast("decimal(30,10)"))
            .cast("double").as("swxx"),
          sum((w * col("x") * col("y")).cast("decimal(30,10)"))
            .cast("double").as("swxy"))
      def fit(st: DataFrame): DataFrame = {
        val b = (col("sw") * col("swxy") - col("swx") * col("swy")) /
          (col("sw") * col("swxx") - col("swx") * col("swx"))
        st.select(col("event_type"), col("n"), b.as("b"),
          ((col("swy") - b * col("swx")) / col("sw")).as("a"))
      }
      var f = fit(stats(h, lit(1.0)))
      (1 to iters).foreach { _ =>
        val joined = h.join(broadcast(f.select("event_type", "a", "b")),
          Seq("event_type"))
        val resid = abs(col("y") - (col("a") + col("b") * col("x")))
        val w = when(resid <= c, 1.0).otherwise(lit(c) / resid)
        f = fit(stats(joined.select(col("event_type"), col("x"), col("y"),
          w.as("w")), col("w")))
      }
      f.select(col("event_type"), col("n"), round(col("a"), 6).as("intercept"),
          round(col("b") * 24, 6).as("slope_per_day"))
        .orderBy("event_type")
    }
  }

  /** Mutual information between event_type and day-part, with the
    * marginal entropies — the information-theoretic twin of
    * q_chi2_independence (chi2 asks "is there dependence", MI asks
    * "how many nats does knowing one buy about the other").
    * Contingency and marginals are the same tiny aggregations; every
    * log term is a double from identical integer inputs, cast to
    * DECIMAL(28,12) before the cell sum so aggregation order cannot
    * perturb it (the ln precedent of the NLL queries).
    */
  val qMutualInfo: QueryDef = QueryDef.sql(
    "q_mutual_info",
    """WITH o AS (
      |  SELECT event_type,
      |    CASE WHEN extract(hour FROM ts) < 12 THEN 'am' ELSE 'pm' END
      |      AS daypart,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM o),
      |rm AS (SELECT event_type, CAST(sum(n) AS DOUBLE) AS rn
      |       FROM o GROUP BY 1),
      |cm AS (SELECT daypart, CAST(sum(n) AS DOUBLE) AS cn
      |       FROM o GROUP BY 1),
      |mi AS (
      |  SELECT CAST(sum(CAST((o.n / tot.nn) *
      |      ln(o.n * tot.nn / (rm.rn * cm.cn)) AS DECIMAL(28,12)))
      |    AS DOUBLE) AS mi_nats
      |  FROM o JOIN rm ON o.event_type = rm.event_type
      |         JOIN cm ON o.daypart = cm.daypart
      |         CROSS JOIN tot),
      |ht AS (
      |  SELECT CAST(sum(CAST(-(rn / tot.nn) * ln(rn / tot.nn)
      |      AS DECIMAL(28,12))) AS DOUBLE) AS h_type
      |  FROM rm CROSS JOIN tot),
      |hd AS (
      |  SELECT CAST(sum(CAST(-(cn / tot.nn) * ln(cn / tot.nn)
      |      AS DECIMAL(28,12))) AS DOUBLE) AS h_daypart
      |  FROM cm CROSS JOIN tot)
      |SELECT round(mi.mi_nats, 6) AS mi_nats,
      |  round(ht.h_type, 6) AS h_type,
      |  round(hd.h_daypart, 6) AS h_daypart
      |FROM mi CROSS JOIN ht CROSS JOIN hd""".stripMargin,
    doc = "mutual information + marginal entropies, type x day-part (information theory)") { (s, dir) =>
    val o = t(s, dir, "events")
      .select(col("event_type"),
        when(hour(col("ts")) < 12, "am").otherwise("pm").as("daypart"))
      .groupBy("event_type", "daypart").agg(count(lit(1)).as("n"))
    val tot = o.agg(sum("n").cast("double").as("nn"))
    val rm = o.groupBy("event_type").agg(sum("n").cast("double").as("rn"))
    val cm = o.groupBy("daypart").agg(sum("n").cast("double").as("cn"))
    val mi = o.join(broadcast(rm), "event_type")
      .join(broadcast(cm), "daypart").crossJoin(broadcast(tot))
      .agg(sum(((col("n") / col("nn")) *
        log(col("n") * col("nn") / (col("rn") * col("cn"))))
        .cast("decimal(28,12)")).cast("double").as("mi_nats"))
    val ht = rm.crossJoin(broadcast(tot))
      .agg(sum((-(col("rn") / col("nn")) * log(col("rn") / col("nn")))
        .cast("decimal(28,12)")).cast("double").as("h_type"))
    val hd = cm.crossJoin(broadcast(tot))
      .agg(sum((-(col("cn") / col("nn")) * log(col("cn") / col("nn")))
        .cast("decimal(28,12)")).cast("double").as("h_daypart"))
    mi.crossJoin(broadcast(ht)).crossJoin(broadcast(hd))
      .select(round(col("mi_nats"), 6).as("mi_nats"),
        round(col("h_type"), 6).as("h_type"),
        round(col("h_daypart"), 6).as("h_daypart"))
  }

  /** One-way ANOVA per event_type: does hour-of-day explain the
    * values? Two-level sufficient statistics — (type, hour) cells
    * carry decimal-exact (n, Σy, Σy²); the 24-cell rollup casts each
    * double term (Σy²ₕ/nₕ) back to decimal before summing so the
    * between/within split is aggregation-order-proof; F and η² are
    * then identical double trees. The generalization of q_ttest_welch
    * from 2 cohorts to g groups, and the variance-decomposition view
    * of what q_anomalies_seasonal models.
    */
  val qAnova: QueryDef = QueryDef.sql(
    "q_anova",
    """WITH cell AS (
      |  SELECT event_type, extract(hour FROM ts) AS h, count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE)
      |      AS syy
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT event_type, count(*) AS ng,
      |    CAST(sum(n) AS BIGINT) AS n,
      |    CAST(sum(CAST(sy AS DECIMAL(28,8))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(syy AS DECIMAL(28,8))) AS DOUBLE) AS syy,
      |    CAST(sum(CAST(sy * sy / n AS DECIMAL(28,8))) AS DOUBLE)
      |      AS sgm
      |  FROM cell GROUP BY event_type)
      |SELECT event_type, n, ng,
      |  round((sgm - sy * sy / n) / (ng - 1) /
      |    ((syy - sgm) / (n - ng)), 6) AS f_stat,
      |  round((sgm - sy * sy / n) / (syy - sy * sy / n), 6) AS eta_sq
      |FROM g ORDER BY event_type""".stripMargin,
    doc = "one-way ANOVA: hour-of-day effect on value per type (F statistic, eta-squared)") { (s, dir) =>
    val cell = t(s, dir, "events")
      .groupBy(col("event_type"), hour(col("ts")).as("h"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(20,4)")).cast("double").as("sy"),
        sum((col("value") * col("value")).cast("decimal(30,8)"))
          .cast("double").as("syy"))
    val g = cell.groupBy("event_type").agg(
      count(lit(1)).as("ng"),
      sum(col("n")).cast("long").as("n"),
      sum(col("sy").cast("decimal(28,8)")).cast("double").as("sy"),
      sum(col("syy").cast("decimal(28,8)")).cast("double").as("syy"),
      sum((col("sy") * col("sy") / col("n")).cast("decimal(28,8)"))
        .cast("double").as("sgm"))
    g.select(col("event_type"), col("n"), col("ng"),
        round((col("sgm") - col("sy") * col("sy") / col("n"))
          / (col("ng") - 1)
          / ((col("syy") - col("sgm")) / (col("n") - col("ng"))), 6)
          .as("f_stat"),
        round((col("sgm") - col("sy") * col("sy") / col("n"))
          / (col("syy") - col("sy") * col("sy") / col("n")), 6)
          .as("eta_sq"))
      .orderBy("event_type")
  }

  /** Exact two-sample Kolmogorov-Smirnov: D = max |F_click − F_purchase|
    * over the pooled distinct values — the distribution-level
    * comparison Mann-Whitney's rank sum blurs. Reuses the
    * deterministic bucket prefix-sum (floor(v) buckets, in-bucket
    * keyed windows, broadcast offsets) to build BOTH empirical CDFs
    * without a global window; D and its argmax location are
    * integer-ratio doubles, tie-broken on the smallest attaining
    * value.
    */
  val qKsTest: QueryDef = QueryDef.sql(
    "q_ks_test",
    """WITH g AS (
      |  SELECT value AS v,
      |    count(CASE WHEN event_type = 'click' THEN 1 END) AS na,
      |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS nb
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY value),
      |c AS (
      |  SELECT v, sum(na) OVER (ORDER BY v) AS ca,
      |    sum(nb) OVER (ORDER BY v) AS cb
      |  FROM g),
      |tot AS (
      |  SELECT CAST(sum(na) AS DOUBLE) AS n1, CAST(sum(nb) AS DOUBLE)
      |    AS n2 FROM g),
      |d AS (
      |  SELECT v, abs(ca / n1 - cb / n2) AS dv FROM c CROSS JOIN tot),
      |mx AS (SELECT max(dv) AS dmax FROM d)
      |SELECT round(mx.dmax, 6) AS ks_d,
      |  CAST(min(d.v) AS DOUBLE) AS at_value,
      |  CAST(tot.n1 AS BIGINT) AS n1, CAST(tot.n2 AS BIGINT) AS n2
      |FROM d CROSS JOIN mx CROSS JOIN tot
      |WHERE d.dv = mx.dmax
      |GROUP BY mx.dmax, tot.n1, tot.n2""".stripMargin,
    doc = "exact two-sample KS statistic via distributed CDFs (distribution drift)") { (s, dir) =>
    val g = t(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("value").as("v"))
      .agg(count(when(col("event_type") === "click", 1)).as("na"),
        count(when(col("event_type") === "purchase", 1)).as("nb"))
    val bucketed = g.withColumn("__b", floor(col("v")).cast("long"))
    val localW = Window.partitionBy(col("__b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = bucketed
      .withColumn("__la", sum(col("na")).over(localW))
      .withColumn("__lb", sum(col("nb")).over(localW))
    val offW = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ptot = bucketed.groupBy(col("__b"))
      .agg(sum(col("na")).as("__pa"), sum(col("nb")).as("__pb"))
      .withColumn("__oa", coalesce(sum(col("__pa")).over(offW), lit(0L)))
      .withColumn("__ob", coalesce(sum(col("__pb")).over(offW), lit(0L)))
      .select(col("__b"), col("__oa"), col("__ob"))
    val tot = g.agg(sum(col("na")).cast("double").as("n1"),
      sum(col("nb")).cast("double").as("n2"))
    val d = withLocal.join(broadcast(ptot), Seq("__b"))
      .crossJoin(broadcast(tot))
      .select(col("v"), col("n1"), col("n2"),
        abs((col("__la") + col("__oa")) / col("n1")
          - (col("__lb") + col("__ob")) / col("n2")).as("dv"))
    val mx = d.agg(max(col("dv")).as("dmax"))
    d.crossJoin(broadcast(mx))
      .filter(col("dv") === col("dmax"))
      .groupBy(col("dmax"), col("n1"), col("n2"))
      .agg(min(col("v")).cast("double").as("at_value"))
      .select(round(col("dmax"), 6).as("ks_d"), col("at_value"),
        col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"))
  }

  /** Population Stability Index between weekday and weekend values:
    * the drift score model monitors report. Bins are the pooled
    * deciles (9 interpolated cut points, one tiny aggregate broadcast
    * back — the same threshold-quintile shape as q_rfm); cohort
    * masses are Laplace-smoothed ((c + 0.5)/(n + 5)) so an empty bin
    * cannot blow up the log, and each bin's (p−q)·ln(p/q) term is
    * decimal-cast before the sum.
    */
  val qPsi: QueryDef = QueryDef.sql(
    "q_psi",
    """WITH cut AS (
      |  SELECT quantile_cont(value, 0.1) AS t1, quantile_cont(value, 0.2) AS t2,
      |    quantile_cont(value, 0.3) AS t3, quantile_cont(value, 0.4) AS t4,
      |    quantile_cont(value, 0.5) AS t5, quantile_cont(value, 0.6) AS t6,
      |    quantile_cont(value, 0.7) AS t7, quantile_cont(value, 0.8) AS t8,
      |    quantile_cont(value, 0.9) AS t9
      |  FROM events),
      |b AS (
      |  SELECT (value > t1)::INT + (value > t2)::INT + (value > t3)::INT
      |    + (value > t4)::INT + (value > t5)::INT + (value > t6)::INT
      |    + (value > t7)::INT + (value > t8)::INT + (value > t9)::INT
      |      AS bin,
      |    CASE WHEN extract(dow FROM ts) IN (0, 6) THEN 1 ELSE 0 END
      |      AS we
      |  FROM events, cut),
      |c AS (
      |  SELECT bin, count(CASE WHEN we = 1 THEN 1 END) AS cwe,
      |    count(CASE WHEN we = 0 THEN 1 END) AS cwd
      |  FROM b GROUP BY bin),
      |tot AS (
      |  SELECT CAST(sum(cwe) AS DOUBLE) AS nwe,
      |    CAST(sum(cwd) AS DOUBLE) AS nwd FROM c),
      |terms AS (
      |  SELECT ((cwe + 0.5) / (nwe + 5) - (cwd + 0.5) / (nwd + 5)) *
      |    ln(((cwe + 0.5) / (nwe + 5)) / ((cwd + 0.5) / (nwd + 5)))
      |      AS term
      |  FROM c CROSS JOIN tot)
      |SELECT round(CAST(sum(CAST(term AS DECIMAL(28,12))) AS DOUBLE), 6)
      |  AS psi, count(*) AS n_bins
      |FROM terms""".stripMargin,
    doc = "Population Stability Index weekday vs weekend (drift monitoring)") { (s, dir) =>
    val ev = t(s, dir, "events")
    val cuts = (1 to 9).map(i => expr(s"percentile(value, 0.$i)").as(s"t$i"))
    val cut = ev.agg(cuts.head, cuts.tail: _*)
    val binCol = (1 to 9).map(i =>
      when(col("value") > col(s"t$i"), 1).otherwise(0)).reduce(_ + _)
    val b = ev.crossJoin(broadcast(cut))
      .select(binCol.as("bin"),
        when(dayofweek(col("ts")).isin(1, 7), 1).otherwise(0).as("we"))
    val c = b.groupBy("bin").agg(
      count(when(col("we") === 1, 1)).as("cwe"),
      count(when(col("we") === 0, 1)).as("cwd"))
    val tot = c.agg(sum(col("cwe")).cast("double").as("nwe"),
      sum(col("cwd")).cast("double").as("nwd"))
    val p = (col("cwe") + 0.5) / (col("nwe") + 5)
    val q = (col("cwd") + 0.5) / (col("nwd") + 5)
    c.crossJoin(broadcast(tot))
      .select(((p - q) * log(p / q)).as("term"))
      .agg(round(sum(col("term").cast("decimal(28,12)")).cast("double"), 6)
        .as("psi"), count(lit(1)).as("n_bins"))
  }

  val all: Seq[QueryDef] = Seq(
    qChi2Independence, qTtestWelch, qWeightedMedian, qTheilSen,
    qWinsorize, qMannWhitney, qKaplanMeier, qHuberTrend, qMutualInfo,
    qAnova, qKsTest, qPsi)
}
