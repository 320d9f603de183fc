package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.core.TimeCols.epochUs
import RelationalQueries.{dsum, dsumSql, dsum9, dsum9Sql}

/** Time-series coverage over the `events` table — the domain the
  * reference's data model serves (long-format timestamped readings,
  * SURVEY §1.1) plus the windowing surface its empty analytics package
  * implies (SURVEY §2.5, §2.10).
  *
  * Timestamp outputs are formatted to strings in both engines: Spark
  * emits UTC-adjusted parquet timestamps while DuckDB emits naive
  * ones, so raw timestamp columns would hash-differ spuriously.
  */
object EventQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Tumbling event-time window via Spark's `window()` — the same
    * operator Structured Streaming uses, so this plan is the batch
    * twin of the streaming ingest path (SURVEY §2.10). Oracle uses
    * date_trunc (aligned 1-hour tumble ≡ hour truncation).
    */
  val qTimeWindow: QueryDef = QueryDef.sql(
    "q_time_window",
    s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       |  count(*) AS n_events,
       |  ${dsumSql("value")} AS sum_value
       |FROM events WHERE event_type = 'purchase'
       |GROUP BY 1 ORDER BY 1""".stripMargin,
    doc = "tumbling event-time window agg (SURVEY §2.10)") { (s, dir) =>
    t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("n_events"), col("sum_value"))
      .orderBy("hour_start")
  }

  /** W1-shape: ordered lag within a partition (reference monotonicity
    * check, `schema_analyzer.py:88`) — per-user inter-event gaps in
    * microseconds. Epoch-µs longs sum exactly, so avg = exact-long /
    * count is the same double in both engines.
    */
  val qLagGaps: QueryDef = QueryDef.sql(
    "q_lag_gaps",
    """SELECT user_id, count(*) AS n_gaps,
      |  CAST(sum(gap_us) AS DOUBLE) / count(*) AS avg_gap_us
      |FROM (
      |  SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events)
      |WHERE gap_us IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin,
    doc = "per-entity ordered lag gaps (SURVEY W1)") { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("gap_us",
        epochUs(col("ts")) - lag(epochUs(col("ts")), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        (sum(col("gap_us")).cast("double") / count(lit(1))).as("avg_gap_us"))
      .orderBy("user_id")
  }

  /** J1: the reference's flagship overlap semi-join
    * (`data_loader.py:377-429`): per-user purchase time-bounds widened
    * ±1 hour, then EXISTS against the events table on user + range.
    * Spark plans the equi key (user_id) as the hash join; the range is
    * the post-join filter — same shape Postgres picked for the
    * reference. Bounds side is aggregate-sized → broadcast.
    */
  val qOverlapSemi: QueryDef = QueryDef.sql(
    "q_overlap_semi",
    """SELECT e.event_id, e.user_id, e.event_type FROM events e
      |WHERE EXISTS (
      |  SELECT 1 FROM (
      |    SELECT user_id, min(ts) AS lo, max(ts) AS hi FROM events
      |    WHERE event_type = 'purchase' GROUP BY user_id) b
      |  WHERE b.user_id = e.user_id
      |    AND e.ts BETWEEN b.lo - INTERVAL 1 HOUR AND b.hi + INTERVAL 1 HOUR)
      |  AND e.event_type = 'error'
      |ORDER BY e.event_id""".stripMargin,
    doc = "time-range + entity overlap semi-join (SURVEY J1)") { (s, dir) =>
    val e = t(s, dir, "events")
    val bounds = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("b_user"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
    e.filter(col("event_type") === "error")
      .join(broadcast(bounds),
        col("user_id") === col("b_user") &&
          col("ts") >= col("lo") - expr("INTERVAL 1 HOUR") &&
          col("ts") <= col("hi") + expr("INTERVAL 1 HOUR"),
        "left_semi")
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")
  }

  /** Scalar-function sweep (SURVEY §2.8): string, date, math,
    * conditional, and JSON extraction in one projection. JSON comes
    * out via get_json_object (Spark) / regexp (oracle) to keep the
    * oracle extension-free; props shape is {"k": <int>}.
    */
  val qScalarFuncs: QueryDef = QueryDef.sql(
    "q_scalar_funcs",
    """SELECT event_id,
      |  upper(event_type) AS type_upper,
      |  length(event_type) AS type_len,
      |  substr(event_type, 1, 3) AS type_pfx,
      |  concat(event_type, '#', CAST(user_id AS VARCHAR)) AS type_user,
      |  strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |  CAST(round(value * 1.1, 2) AS DOUBLE) AS value_up,
      |  CAST(greatest(value, 50.0) AS DOUBLE) AS value_floor50,
      |  CASE WHEN value > 50.0 THEN 'high' ELSE 'low' END AS band,
      |  CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS prop_k
      |FROM events
      |WHERE event_type LIKE 's%' AND event_id <= 500
      |ORDER BY event_id""".stripMargin,
    doc = "scalar function sweep: string/date/math/cond/json (SURVEY §2.8)") { (s, dir) =>
    t(s, dir, "events")
      .filter(col("event_type").like("s%") && col("event_id") <= 500)
      .select(
        col("event_id"),
        upper(col("event_type")).as("type_upper"),
        length(col("event_type")).as("type_len"),
        substring(col("event_type"), 1, 3).as("type_pfx"),
        concat(col("event_type"), lit("#"), col("user_id").cast("string"))
          .as("type_user"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        round(col("value") * 1.1, 2).cast("double").as("value_up"),
        greatest(col("value"), lit(50.0)).cast("double").as("value_floor50"),
        when(col("value") > 50.0, "high").otherwise("low").as("band"),
        get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
      .orderBy("event_id")
  }

  /** to_json(struct(...)) — reference `json_build_object(...)::text`
    * (`data_loader.py:400-425`): pack per-type stats into a JSON
    * payload string. Oracle builds the same string by hand (DuckDB's
    * json extension may not be loadable offline; concat is exact).
    */
  val qJsonBuild: QueryDef = QueryDef.sql(
    "q_json_build",
    """SELECT event_type,
      |  concat('{"event_type":"', event_type, '","n":', CAST(count(*) AS VARCHAR), '}') AS payload
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    doc = "JSON payload construction (SURVEY §2.8 json)") { (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        to_json(struct(col("event_type"), col("n"))).as("payload"))
      .orderBy("event_type")
  }

  /** Sessionization via gap-based session ids (beyond-reference
    * streaming-adjacent surface): a new session starts after a >30min
    * gap; count sessions per user. One window shuffle on user_id.
    */
  val qSessionize: QueryDef = QueryDef.sql(
    "q_sessionize",
    """SELECT user_id, count(DISTINCT session_id) AS n_sessions
      |FROM (
      |  SELECT user_id,
      |    sum(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |    FROM events))
      |GROUP BY user_id ORDER BY user_id""".stripMargin,
    doc = "gap-based sessionization (streaming-adjacent)") { (s, dir) =>
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_us", lag(epochUs(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          epochUs(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"))
      // session_id is a running sum of 0/1 starting at 1 (first row per
      // user always opens a session), so it is dense and monotone:
      // max ≡ count(DISTINCT). max skips the distinct Expand pass —
      // 0.37 → 0.25 s at sf0.1 — and shrinks the shuffle at scale; the
      // oracle keeps COUNT(DISTINCT …), proving the equivalence per row.
      .agg(max(col("session_id")).as("n_sessions"))
      .orderBy("user_id")
  }

  /** Map functions (§2.8, beyond the reference's data path): build a
    * per-user event_type→count map (map_from_entries over the grouped
    * counts), then element_at lookups and sorted map_keys. The oracle
    * states the same values map-free (conditional aggs + sorted
    * distinct list) — the map is the Spark-side operator under test,
    * not the comparison medium. Keys are emitted comma-joined as a
    * string: the driver's pandas-based compare cannot sort/hash
    * array-typed cells (r2 failure: "unhashable type: numpy.ndarray").
    */
  val qMapFuncs: QueryDef = QueryDef.sql(
    "q_map_funcs",
    """SELECT user_id,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
      |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
      |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
      |FROM events WHERE user_id <= 10
      |GROUP BY user_id ORDER BY user_id""".stripMargin,
    doc = "map build/lookup/keys (SURVEY §2.8 map)") { (s, dir) =>
    t(s, dir, "events")
      .filter(col("user_id") <= 10)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("n"))))
        .as("m"))
      .select(col("user_id"),
        // try_element_at: under ANSI a missing map key THROWS from
        // plain element_at (the coalesce never sees a null) — a user
        // with no purchases must count 0, not kill the job
        coalesce(try_element_at(col("m"), lit("purchase")), lit(0L))
          .as("n_purchase"),
        coalesce(try_element_at(col("m"), lit("click")), lit(0L))
          .as("n_click"),
        array_join(sort_array(map_keys(col("m"))), ",").as("types"))
      .orderBy("user_id")
  }

  /** Backward as-of join: every click matched to the user's most
    * recent prior view ([[graft.transform.TemporalJoins]] union +
    * single-window shape — one shuffle, no per-key explosion). The
    * oracle states the SEMANTICS as the naive theta-join + rank-1 pick
    * (fine at oracle scale, quadratic at ours) with the identical
    * (vts DESC, view_id DESC) tiebreak; `age_us` is the matched
    * timestamp expressed shift-invariantly (raw timestamps would
    * hash-differ between engines, see object doc).
    */
  val qAsofJoin: QueryDef = QueryDef.sql(
    "q_asof_join",
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |views AS (
      |  SELECT event_id AS view_id, user_id, ts AS vts, value AS view_value
      |  FROM events WHERE event_type = 'view'),
      |j AS (
      |  SELECT c.event_id, c.user_id, v.view_id, v.view_value,
      |    epoch_us(c.ts) - epoch_us(v.vts) AS age_us,
      |    row_number() OVER (PARTITION BY c.event_id
      |      ORDER BY v.vts DESC, v.view_id DESC) AS rn
      |  FROM clicks c LEFT JOIN views v
      |    ON v.user_id = c.user_id AND v.vts <= c.ts)
      |SELECT event_id, user_id, view_id, view_value, age_us
      |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,
    doc = "backward as-of join clicks->latest prior view (temporal join)") { (s, dir) =>
    import graft.transform.TemporalJoins
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("vts"), col("value").as("view_value"))
    TemporalJoins.asofJoinBackward(clicks, views, Seq("user_id"),
        "ts", "vts", payload = Seq("view_id", "view_value"),
        tiebreakCols = Seq("view_id"))
      .select(col("event_id"), col("user_id"),
        col("asof_view_id").as("view_id"), col("asof_view_value").as("view_value"),
        (epochUs(col("ts")) - epochUs(col("asof_vts"))).as("age_us"))
      .orderBy("event_id")
  }

  /** Backward as-of join WITH tolerance: same latest-prior-view match,
    * but a match older than 1 h nulls out (merge_asof `tolerance`
    * semantics). Oracle note: filtering the join to within-tolerance
    * rows IS the tolerance rule for backward as-of — the latest prior
    * row has the smallest age, so "latest prior, nulled if too old"
    * and "latest among the within-tolerance priors" pick identically.
    */
  val qAsofTolerance: QueryDef = QueryDef.sql(
    "q_asof_tolerance",
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |views AS (
      |  SELECT event_id AS view_id, user_id, ts AS vts, value AS view_value
      |  FROM events WHERE event_type = 'view'),
      |j AS (
      |  SELECT c.event_id, c.user_id, v.view_id, v.view_value,
      |    epoch_us(c.ts) - epoch_us(v.vts) AS age_us,
      |    row_number() OVER (PARTITION BY c.event_id
      |      ORDER BY v.vts DESC, v.view_id DESC) AS rn
      |  FROM clicks c LEFT JOIN views v
      |    ON v.user_id = c.user_id AND v.vts <= c.ts
      |      AND epoch_us(c.ts) - epoch_us(v.vts) <= 3600000000)
      |SELECT event_id, user_id, view_id, view_value, age_us
      |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,
    doc = "backward as-of join with 1h tolerance (temporal join)") { (s, dir) =>
    import graft.transform.TemporalJoins
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("vts"), col("value").as("view_value"))
    TemporalJoins.asofJoinBackward(clicks, views, Seq("user_id"),
        "ts", "vts", payload = Seq("view_id", "view_value"),
        tiebreakCols = Seq("view_id"),
        toleranceMicros = Some(3600000000L))
      .select(col("event_id"), col("user_id"),
        col("asof_view_id").as("view_id"), col("asof_view_value").as("view_value"),
        (epochUs(col("ts")) - epochUs(col("asof_vts"))).as("age_us"))
      .orderBy("event_id")
  }

  /** Forward as-of join: every click matched to the user's EARLIEST
    * LATER view (merge_asof `direction='forward'`) — the remaining
    * direction after [[qAsofJoin]] (backward) and [[qAsofNearest]].
    * Min view_id wins among equal-timestamp candidates.
    */
  val qAsofForward: QueryDef = QueryDef.sql(
    "q_asof_forward",
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |views AS (
      |  SELECT event_id AS view_id, user_id, ts AS vts, value AS view_value
      |  FROM events WHERE event_type = 'view'),
      |j AS (
      |  SELECT c.event_id, c.user_id, v.view_id, v.view_value,
      |    epoch_us(v.vts) - epoch_us(c.ts) AS age_us,
      |    row_number() OVER (PARTITION BY c.event_id
      |      ORDER BY v.vts ASC, v.view_id ASC) AS rn
      |  FROM clicks c LEFT JOIN views v
      |    ON v.user_id = c.user_id AND v.vts >= c.ts)
      |SELECT event_id, user_id, view_id, view_value, age_us
      |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,
    doc = "forward as-of join clicks->earliest later view (temporal join)") { (s, dir) =>
    import graft.transform.TemporalJoins
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("vts"), col("value").as("view_value"))
    TemporalJoins.asofJoinForward(clicks, views, Seq("user_id"),
        "ts", "vts", payload = Seq("view_id", "view_value"),
        tiebreakCols = Seq("view_id"))
      .select(col("event_id"), col("user_id"),
        col("asof_view_id").as("view_id"), col("asof_view_value").as("view_value"),
        (epochUs(col("asof_vts")) - epochUs(col("ts"))).as("age_us"))
      .orderBy("event_id")
  }

  /** Nearest as-of join: every click matched to the user's CLOSEST
    * view in either time direction
    * ([[graft.transform.TemporalJoins.asofJoinNearest]] — same single
    * union shuffle as backward, two sorts). Tie contract stated
    * explicitly in the oracle's ORDER BY: absolute distance, then
    * backward-before-forward, then max view_id backward / min view_id
    * forward. `age_us` is signed (positive = matched a prior view).
    */
  val qAsofNearest: QueryDef = QueryDef.sql(
    "q_asof_nearest",
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |views AS (
      |  SELECT event_id AS view_id, user_id, ts AS vts, value AS view_value
      |  FROM events WHERE event_type = 'view'),
      |j AS (
      |  SELECT c.event_id, c.user_id, v.view_id, v.view_value,
      |    epoch_us(c.ts) - epoch_us(v.vts) AS age_us,
      |    row_number() OVER (PARTITION BY c.event_id
      |      ORDER BY abs(epoch_us(c.ts) - epoch_us(v.vts)) ASC,
      |        CASE WHEN v.vts <= c.ts THEN 0 ELSE 1 END ASC,
      |        CASE WHEN v.vts <= c.ts THEN -v.view_id ELSE v.view_id END ASC) AS rn
      |  FROM clicks c LEFT JOIN views v ON v.user_id = c.user_id)
      |SELECT event_id, user_id, view_id, view_value, age_us
      |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,
    doc = "nearest as-of join clicks->closest view either direction (temporal join)") { (s, dir) =>
    import graft.transform.TemporalJoins
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("vts"), col("value").as("view_value"))
    TemporalJoins.asofJoinNearest(clicks, views, Seq("user_id"),
        "ts", "vts", payload = Seq("view_id", "view_value"),
        tiebreakCols = Seq("view_id"))
      .select(col("event_id"), col("user_id"),
        col("asof_view_id").as("view_id"), col("asof_view_value").as("view_value"),
        (epochUs(col("ts")) - epochUs(col("asof_vts"))).as("age_us"))
      .orderBy("event_id")
  }

  /** Point-in-interval range join: every event falling inside any of
    * the in-plan 10-minute intervals (every 199th event opens one).
    * [[graft.transform.TemporalJoins.rangeJoinBinned]] bin-granular
    * equi-join — the oracle is the naive BETWEEN theta-join, which at
    * 100 TB would be a cross product; binning makes it an equi-join
    * with each pair produced exactly once.
    */
  val qRangeJoin: QueryDef = QueryDef.sql(
    "q_range_join",
    """WITH iv AS (
      |  SELECT event_id AS iv_id, ts AS ivs, ts + INTERVAL 10 MINUTE AS ive
      |  FROM events WHERE event_id % 199 = 0)
      |SELECT iv_id, p.event_id,
      |  epoch_us(p.ts) - epoch_us(ivs) AS offset_us
      |FROM events p JOIN iv ON p.ts >= ivs AND p.ts <= ive
      |ORDER BY iv_id, event_id""".stripMargin,
    doc = "point-in-interval range join via bin-granular equi-join (temporal join)") { (s, dir) =>
    import graft.transform.TemporalJoins
    val ev = t(s, dir, "events")
    val iv = ev.filter(col("event_id") % 199 === 0)
      .select(col("event_id").as("iv_id"), col("ts").as("ivs"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("ive"))
    TemporalJoins.rangeJoinBinned(ev.select(col("event_id"), col("ts")),
        "ts", iv, "ivs", "ive", binMicros = 10L * 60L * 1000000L)
      .select(col("iv_id"), col("event_id"),
        (epochUs(col("ts")) - epochUs(col("ivs"))).as("offset_us"))
      .orderBy("iv_id", "event_id")
  }

  /** Ordered funnel: view → first later click → first later purchase
    * per user, reported as per-stage user counts. Three keyed
    * aggregations + two broadcast-size joins (one row per user after
    * stage 1) — no window over the raw stream, so the 100 TB shape is
    * three shuffles on user_id and nothing quadratic.
    */
  val qFunnel: QueryDef = QueryDef.sql(
    "q_funnel",
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      |  WHERE e.event_type = 'click' GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      |  WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT (SELECT count(*) FROM v) AS n_view,
      |       (SELECT count(*) FROM c) AS n_view_click,
      |       (SELECT count(*) FROM p) AS n_view_click_purchase""".stripMargin,
    doc = "ordered 3-stage funnel with strictly-later stage times (event analytics)") { (s, dir) =>
    val ev = t(s, dir, "events")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val c = ev.filter(col("event_type") === "click").as("e")
      .join(v.as("v"), col("e.user_id") === col("v.user_id") &&
        col("e.ts") > col("v.t1"))
      .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase").as("e")
      .join(c.as("c"), col("e.user_id") === col("c.user_id") &&
        col("e.ts") > col("c.t2"))
      .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t3"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
  }

  /** Cohort retention: users grouped by first-seen day, distinct
    * active users per (cohort, day-offset) for the first week. Two
    * shuffles (first-seen agg on user, distinct+count on cohort/offset)
    * with the cohort map joined back user-keyed.
    */
  val qRetention: QueryDef = QueryDef.sql(
    "q_retention",
    """WITH f AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort
      |  FROM events GROUP BY 1),
      |a AS (
      |  SELECT DISTINCT e.user_id, f.cohort,
      |    datediff('day', f.cohort, CAST(e.ts AS DATE)) AS day_offset
      |  FROM events e JOIN f ON e.user_id = f.user_id)
      |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day, day_offset,
      |  count(*) AS n_users
      |FROM a WHERE day_offset BETWEEN 0 AND 7
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    doc = "cohort retention triangle over first-seen day (event analytics)") { (s, dir) =>
    val ev = t(s, dir, "events")
    val f = ev.groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("cohort"))
    ev.join(f, "user_id")
      .select(col("user_id"), col("cohort"),
        datediff(col("ts").cast("date"), col("cohort")).cast("long")
          .as("day_offset"))
      .distinct()
      .filter(col("day_offset").between(0, 7))
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Forward-fill (LOCF) gap repair + nth_value: click rows' values
    * are masked to NULL in-plan, then each row carries the user's last
    * non-null observation forward (`last_value IGNORE NULLS` over a
    * running frame) — the canonical sensor-gap-fill operator. One
    * window shuffle on user_id serves both functions; the mask makes
    * real NULL runs for the fill to bridge regardless of corpus.
    */
  val qGapFill: QueryDef = QueryDef.sql(
    "q_gap_fill",
    """SELECT event_id, user_id,
      |  last_value(CASE WHEN event_type = 'click' THEN NULL ELSE value END
      |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
      |  nth_value(event_id, 2) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS second_event
      |FROM events WHERE user_id <= 20
      |ORDER BY user_id, event_id""".stripMargin,
    doc = "LOCF forward fill (IGNORE NULLS) + nth_value navigation") { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .filter(col("user_id") <= 20)
      .select(col("event_id"), col("user_id"),
        last(when(col("event_type") === "click", lit(null))
          .otherwise(col("value")), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("filled"),
        nth_value(col("event_id"), 2).over(w).as("second_event"))
      .orderBy("user_id", "event_id")
  }

  /** Linear gap interpolation ([[graft.transform.Transforms
    * .interpolateLinear]]): click rows' values masked to NULL in-plan,
    * then repaired on the time-weighted line between each user's
    * bracketing readings (leading gaps backfill, trailing carry
    * forward). The oracle states the identical four-navigation window
    * algebra with the same operand order, so the IEEE multiply-add
    * reproduces bit-for-bit.
    */
  val qInterpolate: QueryDef = QueryDef.sql(
    "q_interpolate",
    """WITH m AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS tu,
      |    CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
      |  FROM events WHERE user_id <= 10),
      |nav AS (
      |  SELECT event_id, user_id, tu, v,
      |    last_value(v IGNORE NULLS) OVER wp AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN tu END IGNORE NULLS)
      |      OVER wp AS pt,
      |    first_value(v IGNORE NULLS) OVER wn AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN tu END IGNORE NULLS)
      |      OVER wn AS nt
      |  FROM m
      |  WINDOW wp AS (PARTITION BY user_id ORDER BY tu, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wn AS (PARTITION BY user_id ORDER BY tu, event_id
      |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_id, user_id,
      |  CAST(round(CASE WHEN v IS NOT NULL THEN v
      |    WHEN pv IS NULL THEN nv
      |    WHEN nv IS NULL THEN pv
      |    ELSE pv + (nv - pv) * (CAST(tu - pt AS DOUBLE)
      |      / CAST(nt - pt AS DOUBLE)) END, 6) AS DOUBLE) AS v_interp
      |FROM nav ORDER BY user_id, event_id""".stripMargin,
    doc = "linear interpolation of masked gaps (sensor repair beyond LOCF)") { (s, dir) =>
    import graft.transform.Transforms
    val masked = t(s, dir, "events")
      .filter(col("user_id") <= 10)
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "click", lit(null))
          .otherwise(col("value")).as("v"))
    Transforms.interpolateLinear(masked, "user_id", "ts", "v",
        tieBreak = Seq("event_id"))
      .select(col("event_id"), col("user_id"),
        round(col("v_interp"), 6).cast("double").as("v_interp"))
      .orderBy("user_id", "event_id")
  }

  /** Hour-of-day load profile — the energy-domain daily-shape query
    * (reference domain: building meters): per event type, activity and
    * volume by hour. One shuffle on a 24×|types| key space.
    */
  val qLoadProfile: QueryDef = QueryDef.sql(
    "q_load_profile",
    s"""SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS hour,
      |  count(*) AS n,
      |  ${RelationalQueries.dsumSql("value")} AS total
      |FROM events
      |GROUP BY event_type, hour
      |ORDER BY event_type, hour""".stripMargin,
    doc = "hour-of-day load profile per type (energy daily shape)") { (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("event_type"), hour(col("ts")).cast("int").as("hour"))
      .agg(count(lit(1)).as("n"),
        RelationalQueries.dsum(col("value")).as("total"))
      .orderBy("event_type", "hour")
  }

  /** SLIDING windows in batch (2h length, 1h slide): each event lands
    * in exactly len/slide windows — Spark's `window()` generates the
    * assignments; the oracle states the same expansion explicitly
    * (truncate to the slide grid, fan out k∈[0, len/slide)). Completes
    * the window-mechanics family: tumbling (q_time_window), session
    * (q_sessionize), ROWS/RANGE frames (q_window_funcs/q_window_range)
    * and now overlapping assignment.
    */
  val qSlidingWindow: QueryDef = QueryDef.sql(
    "q_sliding_window",
    s"""SELECT ws, event_type, count(*) AS n,
      |  ${RelationalQueries.dsumSql("value")} AS total
      |FROM (
      |  SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS ws,
      |    event_type, value
      |  FROM events, unnest([0, 1]) AS u(k))
      |GROUP BY ws, event_type
      |ORDER BY ws, event_type""".stripMargin,
    doc = "overlapping sliding-window aggregation in batch (window mechanics)") { (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        RelationalQueries.dsum(col("value")).as("total"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("total"))
      .orderBy("ws", "event_type")
  }

  /** The skewed-interval twin of [[qRangeJoin]]: interval lengths
    * split 30 s / 1 day (2,880× apart), the regime where any single
    * bin width loses — the multi-scale join assigns each interval to
    * its own level (≤ 2 bins each) and points probe one bin per level
    * present. Oracle is the same naive BETWEEN theta-join.
    *
    * Terminal shape is the PER-INTERVAL PROFILE (hit count, first/last
    * offset), not the pair dump: a day-long interval over a dense
    * point stream matches points ∝ density, so enumerated pairs grow
    * as intervals × density — the 100× replica made that 1.6e10 rows
    * and the old ORDER BY over them exhausted 70 GB of spill. The
    * aggregation collapses join hits into per-interval partials inside
    * the join stage (map-side combine, no pair ever crosses an
    * exchange), output O(intervals) at any density — the same
    * bounded-output move as q_interval_overlap vs the raw pair dump.
    */
  val qRangeJoinSkew: QueryDef = QueryDef.sql(
    "q_range_join_skew",
    """WITH iv AS (
      |  SELECT event_id AS iv_id, ts AS ivs,
      |    CASE WHEN event_id % 398 = 0 THEN ts + INTERVAL 30 SECOND
      |         ELSE ts + INTERVAL 1 DAY END AS ive
      |  FROM events WHERE event_id % 199 = 0)
      |SELECT iv_id, count(*) AS n_hits,
      |  min(epoch_us(p.ts) - epoch_us(ivs)) AS first_off_us,
      |  max(epoch_us(p.ts) - epoch_us(ivs)) AS last_off_us
      |FROM events p JOIN iv ON p.ts >= ivs AND p.ts <= ive
      |GROUP BY iv_id
      |ORDER BY iv_id""".stripMargin,
    doc = "multi-scale range join under 2880x interval-length skew, per-interval profile (temporal join)") { (s, dir) =>
    import graft.transform.TemporalJoins
    val ev = t(s, dir, "events")
    val iv = ev.filter(col("event_id") % 199 === 0)
      .select(col("event_id").as("iv_id"), col("ts").as("ivs"),
        when(col("event_id") % 398 === 0,
          col("ts") + expr("INTERVAL 30 SECONDS"))
          .otherwise(col("ts") + expr("INTERVAL 1 DAY")).as("ive"))
    TemporalJoins.rangeJoinMultiScale(ev.select(col("event_id"), col("ts")),
        "ts", iv, "ivs", "ive", baseBinMicros = 30L * 1000000L)
      .groupBy(col("iv_id"))
      .agg(count(lit(1)).as("n_hits"),
        min(epochUs(col("ts")) - epochUs(col("ivs"))).as("first_off_us"),
        max(epochUs(col("ts")) - epochUs(col("ivs"))).as("last_off_us"))
      .orderBy("iv_id")
  }

  /** Interval×interval overlap join via start-point decomposition —
    * two multi-scale range joins whose disjuncts partition the
    * qualifying pairs (no distinct needed), with mixed 60 s / 12 h
    * lengths on one side to exercise the skew path. Reports overlap
    * duration; oracle is the naive pairwise-intersection theta-join.
    */
  val qIntervalOverlap: QueryDef = QueryDef.sql(
    "q_interval_overlap",
    """WITH a AS (
      |  SELECT event_id AS a_id, ts AS a_s, ts + INTERVAL 1 HOUR AS a_e
      |  FROM events WHERE event_id % 211 = 0),
      |b AS (
      |  SELECT event_id AS b_id, ts AS b_s,
      |    CASE WHEN event_id % 614 = 0 THEN ts + INTERVAL 60 SECOND
      |         ELSE ts + INTERVAL 12 HOUR END AS b_e
      |  FROM events WHERE event_id % 307 = 0)
      |SELECT a_id, b_id,
      |  epoch_us(least(a_e, b_e)) - epoch_us(greatest(a_s, b_s)) AS overlap_us
      |FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
      |ORDER BY a_id, b_id""".stripMargin,
    doc = "interval overlap join via start-point decomposition over multi-scale bins (temporal join)") { (s, dir) =>
    import graft.transform.TemporalJoins
    val ev = t(s, dir, "events")
    val a = ev.filter(col("event_id") % 211 === 0)
      .select(col("event_id").as("a_id"), col("ts").as("a_s"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("a_e"))
    val b = ev.filter(col("event_id") % 307 === 0)
      .select(col("event_id").as("b_id"), col("ts").as("b_s"),
        when(col("event_id") % 614 === 0,
          col("ts") + expr("INTERVAL 60 SECONDS"))
          .otherwise(col("ts") + expr("INTERVAL 12 HOURS")).as("b_e"))
    TemporalJoins.intervalOverlapJoin(a, "a_s", "a_e", b, "b_s", "b_e",
        baseBinMicros = 60L * 1000000L)
      .select(col("a_id"), col("b_id"),
        (epochUs(least(col("a_e"), col("b_e"))) -
          epochUs(greatest(col("a_s"), col("b_s")))).as("overlap_us"))
      .orderBy("a_id", "b_id")
  }

  /** Seasonal-naive forecasting — the energy-domain baseline model
    * (predict each hour from the same hour's historical mean) with a
    * proper temporal holdout: the first 80% of the time range trains a
    * per-(type, hour-of-day) mean model, the last 20% is scored
    * against it (MAE + signed bias per type). The model is a 24×|types|
    * aggregate joined broadcast onto the test scan — at 100 TB the
    * whole query is two scans, one tiny-dimension broadcast join and
    * one partial-aggregated reduce; nothing driver-side. Double
    * aggregates go through the decimal-sum convention so Spark and
    * DuckDB agree bit-for-bit.
    */
  val qForecastBaseline: QueryDef = QueryDef.sql(
    "q_forecast_baseline",
    s"""WITH b AS (
      |  SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events),
      |c AS (SELECT t0 + CAST(floor((t1 - t0) * 4 / 5) AS BIGINT) AS cut FROM b),
      |model AS (
      |  SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS hour,
      |    ${dsumSql("value")} / count(*) AS pred
      |  FROM events, c WHERE epoch_us(ts) < cut
      |  GROUP BY event_type, hour)
      |SELECT t.event_type, count(*) AS n_test,
      |  round(${dsum9Sql("abs(t.value - m.pred)")} / count(*), 6) AS mae,
      |  round(${dsum9Sql("t.value - m.pred")} / count(*), 6) AS bias
      |FROM (SELECT e.* FROM events e, c WHERE epoch_us(e.ts) >= cut) t
      |JOIN model m ON t.event_type = m.event_type
      |  AND CAST(extract(hour FROM t.ts) AS INT) = m.hour
      |GROUP BY t.event_type
      |ORDER BY t.event_type""".stripMargin,
    doc = "seasonal-naive hourly forecast with temporal holdout, MAE/bias per type (energy analytics)") { (s, dir) =>
    val ev = t(s, dir, "events")
    val cut = broadcast(
      ev.agg(min(epochUs(col("ts"))).as("t0"), max(epochUs(col("ts"))).as("t1"))
        .select((col("t0") +
          floor((col("t1") - col("t0")) * 4 / 5).cast("long")).as("cut")))
    val withCut = ev.crossJoin(cut)
    val model = withCut.filter(epochUs(col("ts")) < col("cut"))
      .groupBy(col("event_type"), hour(col("ts")).cast("int").as("hour"))
      .agg((dsum(col("value")) / count(lit(1))).as("pred"))
    withCut.filter(epochUs(col("ts")) >= col("cut"))
      .select(col("event_type"), hour(col("ts")).cast("int").as("hour"),
        col("value"))
      .join(broadcast(model), Seq("event_type", "hour"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_test"),
        // dsum9, not dsum: |value − pred| can terminate EXACTLY on the
        // scale-4 half-grid (power-of-two bucket denominators), where
        // the engines' double→decimal tie handling diverges — see dsum9
        round(dsum9(abs(col("value") - col("pred"))) / count(lit(1)), 6)
          .as("mae"),
        round(dsum9(col("value") - col("pred")) / count(lit(1)), 6)
          .as("bias"))
      .orderBy("event_type")
  }

  /** Closed-form distributed OLS — per-type linear trend of value over
    * time via sufficient statistics (n, Σx, Σy, Σxx, Σxy): one
    * partial-aggregated pass, O(|types|) output, no iteration and no
    * driver math — the shape gradient-free regression takes at 100 TB.
    * x is whole seconds from the global time origin (keeps Σxx inside
    * exact decimal range); the slope/intercept division happens in
    * double on exact decimal sums, so both engines compute identical
    * IEEE results.
    */
  val qTrendOls: QueryDef = QueryDef.sql(
    "q_trend_ols",
    """WITH b AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
      |sx AS (
      |  SELECT event_type,
      |    CAST(floor((epoch_us(ts) - t0) / 1000000.0) AS BIGINT) AS x,
      |    value AS y
      |  FROM events, b),
      |stats AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(20,4))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(x * y AS DECIMAL(30,4))) AS DOUBLE) AS sxy
      |  FROM sx GROUP BY event_type)
      |SELECT event_type, n,
      |  round((n * sxy - sx * sy) / (n * sxx - sx * sx) * 86400, 6)
      |    AS slope_per_day,
      |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
      |    AS intercept
      |FROM stats
      |ORDER BY event_type""".stripMargin,
    doc = "per-type OLS trend via sufficient statistics, one distributed pass (energy analytics)") { (s, dir) =>
    val ev = t(s, dir, "events")
    val t0 = broadcast(ev.agg(min(epochUs(col("ts"))).as("t0")))
    val xy = ev.crossJoin(t0)
      .select(col("event_type"),
        floor((epochUs(col("ts")) - col("t0")) / 1000000.0).cast("long")
          .as("x"),
        col("value").as("y"))
    val stats = xy.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(20,4)")).cast("double").as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double")
          .as("sxx"),
        sum((col("x") * col("y")).cast("decimal(30,4)")).cast("double")
          .as("sxy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    stats.select(col("event_type"), col("n"),
        round(slope * 86400, 6).as("slope_per_day"),
        round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"))
      .orderBy("event_type")
  }

  /** Seasonally-adjusted anomaly detection — q_anomalies' blind spot
    * is daily shape: a normal midnight reading can sit 3σ from the
    * all-hours mean, and a broken noon meter can hide inside it. Here
    * the per-(type, hour-of-day) mean is subtracted first and the
    * n-sigma rule runs on RESIDUALS per type — the energy-domain
    * anomaly screen (deviation from the daily profile, not from the
    * global mean). Model and residual moments are both broadcast-size
    * aggregates; decimal-exact sums throughout.
    */
  val qAnomaliesSeasonal: QueryDef = QueryDef.sql(
    "q_anomalies_seasonal",
    """WITH m AS (
      |  SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS hour,
      |    count(value) AS mn,
      |    CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS msv
      |  FROM events GROUP BY event_type, hour),
      |r AS (
      |  SELECT e.event_id, e.event_type, e.value - m.msv / m.mn AS resid
      |  FROM events e JOIN m ON e.event_type = m.event_type
      |    AND CAST(extract(hour FROM e.ts) AS INT) = m.hour),
      |s AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(CAST(resid AS DECIMAL(30,6))) AS DOUBLE) AS sv,
      |    CAST(sum(CAST(resid * resid AS DECIMAL(30,6))) AS DOUBLE) AS svv
      |  FROM r GROUP BY event_type)
      |SELECT r.event_id, r.event_type,
      |  CAST(round(r.resid, 6) AS DOUBLE) AS resid
      |FROM r JOIN s ON r.event_type = s.event_type
      |WHERE abs(r.resid - sv / n) > 3.0 * sqrt((svv - sv * sv / n) / (n - 1))
      |ORDER BY r.event_id""".stripMargin,
    doc = "n-sigma outliers on hour-of-day residuals (seasonal anomaly screen)") { (s, dir) =>
    val ev = t(s, dir, "events")
    val model = ev.groupBy(col("event_type"),
        hour(col("ts")).cast("int").as("hour"))
      .agg(count(col("value")).as("mn"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("msv"))
    val resid = ev.select(col("event_id"), col("event_type"),
        hour(col("ts")).cast("int").as("hour"), col("value"))
      .join(broadcast(model), Seq("event_type", "hour"))
      .select(col("event_id"), col("event_type"),
        (col("value") - col("msv") / col("mn")).as("resid"))
    val stats = resid.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("resid").cast("decimal(30,6)")).cast("double").as("sv"),
      sum((col("resid") * col("resid")).cast("decimal(30,6)"))
        .cast("double").as("svv"))
    resid.join(broadcast(stats), "event_type")
      .filter(abs(col("resid") - col("sv") / col("n")) >
        lit(3.0) * sqrt((col("svv") - col("sv") * col("sv") / col("n"))
          / (col("n") - 1)))
      .select(col("event_id"), col("event_type"),
        round(col("resid"), 6).cast("double").as("resid"))
      .orderBy("event_id")
  }

  /** Exponentially-weighted moving average over each type's reading
    * sequence — the classic meter-smoothing primitive, in its
    * K-truncated *adjusted* form (pandas `ewm(adjust=True)` cut at 8
    * lags): y_i = Σ_{k<8} β^k·x_{i−k} / Σ_{k<8} β^k with β = 0.75,
    * summed only over lags that exist. Truncation is what makes the
    * recursion distributable: 8 bounded window lags instead of an
    * unbounded sequential scan, so at scale the per-type partition can
    * be split into time chunks with a K-row overlap and every chunk
    * computed independently (the recursive form can't). β^k weights
    * are EXACT decimal literals and x is decimal-cast, so numerator
    * and denominator are order-independent exact decimals in both
    * engines; only the final division runs in IEEE double on
    * bit-identical inputs.
    */
  val qEwma: QueryDef = {
    val beta = BigDecimal("0.75")
    val kMax = 8
    val weights = (0 until kMax).map(beta.pow)
    val wLits = weights.map(w => s"CAST($w AS DECIMAL(16,14))")
    val lagSql = (k: Int) =>
      if (k == 0) "x" else s"lag(x, $k) OVER w"
    val numSql = (0 until kMax)
      .map(k => s"coalesce(${lagSql(k)} * ${wLits(k)}, 0)").mkString(" + ")
    val denSql = (0 until kMax)
      .map(k => s"CASE WHEN ${lagSql(k)} IS NOT NULL THEN ${wLits(k)} ELSE 0 END")
      .mkString(" + ")
    QueryDef.sql(
      "q_ewma",
      s"""SELECT event_id, event_type,
        |  CAST(round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS DOUBLE) AS ewma
        |FROM (
        |  SELECT event_id, event_type,
        |    $numSql AS num,
        |    $denSql AS den
        |  FROM (SELECT event_id, event_type, ts,
        |          CAST(value AS DECIMAL(18,6)) AS x FROM events)
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
        |ORDER BY event_type, event_id""".stripMargin,
      doc = "K-truncated adjusted EWMA smoothing, exact-decimal weights (time series)") { (s, dir) =>
      val base0 = t(s, dir, "events").select(col("event_id"),
        col("event_type"), col("ts"), col("value").cast("decimal(18,6)").as("x"))
      // K−1 lags on range-balanced chunks — the truncation that makes
      // EWMA distributable (scaladoc above), now actually realized:
      // the per-type window would sort 1/|types| of the corpus per task
      val base = graft.transform.ChunkedWindows.lagsUpTo(
        base0, Seq("event_type"), Seq("ts", "event_id"), "x",
        kMax - 1, "__xl")
      val lagK = (k: Int) => if (k == 0) col("x") else col(s"__xl$k")
      val zero = lit(BigDecimal(0)).cast("decimal(16,14)")
      val num = (0 until kMax).map { k =>
        coalesce(lagK(k) * lit(weights(k)).cast("decimal(16,14)"), lit(0))
      }.reduce(_ + _)
      val den = (0 until kMax).map { k =>
        when(lagK(k).isNotNull, lit(weights(k)).cast("decimal(16,14)"))
          .otherwise(zero)
      }.reduce(_ + _)
      base.select(col("event_id"), col("event_type"),
          num.as("num"), den.as("den"))
        .select(col("event_id"), col("event_type"),
          round(col("num").cast("double") / col("den").cast("double"), 6)
            .cast("double").as("ewma"))
        .orderBy("event_type", "event_id")
    }
  }

  /** Behavioral path mining: the top-10 most frequent 3-step
    * event-type sequences across user journeys — consecutive trigrams
    * via two window leads per user ordered by (ts, id), then one
    * count aggregate. The classic product-analytics "common paths"
    * query; output is O(|type|³) bounded regardless of corpus size,
    * and the only shuffles are the per-user window and the count.
    */
  val qEventPaths: QueryDef = QueryDef.sql(
    "q_event_paths",
    """WITH s AS (
      |  SELECT event_type AS e1,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
      |FROM s WHERE e3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,
    doc = "top-10 3-step user event paths via window leads (behavioral analytics)") { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("event_type").as("e1"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(10)
  }

  /** Autocorrelation function per event type: r_k = Σ(x_i−x̄)(x_{i−k}−x̄)
    * / Σ(x_i−x̄)² for k = 1..6 over the (ts, id)-ordered value sequence —
    * the lag-structure screen that picks seasonality periods
    * (q_forecast_baseline's hour-of-day model assumes a lag-24h peak;
    * this measures it). One per-type window with six lags, one aggregate:
    * the sequential-looking statistic in its one-pass distributed form.
    * x̄ comes from exact decimal sums; each lag product is a
    * deterministic IEEE double on identical inputs, decimal-rounded
    * before summing so partial-aggregation order can't skew the result.
    */
  val qAcf: QueryDef = {
    val kMax = 6
    val lagCols = (1 to kMax).map(k => s"lag(xc, $k) OVER w AS xl$k")
      .mkString(",\n      |    ")
    val aggCols = (1 to kMax).map(k =>
      s"count(xc * xl$k) AS n$k,\n      |    " +
        s"CAST(sum(CAST(xc * xl$k AS DECIMAL(30,10))) AS DOUBLE) AS s$k")
      .mkString(",\n      |    ")
    val branches = (1 to kMax).map(k =>
      s"SELECT event_type, $k AS lag_k, n$k AS n_pairs, " +
        s"CAST(round(s$k / nullif(den, 0), 6) AS DOUBLE) AS acf FROM a")
      .mkString("\n      |UNION ALL ")
    QueryDef.sql(
      "q_acf",
      s"""WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sv
        |  FROM events GROUP BY event_type),
        |x AS (
        |  SELECT e.event_type, e.ts, e.event_id, e.value - m.sv / m.n AS xc
        |  FROM events e JOIN m ON e.event_type = m.event_type),
        |l AS (
        |  SELECT event_type, xc,
        |    $lagCols
        |  FROM x WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
        |a AS (
        |  SELECT event_type,
        |    CAST(sum(CAST(xc * xc AS DECIMAL(30,10))) AS DOUBLE) AS den,
        |    $aggCols
        |  FROM l GROUP BY event_type)
        |$branches
        |ORDER BY event_type, lag_k""".stripMargin,
      doc = "autocorrelation r_1..r_6 per type, one window + one aggregate (time series)") { (s, dir) =>
      val ev = t(s, dir, "events")
      val m = broadcast(ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("sv")))
      val x = ev.join(m, "event_type")
        .select(col("event_type"), col("ts"), col("event_id"),
          (col("value") - col("sv") / col("n")).as("xc"))
      // six lags on range-balanced chunks (ChunkedWindows), not a
      // per-type window — five types would gather 1/5 of the corpus
      // per task; lag values are carried verbatim so the decimal
      // product sums below are untouched
      val withLags = graft.transform.ChunkedWindows.lagsUpTo(
          x, Seq("event_type"), Seq("ts", "event_id"), "xc", kMax, "xl")
        .select(col("event_type") +: col("xc") +:
          (1 to kMax).map(k => col(s"xl$k")): _*)
      val agg = withLags.groupBy("event_type").agg(
        sum((col("xc") * col("xc")).cast("decimal(30,10)")).cast("double")
          .as("den"),
        (1 to kMax).flatMap(k => Seq(
          count(col("xc") * col(s"xl$k")).as(s"n$k"),
          sum((col("xc") * col(s"xl$k")).cast("decimal(30,10)"))
            .cast("double").as(s"s$k"))): _*)
      agg.select(col("event_type"), col("den"),
          explode(array((1 to kMax).map(k => struct(
            lit(k).as("lag_k"), col(s"n$k").as("n_pairs"),
            col(s"s$k").as("s"))): _*)).as("e"))
        .select(col("event_type"), col("e.lag_k").as("lag_k"),
          col("e.n_pairs").as("n_pairs"),
          round(col("e.s") / nullif(col("den"), lit(0d)), 6).cast("double")
            .as("acf"))
        .orderBy("event_type", "lag_k")
    }
  }

  /** CUSUM change-point detection per event type: the cumulative sum of
    * mean deviations S_i = Σ_{j≤i}(x_j − x̄) peaks (in |S|) exactly where
    * the series' level shifts — the classic drift detector for meter
    * recalibration / sensor step changes. Deviations are decimal-rounded
    * once, so the running sum is an EXACT decimal in any association
    * order (a double cumsum would diverge between Spark's running
    * accumulation and DuckDB's segment-tree frames); the argmax row is
    * picked by exact decimal comparison with a (ts, id) tie-break. At
    * scale the per-type cumsum splits into time chunks joined by a
    * P-row offset table — the balancedShards prefix-sum idiom.
    */
  val qCusum: QueryDef = QueryDef.sql(
    "q_cusum",
    """WITH m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sv
      |  FROM events GROUP BY event_type),
      |d AS (
      |  SELECT e.event_id, e.event_type, e.ts, m.n,
      |    CAST(e.value - m.sv / m.n AS DECIMAL(24,10)) AS dev
      |  FROM events e JOIN m ON e.event_type = m.event_type),
      |c AS (
      |  SELECT event_id, event_type, ts, n,
      |    sum(dev) OVER (PARTITION BY event_type ORDER BY ts, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS s
      |  FROM d),
      |r AS (
      |  SELECT event_type, n, ts, s,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY abs(s) DESC, ts, event_id) AS rn
      |  FROM c)
      |SELECT event_type, n AS n_points,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS cp_ts,
      |  CAST(round(CAST(abs(s) AS DOUBLE), 6) AS DOUBLE) AS max_drift
      |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    doc = "CUSUM mean-shift change point per type, exact decimal cumsum (time series)") { (s, dir) =>
    val ev = t(s, dir, "events")
    val m = broadcast(ev.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(30,6)")).cast("double").as("sv")))
    val d = ev.join(m, "event_type")
      .select(col("event_id"), col("event_type"), col("ts"), col("n"),
        (col("value") - col("sv") / col("n")).cast("decimal(24,10)").as("dev"))
    // the balancedShards prefix-sum idiom the scaladoc promised, now
    // realized: chunk-local decimal cumsums + P×|types| offsets are
    // bit-identical to the sequential per-type window (decimal
    // addition associates), without gathering a type per task
    val c = graft.transform.ChunkedWindows.runningSum(
        d, Seq("event_type"), Seq("ts", "event_id"), "dev", "s")
      .select(col("event_id"), col("event_type"), col("ts"), col("n"),
        col("s"))
    // argmax WITHOUT ranking the corpus per type (a 5-partition full
    // sort just to keep one row each): one max aggregate, an exact
    // decimal equality filter down to the (rare) peak rows, then the
    // (ts, id) tie-break ranks only those
    val mx = c.groupBy("event_type").agg(max(abs(col("s"))).as("__mx"))
    val peak = c.join(broadcast(mx), "event_type")
      .filter(abs(col("s")) === col("__mx"))
    val rankW = Window.partitionBy("event_type")
      .orderBy(col("ts"), col("event_id"))
    peak.withColumn("rn", row_number().over(rankW))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n").as("n_points"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("cp_ts"),
        round(abs(col("s")).cast("double"), 6).cast("double").as("max_drift"))
      .orderBy("event_type")
  }

  /** Cross-correlation function between two event types' hourly mean
    * series at lags 0..6 h — "do purchases follow clicks, and with what
    * delay" (the lead-lag screen; [[qAcf]]'s two-series sibling).
    * The series are aggregates (bounded by the time range, not the
    * corpus), so the lag join runs on tiny inputs whatever the scale;
    * Pearson per lag comes from one pass of decimal-cast raw sums with
    * the final formula in double on exact inputs.
    */
  val qCcf: QueryDef = QueryDef.sql(
    "q_ccf",
    """WITH s AS (
      |  SELECT event_type,
      |    CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS h,
      |    count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sv
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1, 2),
      |x AS (SELECT h, sv / n AS x FROM s WHERE event_type = 'click'),
      |y AS (SELECT h, sv / n AS y FROM s WHERE event_type = 'purchase'),
      |l AS (SELECT unnest(range(0, 7)) AS lag_h),
      |j AS (
      |  SELECT l.lag_h, x.x, y.y
      |  FROM l CROSS JOIN x JOIN y ON y.h = x.h + l.lag_h),
      |a AS (
      |  SELECT lag_h, count(*) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x * x AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(y * y AS DECIMAL(30,10))) AS DOUBLE) AS syy,
      |    CAST(sum(CAST(x * y AS DECIMAL(30,10))) AS DOUBLE) AS sxy
      |  FROM j GROUP BY lag_h)
      |SELECT lag_h, n AS n_pairs,
      |  CAST(round((n * sxy - sx * sy) /
      |    nullif(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0), 6)
      |    AS DOUBLE) AS ccf
      |FROM a ORDER BY lag_h""".stripMargin,
    doc = "hourly click→purchase cross-correlation at lags 0..6h (time series)") { (s, dir) =>
    val ser = t(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"),
        floor(epochUs(col("ts")) / 3600000000.0).cast("long").as("h"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("sv"))
      .select(col("event_type"), col("h"), (col("sv") / col("n")).as("v"))
    val x = ser.filter(col("event_type") === "click")
      .select(col("h"), col("v").as("x"))
    val y = ser.filter(col("event_type") === "purchase")
      .select(col("h"), col("v").as("y"))
    val lags = s.range(0, 7).select(col("id").as("lag_h"))
    val j = x.crossJoin(broadcast(lags))
      .join(y.withColumnRenamed("h", "hy"),
        col("hy") === col("h") + col("lag_h"))
    val a = j.groupBy(col("lag_h")).agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(30,10)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(30,10)")).cast("double").as("sy"),
      sum((col("x") * col("x")).cast("decimal(30,10)")).cast("double").as("sxx"),
      sum((col("y") * col("y")).cast("decimal(30,10)")).cast("double").as("syy"),
      sum((col("x") * col("y")).cast("decimal(30,10)")).cast("double").as("sxy"))
    a.select(col("lag_h"), col("n").as("n_pairs"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          nullif(sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), lit(0d)), 6)
          .cast("double").as("ccf"))
      .orderBy("lag_h")
  }

  /** Time-weighted average per type — THE correct mean for an
    * irregularly-sampled series (the arithmetic mean over-weights
    * burst periods; the energy-domain standard is the trapezoidal
    * integral ∫v dt / (t_n − t_0)): one per-type window lag for
    * (prev value, prev ts), each trapezoid (v_i + v_{i−1})/2 · Δt_µs
    * decimal-cast before the exact sum, one division at the end.
    *
    * The lag rides [[graft.transform.ChunkedWindows.lag1]], NOT a
    * per-type window: five event types hash-partitioned would sort
    * 1/5 of the corpus on each of five tasks (the round-8 sweep's
    * 9.6×–14× run-to-run band at 100× was those 2M-row sorts
    * breathing with spill/GC pressure), while range-balanced chunks
    * sort N/P rows per task at full parallelism with identical
    * lagged values — so the aggregate below, and the oracle, are
    * untouched.
    */
  val qTwa: QueryDef = QueryDef.sql(
    "q_twa",
    """WITH l AS (
      |  SELECT event_type, value, epoch_us(ts) AS t,
      |    lag(value) OVER w AS pv,
      |    lag(epoch_us(ts)) OVER w AS pt
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
      |a AS (
      |  SELECT event_type,
      |    CAST(sum(CAST((value + pv) / 2 * (t - pt) AS DECIMAL(38,6)))
      |      AS DOUBLE) AS area,
      |    max(t) - min(t) AS span_us,
      |    count(pv) AS n_segments
      |  FROM l GROUP BY event_type)
      |SELECT event_type, n_segments,
      |  CAST(round(area / span_us, 6) AS DOUBLE) AS twa
      |FROM a WHERE span_us > 0 ORDER BY event_type""".stripMargin,
    doc = "trapezoidal time-weighted average per type (irregular-series mean)") { (s, dir) =>
    // epoch-µs order ≡ ts order, so the lag can sort on the
    // projected long (one fewer carried column)
    val l = graft.transform.ChunkedWindows.lag1(
      t(s, dir, "events").select(col("event_type"), col("event_id"),
        col("value"), epochUs(col("ts")).as("t")),
      keyCols = Seq("event_type"), orderCols = Seq("t", "event_id"),
      lagCols = Map("value" -> "pv", "t" -> "pt"))
    l.groupBy("event_type")
      .agg(
        sum(((col("value") + col("pv")) / 2 * (col("t") - col("pt")))
          .cast("decimal(38,6)")).cast("double").as("area"),
        (max(col("t")) - min(col("t"))).as("span_us"),
        count(col("pv")).as("n_segments"))
      .filter(col("span_us") > 0)
      .select(col("event_type"), col("n_segments"),
        round(col("area") / col("span_us"), 6).cast("double").as("twa"))
      .orderBy("event_type")
  }

  /** First/last-touch attribution per user as ONE partial-aggregable
    * pass: min_by/max_by over a composite event-time key replace the
    * usual window-rank-then-filter anti-pattern — no per-user sort, no
    * window exchange, just map-side-combined argmin/argmax state (the
    * at-scale difference: a sort-based rank shuffles every event row;
    * this shuffles one candidate per user per partition). The ordering
    * key is zero-padded epoch-µs + event-id text, totally ordered and
    * duplicate-free in both engines, so ties cannot exist and the
    * picked rows are deterministic.
    */
  val qAttribution: QueryDef = QueryDef.sql(
    "q_attribution",
    """WITH k AS (
      |  SELECT user_id, event_type,
      |    lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '-' ||
      |      lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
      |  FROM events WHERE user_id <= 40)
      |SELECT user_id,
      |  min_by(event_type, ord) AS first_touch,
      |  max_by(event_type, ord) AS last_touch,
      |  count(*) AS n_events
      |FROM k GROUP BY user_id ORDER BY user_id""".stripMargin,
    doc = "first/last-touch attribution via single-pass argmin/argmax (no window sort)") { (s, dir) =>
    t(s, dir, "events")
      .filter(col("user_id") <= 40)
      .select(col("user_id"), col("event_type"),
        concat(lpad(epochUs(col("ts")).cast("string"), 20, "0"), lit("-"),
          lpad(col("event_id").cast("string"), 12, "0")).as("ord"))
      .groupBy("user_id")
      .agg(min_by(col("event_type"), col("ord")).as("first_touch"),
        max_by(col("event_type"), col("ord")).as("last_touch"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Distribution window functions — ntile/percent_rank/cume_dist per
    * type over the (value, event_id) total order: the ranking surface
    * q_window_rank/q_window_funcs don't cover. All three are
    * rank-derived (integer arithmetic over n and rank), so the doubles
    * are identical in both engines with no decimal scaffolding; the
    * window is PARTITIONED by type — one keyed exchange, local sorts,
    * nothing global.
    */
  val qWindowDist: QueryDef = QueryDef.sql(
    "q_window_dist",
    """SELECT event_id, event_type,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cdist
      |FROM events WHERE user_id <= 25
      |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      |ORDER BY event_id""".stripMargin,
    doc = "ntile/percent_rank/cume_dist per type (distribution windows, keyed exchange)") { (s, dir) =>
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    t(s, dir, "events")
      .filter(col("user_id") <= 25)
      .select(col("event_id"), col("event_type"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"))
      .orderBy("event_id")
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next type | type) from consecutive pairs — the
    * behavioral model behind next-action prediction and anomaly
    * scoring on event streams. One keyed window (per user, ordered by
    * time then id) produces the pairs; counts and row totals are two
    * aggregations; probabilities are integer-ratio doubles, identical
    * in both engines. Output is the dense |types|² matrix — bounded
    * however many events stream through.
    */
  val qMarkovTransitions: QueryDef = QueryDef.sql(
    "q_markov_transitions",
    """WITH seq AS (
      |  SELECT event_type AS src,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS dst
      |  FROM events),
      |c AS (
      |  SELECT src, dst, count(*) AS n FROM seq
      |  WHERE dst IS NOT NULL GROUP BY src, dst),
      |r AS (SELECT src, sum(n) AS row_n FROM c GROUP BY src)
      |SELECT c.src, c.dst, c.n,
      |  round(CAST(c.n AS DOUBLE) / r.row_n, 6) AS p
      |FROM c JOIN r ON c.src = r.src
      |ORDER BY c.src, c.dst""".stripMargin,
    doc = "per-user Markov transition matrix P(next | current) (behavior modeling)") { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val seq = t(s, dir, "events")
      .select(col("event_type").as("src"),
        lead(col("event_type"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
    val c = seq.groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val r = c.groupBy("src").agg(sum(col("n")).as("row_n"))
    c.join(broadcast(r), "src")
      .select(col("src"), col("dst"), col("n"),
        round(col("n").cast("double") / col("row_n"), 6).as("p"))
      .orderBy("src", "dst")
  }

  /** Association-rule metrics over consecutive event pairs: support,
    * confidence, and lift for every src → dst transition — the
    * market-basket scoring layer on top of the q_markov_transitions
    * counts (lift > 1 flags transitions that co-occur beyond what the
    * destination's base rate predicts). Marginals and the pair total
    * are tiny aggregations broadcast back; every metric is an
    * integer-ratio double, identical in both engines.
    */
  val qAssocRules: QueryDef = QueryDef.sql(
    "q_assoc_rules",
    """WITH seq AS (
      |  SELECT event_type AS src,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS dst
      |  FROM events),
      |c AS (
      |  SELECT src, dst, count(*) AS n FROM seq
      |  WHERE dst IS NOT NULL GROUP BY src, dst),
      |srcm AS (SELECT src, sum(n) AS n_src FROM c GROUP BY src),
      |dstm AS (SELECT dst, sum(n) AS n_dst FROM c GROUP BY dst),
      |tot AS (SELECT sum(n) AS total FROM c)
      |SELECT c.src, c.dst, c.n,
      |  round(CAST(c.n AS DOUBLE) / tot.total, 6) AS support,
      |  round(CAST(c.n AS DOUBLE) / srcm.n_src, 6) AS confidence,
      |  round((CAST(c.n AS DOUBLE) / srcm.n_src) /
      |    (CAST(dstm.n_dst AS DOUBLE) / tot.total), 6) AS lift
      |FROM c
      |JOIN srcm ON c.src = srcm.src
      |JOIN dstm ON c.dst = dstm.dst
      |CROSS JOIN tot
      |ORDER BY c.src, c.dst""".stripMargin,
    doc = "support/confidence/lift per event transition (association rules)") { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val seq = t(s, dir, "events")
      .select(col("event_type").as("src"),
        lead(col("event_type"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
    val c = seq.groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val srcm = c.groupBy("src").agg(sum(col("n")).as("n_src"))
    val dstm = c.groupBy("dst").agg(sum(col("n")).as("n_dst"))
    val tot = c.agg(sum(col("n")).as("total"))
    c.join(broadcast(srcm), "src")
      .join(broadcast(dstm), "dst")
      .crossJoin(broadcast(tot))
      .select(col("src"), col("dst"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("support"),
        round(col("n").cast("double") / col("n_src"), 6).as("confidence"),
        round((col("n").cast("double") / col("n_src")) /
          (col("n_dst").cast("double") / col("total")), 6).as("lift"))
      .orderBy("src", "dst")
  }

  /** RFM (recency / frequency / monetary) segmentation per user —
    * scored against PERCENTILE THRESHOLDS rather than ntile: a global
    * ntile window funnels every user through one partition, while the
    * four quintile cuts are one tiny aggregate broadcast back, so the
    * scoring pass stays embarrassingly parallel at any user count
    * (threshold quintiles differ from ntile only in how boundary ties
    * split — documented semantics, identical in both engines). Sums
    * are decimal-exact; scores are pure comparison counts.
    */
  val qRfm: QueryDef = QueryDef.sql(
    "q_rfm",
    """WITH mx AS (SELECT max(ts) AS now_ts FROM events),
      |u AS (
      |  SELECT user_id,
      |    CAST(floor((epoch_us(mx.now_ts) - epoch_us(max(ts)))
      |      / 86400000000.0) AS BIGINT) AS recency_d,
      |    count(*) AS frequency,
      |    CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS monetary
      |  FROM events, mx GROUP BY user_id, mx.now_ts),
      |q AS (
      |  SELECT
      |    quantile_cont(recency_d, 0.2) AS r20, quantile_cont(recency_d, 0.4) AS r40,
      |    quantile_cont(recency_d, 0.6) AS r60, quantile_cont(recency_d, 0.8) AS r80,
      |    quantile_cont(frequency, 0.2) AS f20, quantile_cont(frequency, 0.4) AS f40,
      |    quantile_cont(frequency, 0.6) AS f60, quantile_cont(frequency, 0.8) AS f80,
      |    quantile_cont(monetary, 0.2) AS m20, quantile_cont(monetary, 0.4) AS m40,
      |    quantile_cont(monetary, 0.6) AS m60, quantile_cont(monetary, 0.8) AS m80
      |  FROM u)
      |SELECT user_id, recency_d, frequency,
      |  CAST(round(monetary, 4) AS DOUBLE) AS monetary,
      |  5 - ((recency_d > r20)::INT + (recency_d > r40)::INT
      |     + (recency_d > r60)::INT + (recency_d > r80)::INT) AS r_score,
      |  1 + (frequency > f20)::INT + (frequency > f40)::INT
      |    + (frequency > f60)::INT + (frequency > f80)::INT AS f_score,
      |  1 + (monetary > m20)::INT + (monetary > m40)::INT
      |    + (monetary > m60)::INT + (monetary > m80)::INT AS m_score
      |FROM u CROSS JOIN q
      |ORDER BY user_id""".stripMargin,
    doc = "RFM segmentation via broadcast percentile thresholds (no global ntile funnel)") { (s, dir) =>
    import graft.core.TimeCols.epochUs
    val ev = t(s, dir, "events")
    val mx = ev.agg(max(col("ts")).as("now_ts"))
    val u = ev.crossJoin(broadcast(mx))
      .groupBy(col("user_id"), col("now_ts"))
      .agg(
        floor((epochUs(col("now_ts")) - epochUs(max(col("ts"))))
          / 86400000000.0).cast("long").as("recency_d"),
        count(lit(1)).as("frequency"),
        sum(col("value").cast("decimal(20,4)")).cast("double").as("monetary"))
      .drop("now_ts")
    val q = u.agg(
      expr("percentile(recency_d, 0.2)").as("r20"),
      expr("percentile(recency_d, 0.4)").as("r40"),
      expr("percentile(recency_d, 0.6)").as("r60"),
      expr("percentile(recency_d, 0.8)").as("r80"),
      expr("percentile(frequency, 0.2)").as("f20"),
      expr("percentile(frequency, 0.4)").as("f40"),
      expr("percentile(frequency, 0.6)").as("f60"),
      expr("percentile(frequency, 0.8)").as("f80"),
      expr("percentile(monetary, 0.2)").as("m20"),
      expr("percentile(monetary, 0.4)").as("m40"),
      expr("percentile(monetary, 0.6)").as("m60"),
      expr("percentile(monetary, 0.8)").as("m80"))
    def score1(m: Column, cuts: Seq[String]): Column =
      cuts.map(cn => when(m > col(cn), 1).otherwise(0)).reduce(_ + _)
    u.crossJoin(broadcast(q))
      .select(col("user_id"), col("recency_d"), col("frequency"),
        round(col("monetary"), 4).cast("double").as("monetary"),
        (lit(5) - score1(col("recency_d"), Seq("r20", "r40", "r60", "r80")))
          .as("r_score"),
        (lit(1) + score1(col("frequency"), Seq("f20", "f40", "f60", "f80")))
          .as("f_score"),
        (lit(1) + score1(col("monetary"), Seq("m20", "m40", "m60", "m80")))
          .as("m_score"))
      .orderBy("user_id")
  }

  /** Burstiness profile per event_type over per-minute counts: Fano
    * factor (variance/mean — 1 for a Poisson stream, above it for
    * bursty arrival), coefficient of variation, and peak-to-mean —
    * the stream-shape diagnostics capacity planning reads. Counts
    * come from one grouped aggregation (bounded by type × minutes);
    * moments are decimal-exact integer sums; population variance is
    * stated with the same computational formula in both engines.
    */
  val qBurstiness: QueryDef = QueryDef.sql(
    "q_burstiness",
    """WITH m AS (
      |  SELECT event_type, date_trunc('minute', ts) AS minute,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, count(*) AS n_minutes,
      |    CAST(sum(c) AS DOUBLE) AS sc,
      |    CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DOUBLE) AS scc,
      |    CAST(max(c) AS DOUBLE) AS peak
      |  FROM m GROUP BY event_type)
      |SELECT event_type, n_minutes,
      |  round(sc / n_minutes, 6) AS mean_per_min,
      |  round((scc / n_minutes - (sc / n_minutes) * (sc / n_minutes))
      |    / (sc / n_minutes), 6) AS fano,
      |  round(sqrt(scc / n_minutes - (sc / n_minutes) * (sc / n_minutes))
      |    / (sc / n_minutes), 6) AS cv,
      |  round(peak / (sc / n_minutes), 6) AS peak_to_mean
      |FROM s ORDER BY event_type""".stripMargin,
    doc = "Fano factor / CV / peak-to-mean of per-minute arrivals (burstiness)") { (s, dir) =>
    val m = t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("c"))
    val st = m.groupBy("event_type").agg(
      count(lit(1)).as("n_minutes"),
      sum(col("c")).cast("double").as("sc"),
      sum(col("c").cast("decimal(38,0)") * col("c")).cast("double").as("scc"),
      max(col("c")).cast("double").as("peak"))
    val mean = col("sc") / col("n_minutes")
    val varP = col("scc") / col("n_minutes") - mean * mean
    st.select(col("event_type"), col("n_minutes"),
        round(mean, 6).as("mean_per_min"),
        round(varP / mean, 6).as("fano"),
        round(sqrt(varP) / mean, 6).as("cv"),
        round(col("peak") / mean, 6).as("peak_to_mean"))
      .orderBy("event_type")
  }

  /** DAU/MAU stickiness and new-vs-returning split per day — the
    * product-health pair every analytics stack computes. Daily
    * distinct users are one exact grouped distinct; "new" means the
    * user's global first day (a per-user min joined back, never a
    * window over history); MAU here is the whole-window distinct,
    * broadcast as one scalar.
    */
  val qDauMau: QueryDef = QueryDef.sql(
    "q_dau_mau",
    """WITH f AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS first_day
      |  FROM events GROUP BY user_id),
      |d AS (
      |  SELECT CAST(e.ts AS DATE) AS day, e.user_id,
      |    min(CASE WHEN CAST(e.ts AS DATE) = f.first_day
      |        THEN 1 ELSE 0 END) AS is_new
      |  FROM events e JOIN f ON e.user_id = f.user_id
      |  GROUP BY 1, 2),
      |mau AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS mau
      |        FROM events)
      |SELECT strftime(day, '%Y-%m-%d') AS day,
      |  count(*) AS dau,
      |  CAST(sum(is_new) AS BIGINT) AS new_users,
      |  CAST(count(*) - sum(is_new) AS BIGINT) AS returning_users,
      |  round(count(*) / mau.mau, 6) AS stickiness
      |FROM d CROSS JOIN mau
      |GROUP BY day, mau.mau ORDER BY day""".stripMargin,
    doc = "DAU/MAU stickiness + new-vs-returning per day (product metrics)") { (s, dir) =>
    val ev = t(s, dir, "events")
    val f = ev.groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("first_day"))
    // f scales with users — keyed shuffle join, AQE picks the build side
    val d = ev.join(f, "user_id")
      .groupBy(col("ts").cast("date").as("day"), col("user_id"))
      .agg(min(when(col("ts").cast("date") === col("first_day"), 1)
        .otherwise(0)).as("is_new"))
    val mau = ev.agg(countDistinct(col("user_id")).cast("double").as("mau"))
    d.crossJoin(broadcast(mau))
      .groupBy(col("day"), col("mau"))
      .agg(count(lit(1)).as("dau"),
        sum(col("is_new")).cast("long").as("new_users"),
        (count(lit(1)) - sum(col("is_new"))).cast("long")
          .as("returning_users"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("dau"),
        col("new_users"), col("returning_users"),
        round(col("dau") / col("mau"), 6).as("stickiness"))
      .orderBy("day")
  }

  /** Week-over-week growth per event_type: weekly decimal-exact value
    * sums, then a type-keyed lag window over the (bounded) week grid
    * — growth rates are exact-sum ratios, NULL on the first week of
    * each type rather than a fake zero.
    */
  val qWowGrowth: QueryDef = QueryDef.sql(
    "q_wow_growth",
    """WITH w AS (
      |  SELECT event_type,
      |    strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
      |    CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS rev
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT event_type, week, rev,
      |    lag(rev) OVER (PARTITION BY event_type ORDER BY week) AS prev
      |  FROM w)
      |SELECT event_type, week, round(rev, 4) AS rev,
      |  round((rev - prev) / prev, 6) AS wow_growth
      |FROM g ORDER BY event_type, week""".stripMargin,
    doc = "week-over-week growth per type (keyed lag over the week grid)") { (s, dir) =>
    val w = t(s, dir, "events")
      .groupBy(col("event_type"),
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"))
      .agg(sum(col("value").cast("decimal(20,4)")).cast("double").as("rev"))
    val lagW = Window.partitionBy(col("event_type")).orderBy(col("week"))
    w.withColumn("prev", lag(col("rev"), 1).over(lagW))
      .select(col("event_type"), col("week"), round(col("rev"), 4).as("rev"),
        round((col("rev") - col("prev")) / col("prev"), 6).as("wow_growth"))
      .orderBy("event_type", "week")
  }

  /** Degree-day energy analytics
    * ([[EnergyAnalytics.degreeDays]]/[[EnergyAnalytics.weatherNormalizedModel]])
    * — the domain face the reference's empty `src/analytics/` package
    * implies: daily HDD/CDD from (synthetic, deterministic) site
    * weather joined to per-building daily consumption, then the
    * weather-normalization OLS (consumption ~ HDD) that separates
    * heating-driven load from baseload. Events stand in as meter
    * readings (user → building); daily mean temperature is the
    * engine-and-oracle-shared function 5 + epochDay % 30, spanning
    * both heating (T < 18) and cooling (T > 18) regimes. Sufficient
    * stats are decimal-exact in both engines, so slope/intercept
    * match to the rounding digit.
    */
  val qEnergyDegreeDays: QueryDef = QueryDef.sql(
    "q_energy_degree_days",
    """WITH daily AS (
      |  SELECT user_id AS building_id, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS y
      |  FROM events GROUP BY 1, 2),
      |dd AS (
      |  SELECT day,
      |    greatest(0.0, 18.0 - t) AS hdd, greatest(0.0, t - 18.0) AS cdd
      |  FROM (SELECT day, 5.0 + datediff('day', DATE '1970-01-01', day) % 30 AS t
      |        FROM (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events))),
      |xy AS (
      |  SELECT d.building_id, d.y, w.hdd, w.cdd
      |  FROM daily d JOIN dd w USING (day)),
      |st AS (
      |  SELECT building_id, count(*) AS n,
      |    CAST(sum(CAST(hdd AS DECIMAL(20,6))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(24,6))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(hdd * hdd AS DECIMAL(24,6))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(hdd * y AS DECIMAL(30,6))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(cdd AS DECIMAL(20,6))) AS DOUBLE) AS cdd_total
      |  FROM xy GROUP BY 1)
      |SELECT building_id, n AS n_days,
      |  CAST(round(sx, 6) AS DOUBLE) AS hdd_total,
      |  CAST(round(cdd_total, 6) AS DOUBLE) AS cdd_total,
      |  CAST(round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS DOUBLE)
      |    AS slope,
      |  CAST(round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
      |    / n, 6) AS DOUBLE) AS intercept
      |FROM st WHERE n >= 2 AND n * sxx - sx * sx <> 0
      |ORDER BY building_id""".stripMargin,
    doc = "degree-day analytics: daily HDD/CDD + weather-normalized consumption OLS per building") { (s, dir) =>
    val ev = t(s, dir, "events")
    val raw = ev.select(col("ts").as("timestamp"),
      col("user_id").as("building_id"), col("value").as("meter_reading"))
    val metadata = raw.select("building_id").distinct()
      .withColumn("site_id", lit(0L))
    // deterministic synthetic site weather: one daily observation,
    // T = 5 + epochDay % 30 (same function the oracle states)
    val weather = ev.select(to_date(col("ts")).as("d")).distinct()
      .select(col("d").cast("timestamp").as("timestamp"),
        lit(0L).as("site_id"),
        (lit(5.0) + pmod(datediff(col("d"),
          to_date(lit("1970-01-01"))), lit(30))).as("air_temperature"))
    EnergyAnalytics.weatherNormalizedModel(raw, metadata, weather,
        base = 18.0)
      .select(col("building_id"), col("n_days"),
        round(col("hdd_total"), 6).cast("double").as("hdd_total"),
        round(col("cdd_total"), 6).cast("double").as("cdd_total"),
        round(col("slope"), 6).cast("double").as("slope"),
        round(col("intercept"), 6).cast("double").as("intercept"))
      .orderBy("building_id")
  }

  val all: Seq[QueryDef] = Seq(
    qTimeWindow, qLagGaps, qOverlapSemi, qScalarFuncs, qJsonBuild, qSessionize,
    qMapFuncs, qAsofJoin, qAsofTolerance, qAsofForward, qAsofNearest,
    qRangeJoin, qRangeJoinSkew, qIntervalOverlap, qFunnel, qRetention,
    qGapFill, qInterpolate, qLoadProfile, qSlidingWindow, qForecastBaseline,
    qTrendOls, qAnomaliesSeasonal, qEwma, qEventPaths, qAcf, qCusum, qCcf,
    qTwa, qAttribution, qWindowDist, qMarkovTransitions, qAssocRules, qRfm,
    qBurstiness, qDauMau, qWowGrowth, qEnergyDegreeDays)
}
