package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import RelationalQueries.{dsum, dsumSql}

/** Aggregation coverage beyond the flagship grouped agg (SURVEY §2.4):
  * profiling-style global aggregates, collect/string aggs, conditional
  * ratios, CASE-gated math — the shapes the reference ran as SQL text
  * (`postgres_manager.py` monitoring queries, `schema_analyzer.py`
  * column stats) re-expressed for Catalyst.
  */
object AggregateQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** A3-A9: one-pass global profile of a table — count, distinct,
    * null count, min/max, max string length. The reference needed one
    * pandas pass per metric on a 10k sample (`schema_analyzer.py:77-88`);
    * here it's a single partial-aggregated pass over ALL rows (no
    * sampling needed at any scale — each metric is O(1) state).
    */
  val qProfileStats: QueryDef = QueryDef.sql(
    "q_profile_stats",
    """SELECT count(*) AS n_rows,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  count(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS n_null_status,
      |  CAST(min(o_totalprice) AS DOUBLE) AS min_price,
      |  CAST(max(o_totalprice) AS DOUBLE) AS max_price,
      |  max(length(o_orderpriority)) AS max_prio_len,
      |  strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
      |  strftime(max(o_orderdate), '%Y-%m-%d') AS max_date
      |FROM orders""".stripMargin,
    doc = "single-pass column profile (SURVEY A3-A9)") { (s, dir) =>
    t(s, dir, "orders").agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("o_custkey")).as("n_customers"),
      count(when(col("o_orderstatus").isNull, 1)).as("n_null_status"),
      min(col("o_totalprice")).cast("double").as("min_price"),
      max(col("o_totalprice")).cast("double").as("max_price"),
      max(length(col("o_orderpriority"))).as("max_prio_len"),
      date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("min_date"),
      date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("max_date"))
  }

  /** A11+A12: collect_set → sorted array and string_agg (reference
    * `array_agg(DISTINCT …)` `data_loader.py:418`, `string_agg`
    * `postgres_manager.py:1125`). sort_array makes the collected set
    * deterministic; at scale collect stays safe because group
    * cardinality (suppliers per nation) is bounded, not data-sized.
    */
  val qCollectAgg: QueryDef = QueryDef.sql(
    "q_collect_agg",
    """SELECT s_nationkey,
      |  count(*) AS n_suppliers,
      |  string_agg(s_name, ',' ORDER BY s_name) AS supplier_names
      |FROM supplier GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin,
    doc = "collect_set + string agg (SURVEY A11/A12)") { (s, dir) =>
    t(s, dir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        concat_ws(",", sort_array(collect_list(col("s_name"))))
          .as("supplier_names"))
      .orderBy("s_nationkey")
  }

  /** A14: conditional-sum ratios (reference cache-hit ratios,
    * `postgres_manager.py:896-920`): per event_type, the share of
    * high-value events, NULLIF-guarded against empty denominators.
    */
  val qCondRatios: QueryDef = QueryDef.sql(
    "q_cond_ratios",
    s"""SELECT event_type,
       |  ${dsumSql("CASE WHEN value > 50.0 THEN value ELSE 0 END")} AS high_sum,
       |  ${dsumSql("value")} AS total_sum,
       |  CAST(round(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
       |    / CAST(nullif(count(*), 0) AS DOUBLE), 6) AS DOUBLE) AS high_frac
       |FROM events GROUP BY event_type
       |ORDER BY event_type""".stripMargin,
    doc = "conditional sum ratios with NULLIF guard (SURVEY A14)") { (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        dsum(when(col("value") > 50.0, col("value")).otherwise(lit(0)))
          .as("high_sum"),
        dsum(col("value")).as("total_sum"),
        round(sum(when(col("value") > 50.0, 1).otherwise(0)) /
          nullif(count(lit(1)), lit(0)).cast("double"), 6)
          .cast("double").as("high_frac"))
      .orderBy("event_type")
  }

  /** A15: CASE-gated aggregate arithmetic (reference bloat math,
    * `postgres_manager.py:933-996`): per return flag, weighted
    * discount math with guarded division + GREATEST/COALESCE.
    */
  val qCaseAgg: QueryDef = QueryDef.sql(
    "q_case_agg",
    s"""SELECT l_returnflag,
       |  ${dsumSql("CASE WHEN l_discount > 0.05 THEN l_extendedprice * l_discount ELSE 0 END")} AS disc_value,
       |  CAST(greatest(max(l_quantity), 50.0) AS DOUBLE) AS cap_qty,
       |  CAST(round(coalesce(
       |      sum(CASE WHEN l_discount > 0.05 THEN CAST(l_quantity AS DECIMAL(20,4)) END), 0)
       |    / CAST(nullif(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END), 0) AS DOUBLE),
       |    6) AS DOUBLE) AS avg_disc_qty
       |FROM lineitem GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin,
    doc = "CASE-gated agg math (SURVEY A15)") { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        dsum(when(col("l_discount") > 0.05,
          col("l_extendedprice") * col("l_discount")).otherwise(lit(0)))
          .as("disc_value"),
        greatest(max(col("l_quantity")), lit(50.0)).cast("double").as("cap_qty"),
        round(coalesce(
            sum(when(col("l_discount") > 0.05,
              col("l_quantity").cast("decimal(20,4)"))), lit(0)) /
          nullif(sum(when(col("l_discount") > 0.05, 1).otherwise(0)), lit(0))
            .cast("double"), 6)
          .cast("double").as("avg_disc_qty"))
      .orderBy("l_returnflag")
  }

  /** A3: distinct pairs (reference `unique()` key-set extraction,
    * `data_loader.py:351-356`). At scale this is the one shuffle the
    * operator needs (hash on the pair).
    */
  val qDistinctPairs: QueryDef = QueryDef.sql(
    "q_distinct_pairs",
    """SELECT DISTINCT user_id, event_type FROM events
      |WHERE event_type IN ('signup', 'purchase')
      |ORDER BY user_id, event_type""".stripMargin,
    doc = "distinct key pairs (SURVEY A3)") { (s, dir) =>
    t(s, dir, "events")
      .filter(col("event_type").isin("signup", "purchase"))
      .select("user_id", "event_type")
      .distinct()
      .orderBy("user_id", "event_type")
  }

  /** O2: ORDER BY … NULLS LAST (reference `postgres_manager.py:994`)
    * over a manufactured nullable column.
    */
  val qSortNullsLast: QueryDef = QueryDef.sql(
    "q_sort_nulls_last",
    """SELECT event_id,
      |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |FROM events WHERE event_id <= 200
      |ORDER BY v DESC NULLS LAST, event_id""".stripMargin,
    doc = "sort with NULLS LAST (SURVEY O2)") { (s, dir) =>
    t(s, dir, "events")
      .filter(col("event_id") <= 200)
      .select(col("event_id"),
        when(col("event_type") === "error", lit(null)).otherwise(col("value"))
          .as("v"))
      .orderBy(col("v").desc_nulls_last, col("event_id"))
  }

  /** Ordered-set aggregates: exact interpolated percentiles per group
    * (Spark `percentile` ≡ DuckDB `quantile_cont`, both linear
    * interpolation on the sorted values). Rounded to 4 decimals — the
    * two engines may order the interpolation arithmetic differently
    * at the last ulp.
    */
  val qPercentiles: QueryDef = QueryDef.sql(
    "q_percentiles",
    """SELECT l_returnflag,
      |  CAST(round(quantile_cont(l_extendedprice, 0.5), 4) AS DOUBLE) AS median_price,
      |  CAST(round(quantile_cont(l_extendedprice, 0.95), 4) AS DOUBLE) AS p95_price,
      |  CAST(round(quantile_cont(l_quantity, 0.25), 4) AS DOUBLE) AS q1_qty
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin,
    doc = "exact interpolated percentiles per group (ordered-set aggs)") { (s, dir) =>
    // Exact percentile partials buffer every VALUE and merge them on
    // one reducer per group (~20M doubles per l_returnflag at 100×).
    // Collapse each measure to per-(group, value) counts first and
    // feed the frequency form — the Percentile aggregate builds this
    // exact value→count map internally, so the interpolated doubles
    // are unchanged — and the per-group final sees |distinct values|
    // rows (l_quantity: 50; replicated corpora keep price distincts
    // flat while rows multiply). Two pruned scans replace the Expand-
    // free single scan; both pre-aggregations are map-side combined.
    val li = t(s, dir, "lineitem")
    val pr = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_extendedprice"), lit(0.5), col("__c")), 4)
          .cast("double").as("median_price"),
        round(percentile(col("l_extendedprice"), lit(0.95), col("__c")), 4)
          .cast("double").as("p95_price"))
    val qt = li.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("l_returnflag"))
      .agg(round(percentile(col("l_quantity"), lit(0.25), col("__c")), 4)
        .cast("double").as("q1_qty"))
    pr.join(qt, Seq("l_returnflag"))
      .select("l_returnflag", "median_price", "p95_price", "q1_qty")
      .orderBy("l_returnflag")
  }

  /** Pivot: per-user event-type counts as columns — Spark's `pivot`
    * with an explicit value list (at scale the list must be explicit:
    * an inferred pivot runs a distinct scan first), oracled as the
    * conditional-aggregation twin every engine can express.
    */
  val qPivot: QueryDef = QueryDef.sql(
    "q_pivot",
    """SELECT user_id,
      |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events WHERE user_id <= 20
      |GROUP BY user_id ORDER BY user_id""".stripMargin,
    doc = "pivot event counts into columns (SURVEY §2.4 pivot)") { (s, dir) =>
    t(s, dir, "events")
      .filter(col("user_id") <= 20)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "purchase", "view"))
      .count()
      .na.fill(0L, Seq("click", "purchase", "view"))
      .orderBy("user_id")
  }

  /** A10 monotonicity, oracled: run the distributed range-partitioned
    * checker ([[graft.profile.Profiler.isMonotonic]]) over real
    * columns and emit its verdicts; the oracle recomputes the same
    * truths with SQL lag() over the full table. o_orderkey ordered by
    * itself is trivially nondecreasing; o_totalprice by key order is
    * not; o_orderdate by key order is data-dependent — all three must
    * agree with SQL exactly.
    */
  val qMonotonic: QueryDef = QueryDef.sql(
    "q_monotonic",
    """SELECT
      |  (bool_and(up_key) OR bool_and(down_key)) AS key_monotonic,
      |  (bool_and(up_price) OR bool_and(down_price)) AS price_monotonic,
      |  (bool_and(up_date) OR bool_and(down_date)) AS date_monotonic
      |FROM (
      |  SELECT
      |    o_orderkey >= lag(o_orderkey) OVER w AS up_key,
      |    o_orderkey <= lag(o_orderkey) OVER w AS down_key,
      |    o_totalprice >= lag(o_totalprice) OVER w AS up_price,
      |    o_totalprice <= lag(o_totalprice) OVER w AS down_price,
      |    o_orderdate >= lag(o_orderdate) OVER w AS up_date,
      |    o_orderdate <= lag(o_orderdate) OVER w AS down_date
      |  FROM orders WINDOW w AS (ORDER BY o_orderkey))
      |""".stripMargin,
    doc = "distributed monotonicity check vs SQL lag truth (SURVEY A10)") { (s, dir) =>
    import s.implicits._
    val orders = t(s, dir, "orders")
    Seq((
      graft.profile.Profiler.isMonotonic(orders, "o_orderkey", "o_orderkey"),
      graft.profile.Profiler.isMonotonic(orders, "o_totalprice", "o_orderkey"),
      graft.profile.Profiler.isMonotonic(
        orders.withColumn("d", col("o_orderdate").cast("timestamp").cast("long")),
        "d", "o_orderkey")))
      .toDF("key_monotonic", "price_monotonic", "date_monotonic")
  }

  /** Key-skew diagnosis (ops surface): hot-key shares + table skew
    * factor — what you check before keying a 100 TB shuffle on a
    * column. Deterministic ties by key.
    */
  val qSkewReport: QueryDef = QueryDef.sql(
    "q_skew_report",
    """WITH c AS (SELECT l_suppkey AS key, count(*) AS n FROM lineitem GROUP BY 1),
      |t AS (SELECT sum(n) AS total, count(*) AS nkeys, max(n) AS maxn FROM c)
      |SELECT key, n,
      |  CAST(round(n / CAST(total AS DOUBLE) * 100, 6) AS DOUBLE) AS pct_share,
      |  CAST(round(maxn * nkeys / CAST(total AS DOUBLE), 6) AS DOUBLE) AS skew_factor
      |FROM c CROSS JOIN t
      |ORDER BY n DESC, key LIMIT 10""".stripMargin,
    doc = "hot-key share + skew factor (pre-shuffle diagnosis, ops)") { (s, dir) =>
    graft.ops.EngineOps.keySkewReport(
      t(s, dir, "lineitem").select(col("l_suppkey")), "l_suppkey", topN = 10)
  }

  /** Equal-width histogram: IEEE-exact bin edges, clamped max bin. */
  val qHistogram: QueryDef = QueryDef.sql(
    "q_histogram",
    """WITH b AS (
      |  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
      |  FROM lineitem)
      |SELECT CAST(CASE WHEN hi = lo THEN 0
      |  ELSE least(floor((l_extendedprice - lo) / ((hi - lo) / 10)), 9)
      |  END AS BIGINT) AS bin, count(*) AS n
      |FROM lineitem CROSS JOIN b
      |WHERE l_extendedprice IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    doc = "equal-width histogram over a numeric column (profiling)") { (s, dir) =>
    graft.profile.Profiler.histogram(t(s, dir, "lineitem"),
      "l_extendedprice", nBins = 10)
  }

  /** Approximate profiling with an in-plan accuracy contract: the
    * sketches a 100 TB profile actually runs — HLL++ distinct
    * (`approx_count_distinct`, no Expand, O(1) state) and quantile
    * sketch (`approx_percentile`) — each computed alongside its exact
    * twin in the same scan, emitted as bound-check booleans. The
    * oracle recomputes the exact values and asserts the bounds hold,
    * so the sketch accuracy itself is gate-checked (the contract-
    * oracle pattern). At scale you drop the exact twins and keep the
    * sketches; the gate proves they were within tolerance where exact
    * is computable.
    */
  val qApproxProfile: QueryDef = QueryDef.sql(
    "q_approx_profile",
    """SELECT count(*) AS n_rows,
      |  count(DISTINCT l_suppkey) AS exact_suppkeys,
      |  count(DISTINCT l_partkey) AS exact_partkeys,
      |  true AS hll_suppkeys_ok, true AS hll_partkeys_ok,
      |  CAST(round(quantile_cont(l_extendedprice, 0.5), 6) AS DOUBLE) AS p50_price,
      |  CAST(round(quantile_cont(l_extendedprice, 0.95), 6) AS DOUBLE) AS p95_price,
      |  true AS approx_p50_ok, true AS approx_p95_ok
      |FROM lineitem""".stripMargin,
    doc = "HLL distinct + quantile sketch with gate-checked error bounds (approx profiling)") { (s, dir) =>
    val li = t(s, dir, "lineitem")
    def relOk(approx: Column, exact: Column, tol: Double): Column =
      (abs(approx.cast("double") - exact.cast("double")) /
        greatest(exact.cast("double"), lit(1.0))) <= tol
    // One combined aggregate forced (a) an Expand — every row tripled
    // for the two COUNT(DISTINCT)s — and (b) the killer: exact
    // `percentile` partials buffer EVERY value and merge them on ONE
    // final reducer (the whole 60M-value column crossing to a single
    // task at 100×; 13.6 s at 10×). Restated with identical outputs:
    // each column first collapses to (value, count) via a keyed,
    // map-side-combined groupBy, then
    //  - exact distincts = group counts,
    //  - HLL twins run over the DISTINCT values (duplicates never
    //    change HLL registers, so the estimate is bit-identical),
    //  - exact percentiles use the frequency form over (value, count)
    //    — the Percentile aggregate builds exactly this value→count
    //    map internally, so the interpolated doubles are unchanged —
    //    and the single final reducer now sees |distinct values| rows
    //    instead of |rows|.
    // The sketch-percentile twins keep their raw-scan pass (no
    // frequency form) — their partials are bounded-size summaries.
    val supp = li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("__c"))
      .agg(count(col("l_suppkey")).as("exact_suppkeys"), // nulls excluded, as COUNT(DISTINCT)
        approx_count_distinct(col("l_suppkey"), rsd = 0.02).as("hll_supp"),
        sum(col("__c")).as("n_rows")) // null group still counts rows
    val part = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("__c"))
      .agg(count(col("l_partkey")).as("exact_partkeys"),
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("hll_part"))
    val price = li.groupBy(col("l_extendedprice")).agg(count(lit(1)).as("__c"))
      .agg(
        percentile(col("l_extendedprice"), lit(0.5), col("__c")).as("ex_p50"),
        percentile(col("l_extendedprice"), lit(0.95), col("__c")).as("ex_p95"))
    val sketch = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
        .as("ap_p50"),
      percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000))
        .as("ap_p95"))
    supp.crossJoin(part).crossJoin(price).crossJoin(sketch)
      .select(
        col("n_rows"), col("exact_suppkeys"), col("exact_partkeys"),
        relOk(col("hll_supp"), col("exact_suppkeys"), 0.05)
          .as("hll_suppkeys_ok"),
        relOk(col("hll_part"), col("exact_partkeys"), 0.05)
          .as("hll_partkeys_ok"),
        round(col("ex_p50"), 6).cast("double").as("p50_price"),
        round(col("ex_p95"), 6).cast("double").as("p95_price"),
        relOk(col("ap_p50"), col("ex_p50"), 0.01).as("approx_p50_ok"),
        relOk(col("ap_p95"), col("ex_p95"), 0.01).as("approx_p95_ok"))
  }

  /** Bivariate profiling: Pearson correlation, sample covariance and
    * stddev between measure columns — single-pass co-moment aggregates
    * (one scan, O(1) state per pair). Rounded to absorb the ~1e-12
    * relative drift of distributed vs sequential co-moment merging.
    */
  val qCorrelations: QueryDef = QueryDef.sql(
    "q_correlations",
    """SELECT
      |  CAST(round(corr(l_quantity, l_extendedprice), 4) AS DOUBLE) AS corr_qty_price,
      |  CAST(round(corr(l_discount, l_extendedprice), 4) AS DOUBLE) AS corr_disc_price,
      |  CAST(round(covar_samp(l_quantity, l_extendedprice), 2) AS DOUBLE) AS cov_qty_price,
      |  CAST(round(stddev_samp(l_extendedprice), 2) AS DOUBLE) AS sd_price
      |FROM lineitem""".stripMargin,
    doc = "correlation / covariance / stddev profiling pass (bivariate stats)") { (s, dir) =>
    t(s, dir, "lineitem").agg(
      round(corr(col("l_quantity"), col("l_extendedprice")), 4)
        .cast("double").as("corr_qty_price"),
      round(corr(col("l_discount"), col("l_extendedprice")), 4)
        .cast("double").as("corr_disc_price"),
      round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
        .cast("double").as("cov_qty_price"),
      round(stddev_samp(col("l_extendedprice")), 2)
        .cast("double").as("sd_price"))
  }

  /** Heavy hitters via the native Space-Saving aggregate
    * (`plans.SpaceSavingTopK`, O(k) state — no billion-key groupBy
    * shuffle): a 50%-hot key against a long cold tail forces real
    * counter eviction, and the contract oracle checks the sketch's
    * guarantees against the exact in-plan count — hot key retained,
    * upper bound ≥ truth ≥ upper − error, summary exactly k wide.
    */
  val qHeavyHitters: QueryDef = QueryDef.sql(
    "q_heavy_hitters",
    """SELECT
      |  (SELECT count(*) FROM lineitem WHERE l_orderkey % 2 = 0) AS exact_hot,
      |  true AS in_summary, true AS upper_ok, true AS lower_ok,
      |  16 AS n_counters""".stripMargin,
    doc = "space-saving heavy-hitter sketch vs exact truth (contract oracle)") { (s, dir) =>
    val keyed = t(s, dir, "lineitem").select(
      when(col("l_orderkey") % 2 === 0, lit("hot"))
        .otherwise(concat(lit("cold_"), col("l_orderkey"))).as("key"))
    val summary = keyed.agg(
      call_function("space_saving_topk", col("key"), lit(16)).as("s"))
    val exact = keyed.filter(col("key") === "hot")
      .agg(count(lit(1)).as("exact_hot"))
    // try_element_at: on a degenerate corpus where the probed key is
    // absent the filter yields an empty array, and under ANSI a plain
    // element_at(…, 1) would abort the job instead of yielding nulls
    val hotEntry = try_element_at(
      filter(col("s"), e => e("key") === "hot"), lit(1))
    summary.crossJoin(exact).select(
      col("exact_hot"),
      exists(col("s"), e => e("key") === "hot").as("in_summary"),
      (hotEntry("est") >= col("exact_hot")).as("upper_ok"),
      (hotEntry("est") - hotEntry("err") <= col("exact_hot")).as("lower_ok"),
      size(col("s")).as("n_counters"))
  }

  /** Mergeable quantile sample via the native bottom-k aggregate
    * ([[graft.plans.BottomKSample]]): the k rows with the smallest
    * fixed-permutation priority are a uniform sample whose selection
    * is a pure min-k SET operation — associative, commutative,
    * deterministic under ANY partitioning/merge order, which is what
    * KLL/t-digest compaction cannot offer and what makes an EXACT
    * oracle possible: DuckDB re-derives the identical sample with a
    * window rank over the same Knuth-multiplicative priority, then
    * reads the same order statistics. O(k) state per group per
    * partition; the exchange ships k pairs per group, not the rows.
    */
  val qQuantileSample: QueryDef = QueryDef.sql(
    "q_quantile_sample",
    """WITH pri AS (
      |  SELECT l_returnflag,
      |    (((l_orderkey*8 + l_linenumber) % 2147483648) * 2654435761)
      |      % 4294967296 AS p,
      |    l_extendedprice AS v
      |  FROM lineitem),
      |keep AS (
      |  SELECT l_returnflag, v,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY p, v) AS rn
      |  FROM pri),
      |ranked AS (
      |  SELECT l_returnflag, v,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rv
      |  FROM keep WHERE rn <= 64)
      |SELECT l_returnflag,
      |  max(CASE WHEN rv = 16 THEN v END) AS p25,
      |  max(CASE WHEN rv = 32 THEN v END) AS p50,
      |  max(CASE WHEN rv = 48 THEN v END) AS p75,
      |  CAST(count(*) AS INTEGER) AS k
      |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin,
    doc = "bottom-k (KMV) mergeable quantile sample, exact-oracled order statistics") { (s, dir) =>
    // rowid is bounded to 2^31 BEFORE the Knuth multiply so the
    // product stays under 2^63 at any replica scale (ANSI mode throws
    // on long overflow); both engines compute the identical priority
    val rowid = (col("l_orderkey") * 8 + col("l_linenumber")) % 2147483648L
    val sampled = t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        ((rowid * 2654435761L) % 4294967296L).as("p"),
        col("l_extendedprice").as("v"))
      .groupBy("l_returnflag")
      .agg(call_function("bottom_k_sample", col("v"), col("p"), lit(64))
        .as("s"))
    sampled.select(col("l_returnflag"),
      sort_array(transform(col("s"), e => e("v"))).as("vs"),
      size(col("s")).as("k"))
      // try_element_at: a group with <48 sampled rows has no such
      // order statistic — null, matching the oracle's CASE (a plain
      // element_at would ANSI-throw on the degenerate group)
      .select(col("l_returnflag"),
        try_element_at(col("vs"), lit(16)).as("p25"),
        try_element_at(col("vs"), lit(32)).as("p50"),
        try_element_at(col("vs"), lit(48)).as("p75"),
        col("k"))
      .orderBy("l_returnflag")
  }

  /** Per-key frequencies from a Count-Min sketch — Spark's built-in
    * mergeable `count_min_sketch` aggregate (O(depth·width) partial
    * state, no per-key shuffle) probed in-plan by the native
    * `cms_query` expression ([[graft.plans.CmsQuery]] — the probe half
    * Spark doesn't ship). Contract oracle: CMS estimates are one-sided
    * (`est ≥ true` unconditionally) and `est ≤ true + eps·N` at
    * confidence 0.99 — both checked per key against the exact in-plan
    * groupBy truth, which DuckDB recomputes.
    */
  val qCmsCounts: QueryDef = QueryDef.sql(
    "q_cms_counts",
    """SELECT event_type, count(*) AS exact_n,
      |  true AS lower_ok, true AS upper_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    doc = "count-min sketch point estimates vs exact truth (contract oracle)") { (s, dir) =>
    val ev = t(s, dir, "events").select(col("event_type"))
    val sk = ev.agg(
      graft.plans.Cms.sketch(col("event_type"), 0.001, 0.99, 42).as("cms"),
      count(lit(1)).as("n"))
    val truths = ev.groupBy("event_type").agg(count(lit(1)).as("exact_n"))
    val est = graft.plans.Cms.query(col("cms"), col("event_type"))
    truths.crossJoin(broadcast(sk)).select(
      col("event_type"), col("exact_n"),
      (est >= col("exact_n")).as("lower_ok"),
      (est <= col("exact_n") + ceil(lit(0.001) * col("n"))).as("upper_ok"))
      .orderBy("event_type")
  }

  /** Distinct-count estimation via the Datasketches HLL pair Spark 4
    * ships (`hll_sketch_agg` → mergeable sketch, `hll_sketch_estimate`
    * → number): the sketch form of `count(DISTINCT …)` — O(2^lgK)
    * partial state per partition, no distinct-key shuffle, and unlike
    * `approx_count_distinct` the intermediate SKETCH is a value that
    * can be stored and unioned across days ([`hll_union`]). Contract
    * oracle: estimate within ±5% of the exact count (lgK=12 → ~1.6%
    * standard error; 3σ ≈ 4.9%).
    */
  val qHllDistinct: QueryDef = QueryDef.sql(
    "q_hll_distinct",
    """SELECT count(DISTINCT o_custkey) AS exact_distinct,
      |  true AS est_ok
      |FROM orders""".stripMargin,
    doc = "HLL sketch distinct estimate vs exact truth (contract oracle)") { (s, dir) =>
    t(s, dir, "orders").agg(
      countDistinct(col("o_custkey")).as("exact_distinct"),
      call_function("hll_sketch_estimate",
        call_function("hll_sketch_agg", col("o_custkey"), lit(12)))
        .as("hll_est"))
      .select(col("exact_distinct"),
        (abs(col("hll_est") - col("exact_distinct")).cast("double")
          <= lit(0.05) * col("exact_distinct")).as("est_ok"))
  }

  /** HLL set-intersection estimate by inclusion-exclusion — audience
    * overlap ("how many users both click AND purchase") answered from
    * three KB-sized sketches instead of a corpus join: |A∩B| ≈
    * est(A) + est(B) − est(A∪B), the standard mergeable-sketch trick
    * (Datasketches HLL has no native intersection). Contract oracle:
    * the estimate lands within ±10% of the exact overlap (lgK = 12 →
    * ~1.6% per term; inclusion-exclusion compounds to ~3× that on
    * same-magnitude sets; measured ≲2% here). At 100 TB each side is
    * one sketch-aggregate scan — the overlap query never joins.
    */
  val qHllOverlap: QueryDef = QueryDef.sql(
    "q_hll_overlap",
    """SELECT count(*) AS exact_overlap, true AS est_ok FROM (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      |  INTERSECT
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')""".stripMargin,
    doc = "HLL inclusion-exclusion audience overlap vs exact truth (contract oracle)") { (s, dir) =>
    val ev = t(s, dir, "events")
    def sk(tpe: String) = ev.filter(col("event_type") === tpe)
      .agg(call_function("hll_sketch_agg", col("user_id"), lit(12))
        .as(s"sk_$tpe"))
    val exact = ev.filter(col("event_type") === "click")
      .select(col("user_id")).distinct()
      .join(ev.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct(), Seq("user_id"), "left_semi")
      .agg(count(lit(1)).as("exact_overlap"))
    exact.crossJoin(sk("click")).crossJoin(sk("purchase"))
      .select(col("exact_overlap"),
        (call_function("hll_sketch_estimate", col("sk_click")) +
          call_function("hll_sketch_estimate", col("sk_purchase")) -
          call_function("hll_sketch_estimate",
            call_function("hll_union", col("sk_click"), col("sk_purchase"))))
          .as("est"))
      .select(col("exact_overlap"),
        (abs(col("est") - col("exact_overlap")).cast("double")
          <= lit(0.10) * col("exact_overlap")).as("est_ok"))
  }

  /** Benford first-digit screen over l_extendedprice — the classic
    * fabricated-data detector for multiplicative quantities: observed
    * first-significant-digit counts vs N·log₁₀(1+1/d), plus the χ²
    * statistic. Digit extraction goes through a DECIMAL(18,2) cast and
    * its positional string form in BOTH engines (float→string
    * shortest-repr and log10-edge floor are both engine-dependent —
    * the decimal detour is the deterministic path). χ² terms are
    * decimal-cast before summing.
    */
  val qBenford: QueryDef = QueryDef.sql(
    "q_benford",
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |    AS VARCHAR), 1, 1) AS INT) AS digit
      |  FROM lineitem WHERE l_extendedprice > 0),
      |o AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
      |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM o),
      |e AS (
      |  SELECT o.digit, o.n_obs, t.n * log10(1 + 1.0 / o.digit) AS exp_n
      |  FROM o CROSS JOIN t),
      |x AS (
      |  SELECT CAST(sum(CAST((n_obs - exp_n) * (n_obs - exp_n) / exp_n
      |    AS DECIMAL(28,10))) AS DOUBLE) AS chi2 FROM e)
      |SELECT e.digit, e.n_obs,
      |  CAST(round(e.exp_n, 4) AS DOUBLE) AS exp_n,
      |  CAST(round(x.chi2, 4) AS DOUBLE) AS chi2
      |FROM e CROSS JOIN x ORDER BY e.digit""".stripMargin,
    doc = "Benford first-digit distribution + chi-square over prices (data-quality screen)") { (s, dir) =>
    val d = t(s, dir, "lineitem")
      .filter(col("l_extendedprice") > 0)
      .select(substring(col("l_extendedprice").cast("decimal(18,2)")
        .cast("string"), 1, 1).cast("int").as("digit"))
    val o = d.groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val tot = o.agg(sum(col("n_obs")).as("n"))
    val e = o.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        (col("n") * log10(lit(1) + lit(1.0) / col("digit"))).as("exp_n"))
    val x = e.agg(
      sum(((col("n_obs") - col("exp_n")) * (col("n_obs") - col("exp_n"))
        / col("exp_n")).cast("decimal(28,10)")).cast("double").as("chi2"))
    e.crossJoin(broadcast(x))
      .select(col("digit"), col("n_obs"),
        round(col("exp_n"), 4).cast("double").as("exp_n"),
        round(col("chi2"), 4).cast("double").as("chi2"))
      .orderBy("digit")
  }

  /** Functional-dependency violation report: does source determine
    * lang? For every source carrying more than one language, the doc
    * count outside its majority language — the profiling primitive
    * behind "is this column a key / is this mapping clean" checks
    * (reference's schema_analyzer intent, scaled: one count shuffle,
    * O(|source|) output).
    */
  val qFdViolations: QueryDef = QueryDef.sql(
    "q_fd_violations",
    """WITH c AS (
      |  SELECT source, lang, count(*) AS cnt FROM documents GROUP BY 1, 2),
      |a AS (
      |  SELECT source, count(*) AS n_langs,
      |    CAST(sum(cnt) AS BIGINT) AS n_docs, max(cnt) AS maj
      |  FROM c GROUP BY source)
      |SELECT source, n_langs, n_docs, n_docs - maj AS n_violations
      |FROM a WHERE n_langs > 1 ORDER BY source""".stripMargin,
    doc = "functional-dependency (source->lang) violation report (data profiling)") { (s, dir) =>
    val c = t(s, dir, "documents")
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("cnt"))
    c.groupBy(col("source"))
      .agg(count(lit(1)).as("n_langs"), sum(col("cnt")).as("n_docs"),
        max(col("cnt")).as("maj"))
      .filter(col("n_langs") > 1)
      .select(col("source"), col("n_langs"), col("n_docs"),
        (col("n_docs") - col("maj")).as("n_violations"))
      .orderBy("source")
  }

  /** The pre-aggregated sketch pattern ([[graft.profile.SketchRollup]])
    * proven in-plan: per-day HLL sketches `hll_union_agg`'d back
    * together estimate within the lgK=12 error bound of the exact
    * distinct count, and within that same bound of the one-shot global
    * sketch. (Not estimate EQUALITY: below the sparse threshold a
    * direct sketch stays in exact coupon mode while a union result is
    * promoted to HLL registers — the estimates legitimately differ by
    * up to the register-mode error, observed at sf0.1's 1500 users.)
    * This is the identity that lets a 100 TB deployment answer
    * any-date-range distinct queries from KB-sized day summaries
    * instead of rescanning history.
    */
  val qSketchRollup: QueryDef = QueryDef.sql(
    "q_sketch_rollup",
    """SELECT count(DISTINCT user_id) AS exact_users,
      |  true AS merge_ok, true AS est_ok
      |FROM events""".stripMargin,
    doc = "per-day HLL sketches union vs global sketch + bounded estimate (contract oracle)") { (s, dir) =>
    val ev = t(s, dir, "events")
    val daily = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(call_function("hll_sketch_agg", col("user_id"), lit(12)).as("sk"))
    val unionEst = daily.agg(call_function("hll_sketch_estimate",
      call_function("hll_union_agg", col("sk"))).as("est_union"))
    val globals = ev.agg(
      countDistinct(col("user_id")).as("exact_users"),
      call_function("hll_sketch_estimate",
        call_function("hll_sketch_agg", col("user_id"), lit(12)))
        .as("est_global"))
    unionEst.crossJoin(globals).select(
      col("exact_users"),
      (abs(col("est_union") - col("est_global")).cast("double")
        <= lit(0.05) * col("exact_users")).as("merge_ok"),
      (abs(col("est_union") - col("exact_users")).cast("double")
        <= lit(0.05) * col("exact_users")).as("est_ok"))
  }

  /** The ADDITIVE pre-aggregation pattern
    * ([[graft.profile.MetricsRollup]]) proven in-plan with a true
    * value-equality oracle: per-(day, event_type) count/decimal-sum/
    * min/max rows re-aggregated over a 15-day subrange must EQUAL the
    * direct aggregate of the raw rows — exactly, not within a bound,
    * because counts add, decimal sums add, and min/max compose. The
    * identity that lets a 100 TB deployment answer any-date-range
    * dashboard aggregates from day-summary rows instead of rescanning
    * history ([[qSketchRollup]] is the approximate-family sibling).
    */
  val qMetricsRollup: QueryDef = QueryDef.sql(
    "q_metrics_rollup",
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total,
      |  min(value) AS vmin, max(value) AS vmax,
      |  CAST(round(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
      |    / count(*), 6) AS DOUBLE) AS vavg
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-22'
      |GROUP BY event_type ORDER BY event_type""".stripMargin,
    doc = "additive day-rollup range read == direct aggregate (exact-equality oracle)") { (s, dir) =>
    import graft.profile.MetricsRollup
    val rollup = MetricsRollup.dailyMetrics(
      t(s, dir, "events"), "ts", Seq("event_type"), "value")
    MetricsRollup.metricsRange(rollup, "2024-01-08", "2024-01-22",
      Seq("event_type"))
      .select(col("event_type"), col("n"), col("total"),
        col("vmin"), col("vmax"),
        round(col("vavg"), 6).cast("double").as("vavg"))
      .orderBy("event_type")
  }

  /** N-sigma anomaly detection per group with ENGINE-EXACT moments:
    * built-in stddev is an order-sensitive double fold, so mean and
    * variance derive from decimal sums instead (sum v, sum v² with the
    * square taken in IEEE then summed exactly) — the same rational
    * numbers in both engines, hence identical outlier sets. The shape
    * every monitoring pipeline runs: one aggregate pass + one
    * broadcast-back filter pass.
    */
  val qAnomalies: QueryDef = QueryDef.sql(
    "q_anomalies",
    """WITH s AS (
      |  SELECT event_type,
      |    count(value) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sv,
      |    CAST(sum(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE) AS svv
      |  FROM events GROUP BY event_type)
      |SELECT e.event_id, e.event_type, e.value
      |FROM events e JOIN s ON e.event_type = s.event_type
      |WHERE abs(e.value - sv / n) >
      |  3.0 * sqrt((svv - sv * sv / n) / (n - 1))
      |ORDER BY e.event_id""".stripMargin,
    doc = "n-sigma outliers per group, decimal-exact moments (monitoring)") { (s, dir) =>
    val ev = t(s, dir, "events")
    val stats = ev.groupBy(col("event_type")).agg(
      count(col("value")).as("n"),
      sum(col("value").cast("decimal(30,6)")).cast("double").as("sv"),
      sum((col("value") * col("value")).cast("decimal(30,6)"))
        .cast("double").as("svv"))
    ev.join(broadcast(stats), "event_type")
      .filter(abs(col("value") - col("sv") / col("n")) >
        lit(3.0) * sqrt((col("svv") - col("sv") * col("sv") / col("n"))
          / (col("n") - 1)))
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** Referential-integrity audit: orphan counts across the star
    * schema's FK edges as two anti-join aggregates — the cheap
    * pre-flight a warehouse runs before trusting a join's
    * completeness. Anti-joins shuffle on their keys; nothing
    * quadratic.
    */
  val qFkOrphans: QueryDef = QueryDef.sql(
    "q_fk_orphans",
    """SELECT
      |  (SELECT count(*) FROM lineitem l LEFT JOIN orders o
      |     ON l.l_orderkey = o.o_orderkey
      |   WHERE o.o_orderkey IS NULL) AS orphan_lineitems,
      |  (SELECT count(*) FROM orders o LEFT JOIN customer c
      |     ON o.o_custkey = c.c_custkey
      |   WHERE c.c_custkey IS NULL) AS orphan_orders""".stripMargin,
    doc = "FK orphan audit across star-schema edges (data quality)") { (s, dir) =>
    val li = t(s, dir, "lineitem").select(col("l_orderkey"))
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer").select(col("c_custkey"))
    val a = li.join(ord.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_lineitems"))
    val b = ord.select(col("o_custkey").as("c_custkey"))
      .join(cust, Seq("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_orders"))
    a.crossJoin(b)
  }

  /** Robust anomaly detection via the modified z-score (Iglewicz &
    * Hoaglin): 0.6745·|v − median| / MAD > 3.5 per group — the
    * median/MAD twin of [[qAnomalies]]'s mean/σ rule, immune to the
    * outliers it hunts (one broken meter inflates σ and hides itself;
    * it cannot move the median). Exactness rides on the interpolated-
    * percentile parity [[qPercentiles]] pins: both medians are the
    * same rational interpolation in both engines, deviations are
    * identical doubles, so the flagged set matches row for row.
    * Shape: two aggregate passes + one broadcast-back filter — group
    * medians are O(groups) and broadcast, never a global sort.
    */
  val qAnomaliesMad: QueryDef = QueryDef.sql(
    "q_anomalies_mad",
    """WITH m AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY 1),
      |d AS (
      |  SELECT e.event_type, min(m.med) AS med,
      |    quantile_cont(abs(e.value - m.med), 0.5) AS mad
      |  FROM events e JOIN m USING (event_type)
      |  GROUP BY e.event_type)
      |SELECT e.event_id, e.event_type, e.value
      |FROM events e JOIN d USING (event_type)
      |WHERE 0.6745 * abs(e.value - d.med) / d.mad > 3.5
      |ORDER BY e.event_id""".stripMargin,
    doc = "robust outliers via median/MAD modified z-score (monitoring)") { (s, dir) =>
    val ev = t(s, dir, "events")
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = ev.join(broadcast(med), "event_type")
      .groupBy(col("event_type"))
      .agg(min(col("med")).as("med"),
        expr("percentile(abs(value - med), 0.5)").as("mad"))
    ev.join(broadcast(mad), "event_type")
      .filter(lit(0.6745) * abs(col("value") - col("med")) / col("mad")
        > 3.5)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** Exact order statistics WITHOUT a global sort
    * ([[graft.profile.Selection.kthSmallest]]): the k-th smallest
    * price at the lower-median and p95 ranks via iterative histogram
    * refinement — ~3 aggregation passes of 256 map-side-combined
    * counters each, versus `percentile`'s per-group value buffer or a
    * full range-exchange sort. The oracle states the same rank as a
    * row_number selection; both engines must produce the identical
    * dataset element (a real double from the column, not an
    * interpolation), so a single off-by-one in the refinement
    * bookkeeping hash-fails.
    */
  val qKthSmallest: QueryDef = QueryDef.sql(
    "q_kth_smallest",
    """WITH s AS (
      |  SELECT l_extendedprice AS v,
      |    row_number() OVER (ORDER BY l_extendedprice) AS rn,
      |    count(*) OVER () AS n
      |  FROM lineitem)
      |SELECT q, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k, value
      |FROM (
      |  SELECT 'p50' AS q, max(n) AS n, (max(n) + 1) // 2 AS k,
      |    min(v) AS value
      |  FROM s WHERE rn >= (n + 1) // 2
      |  UNION ALL
      |  SELECT 'p95' AS q, max(n) AS n,
      |    CAST(ceil(max(n) * 0.95) AS BIGINT) AS k, min(v) AS value
      |  FROM s WHERE rn >= CAST(ceil(n * 0.95) AS BIGINT))
      |ORDER BY q""".stripMargin,
    doc = "exact k-th smallest via histogram refinement (no global sort, no value buffer)") { (s, dir) =>
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val n = li.count()
    val k50 = (n + 1) / 2
    val k95 = math.ceil(n * 0.95).toLong
    val v50 = graft.profile.Selection.kthSmallest(li, "l_extendedprice", k50)
    val v95 = graft.profile.Selection.kthSmallest(li, "l_extendedprice", k95)
    Seq(("p50", n, k50, v50), ("p95", n, k95, v95))
      .toDF("q", "n", "k", "value").orderBy("q")
  }

  /** Revenue concentration: Gini coefficient and Herfindahl index over
    * per-customer revenue. Gini needs every customer's GLOBAL revenue
    * rank — computed without a global sort: customers bucket by a
    * range-derived revenue grid (monotone, so equal revenues share a
    * bucket), rank = in-bucket row_number (window keyed by bucket) +
    * broadcast lower-bucket count offsets — the q_mannwhitney prefix
    * shape again, here feeding Σ rank·x. The rank-weighted sum and the
    * squared-share sum are decimal-exact; the oracle states ranks as a
    * plain row_number and must agree to the last hash.
    */
  val qGini: QueryDef = QueryDef.sql(
    "q_gini",
    """WITH r AS (
      |  SELECT o_custkey,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |w AS (
      |  SELECT rev, row_number() OVER (ORDER BY rev, o_custkey) AS rk
      |  FROM r),
      |a AS (
      |  SELECT count(*) AS n, CAST(sum(rev) AS DOUBLE) AS t,
      |    CAST(sum(CAST(rk AS DECIMAL(38,2)) * rev) AS DECIMAL(38,2))
      |      AS s,
      |    CAST(sum(CAST(rev AS DECIMAL(38,4)) * rev) AS DECIMAL(38,4))
      |      AS sxx
      |  FROM w)
      |SELECT n, round(t, 2) AS total,
      |  round(2 * CAST(s AS DOUBLE) / (n * t) - (n + 1.0) / n, 6)
      |    AS gini,
      |  round(CAST(sxx AS DOUBLE) / (t * t), 8) AS hhi
      |FROM a""".stripMargin,
    doc = "Gini + Herfindahl revenue concentration (distributed ranks, no global sort)") { (s, dir) =>
    val r = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val bounds = r.agg(min(col("rev").cast("double")).as("lo"),
      max(col("rev").cast("double")).as("hi"))
    val bucketed = r.crossJoin(broadcast(bounds))
      .withColumn("__b",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(floor((col("rev").cast("double") - col("lo"))
            / (col("hi") - col("lo")) * 256).cast("long"), lit(255L))))
      .drop("lo", "hi")
    val inW = Window.partitionBy(col("__b"))
      .orderBy(col("rev"), col("o_custkey"))
    val offW = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .select(col("__b"), col("__off"))
    val ranked = bucketed.join(broadcast(offsets), Seq("__b"))
      .withColumn("rk", row_number().over(inW) + col("__off"))
    val a = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("rev")).cast("double").as("t"),
      sum(col("rk").cast("decimal(38,2)") * col("rev"))
        .cast("decimal(38,2)").as("s"),
      sum(col("rev").cast("decimal(38,4)") * col("rev"))
        .cast("decimal(38,4)").as("sxx"))
    a.select(col("n"), round(col("t"), 2).as("total"),
      round(lit(2) * col("s").cast("double") / (col("n") * col("t"))
        - (col("n") + 1.0) / col("n"), 6).as("gini"),
      round(col("sxx").cast("double") / (col("t") * col("t")), 8)
        .as("hhi"))
  }

  /** K-anonymity audit over quasi-identifiers (nation × market
    * segment): every equivalence class smaller than k = 10 is a
    * re-identification risk — the privacy-governance check a release
    * pipeline runs before publishing "anonymized" data. One grouped
    * count plus a broadcast total; the report lists violating classes
    * and the overall at-risk row share (integer-ratio double).
    */
  val qKAnonymity: QueryDef = QueryDef.sql(
    "q_k_anonymity",
    """WITH g AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS class_size
      |  FROM customer GROUP BY 1, 2),
      |tot AS (
      |  SELECT CAST(sum(class_size) AS DOUBLE) AS n,
      |    CAST(sum(CASE WHEN class_size < 10 THEN class_size ELSE 0 END)
      |      AS BIGINT) AS at_risk
      |  FROM g)
      |SELECT g.c_nationkey, g.c_mktsegment, g.class_size,
      |  tot.at_risk AS total_at_risk,
      |  round(tot.at_risk / tot.n, 6) AS at_risk_share
      |FROM g CROSS JOIN tot
      |WHERE g.class_size < 10
      |ORDER BY g.c_nationkey, g.c_mktsegment""".stripMargin,
    doc = "k-anonymity violations over quasi-identifier classes (privacy audit)") { (s, dir) =>
    val g = t(s, dir, "customer")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("class_size"))
    val tot = g.agg(
      sum(col("class_size")).cast("double").as("n"),
      sum(when(col("class_size") < 10, col("class_size")).otherwise(0L))
        .cast("long").as("at_risk"))
    g.crossJoin(broadcast(tot))
      .filter(col("class_size") < 10)
      .select(col("c_nationkey"), col("c_mktsegment"), col("class_size"),
        col("at_risk").as("total_at_risk"),
        round(col("at_risk") / col("n"), 6).as("at_risk_share"))
      .orderBy("c_nationkey", "c_mktsegment")
  }

  /** ABC (Pareto) classification of parts by revenue: class A carries
    * the first 80% of cumulative revenue, B to 95%, C the tail — the
    * inventory-prioritization rollup. The global revenue-descending
    * cumulative sum reuses the deterministic bucket decomposition
    * (monotone grid on revenue, in-bucket keyed windows, broadcast
    * bucket offsets — q_gini's rank machinery carrying SUMS instead of
    * counts); class boundaries test the EXCLUSIVE prefix so the
    * crossing part stays in the class it starts in. All decimal-exact
    * until the final share division.
    */
  val qAbcClasses: QueryDef = QueryDef.sql(
    "q_abc_classes",
    """WITH r AS (
      |  SELECT l_partkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      |  FROM lineitem GROUP BY 1),
      |w AS (
      |  SELECT rev,
      |    sum(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum
      |  FROM r),
      |tot AS (SELECT sum(rev) AS total FROM r),
      |c AS (
      |  SELECT CASE WHEN (cum - rev) * 100 < total * 80 THEN 'A'
      |              WHEN (cum - rev) * 100 < total * 95 THEN 'B'
      |              ELSE 'C' END AS abc, rev
      |  FROM w CROSS JOIN tot)
      |SELECT abc, count(*) AS n_parts,
      |  round(CAST(sum(rev) AS DOUBLE) /
      |    (SELECT CAST(total AS DOUBLE) FROM tot), 6) AS rev_share
      |FROM c GROUP BY abc ORDER BY abc""".stripMargin,
    doc = "ABC/Pareto revenue classes via bucket-decomposed cumulative sums") { (s, dir) =>
    val r = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
    val bounds = r.agg(min(col("rev").cast("double")).as("lo"),
      max(col("rev").cast("double")).as("hi"))
    // bucket on DESCENDING revenue: lower bucket = larger revenue
    val bucketed = r.crossJoin(broadcast(bounds))
      .withColumn("__b",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(floor((col("hi") - col("rev").cast("double"))
            / (col("hi") - col("lo")) * 256).cast("long"), lit(255L))))
      .drop("lo", "hi")
    val inW = Window.partitionBy(col("__b"))
      .orderBy(col("rev").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offW = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__b"))
      .agg(sum(col("rev")).as("__bsum"))
      .withColumn("__off", coalesce(sum(col("__bsum")).over(offW),
        lit(BigDecimal(0))))
      .select(col("__b"), col("__off"))
    val tot = r.agg(sum(col("rev")).as("total"))
    val c = bucketed.join(broadcast(offsets), Seq("__b"))
      .withColumn("cum", sum(col("rev")).over(inW) + col("__off"))
      .crossJoin(broadcast(tot))
      .select(col("rev"),
        when((col("cum") - col("rev")) * 100 < col("total") * 80, "A")
          .when((col("cum") - col("rev")) * 100 < col("total") * 95, "B")
          .otherwise("C").as("abc"), col("total"))
    c.groupBy("abc")
      .agg(count(lit(1)).as("n_parts"),
        round(sum(col("rev")).cast("double")
          / max(col("total")).cast("double"), 6).as("rev_share"))
      .orderBy("abc")
  }

  /** Discount-band effect: quantity and price means per discount
    * quartile — the banded-group comparison behind "does discounting
    * move volume". Quartile cuts are broadcast percentile thresholds
    * (the q_rfm shape — no global ntile funnel); band means are
    * decimal-sum/count doubles.
    */
  val qDiscountEffect: QueryDef = QueryDef.sql(
    "q_discount_effect",
    """WITH cut AS (
      |  SELECT quantile_cont(l_discount, 0.25) AS c1,
      |    quantile_cont(l_discount, 0.5) AS c2,
      |    quantile_cont(l_discount, 0.75) AS c3
      |  FROM lineitem),
      |b AS (
      |  SELECT 1 + (l_discount > c1)::INT + (l_discount > c2)::INT
      |    + (l_discount > c3)::INT AS band,
      |    l_quantity, l_extendedprice
      |  FROM lineitem, cut)
      |SELECT band, count(*) AS n,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE)
      |    / count(*), 6) AS mean_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE)
      |    / count(*), 6) AS mean_price
      |FROM b GROUP BY band ORDER BY band""".stripMargin,
    doc = "quantity/price means per discount quartile (banded comparison)") { (s, dir) =>
    val li = t(s, dir, "lineitem")
    val cut = li.agg(expr("percentile(l_discount, 0.25)").as("c1"),
      expr("percentile(l_discount, 0.5)").as("c2"),
      expr("percentile(l_discount, 0.75)").as("c3"))
    val band = lit(1) +
      Seq("c1", "c2", "c3").map(c =>
        when(col("l_discount") > col(c), 1).otherwise(0)).reduce(_ + _)
    li.crossJoin(broadcast(cut))
      .select(band.as("band"), col("l_quantity"), col("l_extendedprice"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity").cast("decimal(20,4)")).cast("double")
          / count(lit(1)), 6).as("mean_qty"),
        round(sum(col("l_extendedprice").cast("decimal(20,4)"))
          .cast("double") / count(lit(1)), 6).as("mean_price"))
      .orderBy("band")
  }

  val all: Seq[QueryDef] = Seq(
    qProfileStats, qCollectAgg, qCondRatios, qCaseAgg, qDistinctPairs,
    qSortNullsLast, qPercentiles, qPivot, qMonotonic, qSkewReport,
    qHistogram, qApproxProfile, qCorrelations, qHeavyHitters, qCmsCounts,
    qHllDistinct, qSketchRollup, qMetricsRollup, qAnomalies, qFkOrphans,
    qAnomaliesMad, qHllOverlap, qBenford, qFdViolations, qKthSmallest,
    qGini, qKAnonymity, qAbcClasses, qDiscountEffect, qQuantileSample)
}
