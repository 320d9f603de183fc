package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** Relational operator coverage (SURVEY.md §2.2-§2.8) as verifiable
  * queries over the driver testdata. Each query exercises one operator
  * family the reference engine shipped (as SQL text handed to Postgres
  * — see SURVEY §2.3 note) re-expressed with the DataFrame API so
  * Catalyst plans it.
  *
  * Determinism conventions (see [[QueryDef]]): exact decimal sums for
  * double aggregates, explicit unique-key ordering, matched column
  * names with the DuckDB oracle.
  */
object RelationalQueries {

  /** Order-insensitive exact sum of a double column: cast to decimal
    * before aggregating. IEEE double addition is order-sensitive and
    * Spark's partial aggregation order is nondeterministic; decimal
    * sums commute exactly, so Spark and DuckDB agree bit-for-bit after
    * the final cast back to double.
    */
  private[analytics] def dsum(c: Column): Column =
    sum(c.cast("decimal(20,4)")).cast("double")

  /** SQL-side twin of [[dsum]]. */
  private[analytics] def dsumSql(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(20,4))) AS DOUBLE)"

  /** Scale-9 [[dsum]], for terms that can land EXACTLY on the scale-4
    * rounding half-grid — there the two engines legitimately disagree
    * (Spark casts double→decimal through `Double.toString` + HALF_UP;
    * DuckDB rounds the scaled double product, which resolves an
    * exact-tie term the other way). q_forecast_baseline's
    * |value − pred| terms are such values: pred is a bucket mean whose
    * denominator is often a power of two, so the term TERMINATES at
    * scale 9 and scale-4 rounding faces a true …5 tie (6 terms at
    * sf0.001 — found red in the round-15 opt pass, inherited). At
    * scale 9 these terms sit ON the grid, not between points, and the
    * engines agree on every term at every gate SF (checked
    * exhaustively: 44k terms, 0 divergences).
    */
  private[analytics] def dsum9(c: Column): Column =
    sum(c.cast("decimal(25,9)")).cast("double")

  /** SQL-side twin of [[dsum9]]. */
  private[analytics] def dsum9Sql(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(25,9))) AS DOUBLE)"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Shared co-occurrence graph for the graph-analytics family: users
    * sharing an (event_type, `unit`-truncated time) activity bucket,
    * with a deterministic HOT-BUCKET CAP — only the `cap` lowest
    * user ids of each bucket form edges (row_number window; the rank
    * filter runs as a WindowGroupLimit partial top-k, never a full
    * per-bucket sort). The cap is load-bearing at scale: pair count
    * per bucket is quadratic in bucket size, so a replicated/hot
    * bucket (ScaleUp packs n× users into the same minutes; a 100 TB
    * event log has hour-bucket hubs) explodes the edge list without
    * it — the 100× sweep measured q_triangles exhausting 77 GB of
    * shuffle before this cap. With it, edges ≤ buckets · cap²/2
    * forever, the same bounded-candidates move as the LSH band caps,
    * and the ORACLE applies the identical capped definition, so the
    * contract stays exact at every scale factor (gate-SF buckets are
    * all under the cap — results there are unchanged).
    */
  private def coOccurEdges(s: SparkSession, dir: String, unit: String,
      cap: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b0 = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        date_trunc(unit, col("ts")).as("h"))
      .distinct()
    val w = Window.partitionBy(col("event_type"), col("h"))
      .orderBy(col("user_id"))
    val buckets = b0.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
    buckets.as("x").join(buckets.as("y"),
        col("x.event_type") === col("y.event_type") &&
          col("x.h") === col("y.h") &&
          col("x.user_id") < col("y.user_id"))
      .select(col("x.user_id").as("u"), col("y.user_id").as("v"))
      .distinct()
  }

  // ---------------------------------------------------------------- aggs

  /** A13/A14-style grouped multi-aggregate — the flagship pricing
    * summary (shape of reference `postgres_manager.py:1090-1131`
    * grouped aggregation surface). Partial (map-side) aggregation +
    * final merge happen automatically; at 100 TB the only shuffle is
    * the 6-row group exchange.
    */
  val q1Agg: QueryDef = QueryDef.sql(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    doc = "grouped multi-agg (SURVEY A13/A14)") { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        (sum(col("l_quantity").cast("decimal(20,4)")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // --------------------------------------------------- scans / projections

  /** S5+P3+P11: projection + pushed-down range predicate. At scale the
    * parquet scan must show PushedFilters + a 4-column ReadSchema.
    */
  val qScanProject: QueryDef = QueryDef.sql(
    "q_scan_project",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem WHERE l_quantity >= 48.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    doc = "column-pruned scan with pushed filter (SURVEY S5/P3/P11)") { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_quantity") >= 48.0)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P8: set-membership predicate (`= ANY(array)` at reference
    * `data_loader.py:387`). Small literal set stays an In-filter pushed
    * to the scan; unbounded sets become a broadcast semi-join instead.
    */
  val qFilterIn: QueryDef = QueryDef.sql(
    "q_filter_in",
    """SELECT o_orderkey, o_orderpriority, o_totalprice
      |FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_totalprice > 400000.0
      |ORDER BY o_orderkey""".stripMargin,
    doc = "IN-list predicate (SURVEY P8)") { (s, dir) =>
    t(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_totalprice") > 400000.0)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .orderBy("o_orderkey")
  }

  // ------------------------------------------------------------- joins

  /** J4: multi-way equi inner join + group. Catalyst broadcasts the
    * 1500-row customer side under AQE at small SF; at 100 TB the
    * orders⋈lineitem join shuffles on orderkey while customer stays
    * broadcast (dimension-sized).
    */
  val qJoinInner: QueryDef = QueryDef.sql(
    "q_join_inner",
    """SELECT c_mktsegment, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_mktsegment, o_orderpriority
      |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,
    doc = "multi-way equi join + agg (SURVEY J4)") { (s, dir) =>
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    // SIZE-ADAPTIVE pre-aggregation (both branches compute the same
    // exact result; only the plan shape differs):
    //  - big lineitem: pre-aggregate by the join key BEFORE the
    //    fact-fact join — the revenue sum is decomposable, so
    //    collapsing ~4 lines/order to one row cuts the orderkey
    //    shuffle ~4× (at 100 TB that exchange is the whole query;
    //    measured at 100×: 8.0 s → 7.4-7.5 s). Shuffle-hash, not
    //    sort-merge: both shuffled sides are consumed once, so SMJ's
    //    two per-partition sorts are pure overhead.
    //  - small lineitem: the extra aggregation stage costs more than
    //    the shuffle it saves (measured at sf0.1/32 cores: 1.87 s
    //    pre-agg vs 1.21 s direct) — join first, aggregate once.
    // The cutover is the scan's own size estimate vs
    // spark.graft.join.preaggBytes (default 256 MB ≈ where a 4×
    // shuffle cut outweighs one extra 2-phase agg pass), so replicas
    // and production keep the pre-agg plan without any local-mode
    // constant baked in.
    val preaggBytes = s.conf.getOption("spark.graft.join.preaggBytes")
      .map(_.toLong).getOrElse(256L << 20)
    val liBytes = l.queryExecution.optimizedPlan.stats.sizeInBytes
    if (liBytes >= preaggBytes) {
      val lAgg = l.groupBy(col("l_orderkey"))
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(20,4)")).as("__rev"),
          count(lit(1)).as("__n"))
      broadcast(c).join(o, c("c_custkey") === o("o_custkey"))
        .join(lAgg.hint("shuffle_hash"),
          o("o_orderkey") === lAgg("l_orderkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(
          sum(col("__rev")).cast("double").as("revenue"),
          sum(col("__n")).as("n_lines"))
        .orderBy(col("c_mktsegment"), col("o_orderpriority"))
    } else {
      broadcast(c).join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("c_mktsegment"), col("o_orderpriority"))
    }
  }

  /** J8: anti join (reference `NOT IN` schema diff,
    * `postgres_manager.py:1066-1075`). left_anti avoids materializing
    * the subquery; broadcast-able when the right side is bounded.
    * NOT IN == left_anti here because o_custkey is non-null (the NULL
    * divergence the reference's catalog queries also sidestep).
    */
  val qJoinAnti: QueryDef = QueryDef.sql(
    "q_join_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0)
      |ORDER BY c_custkey""".stripMargin,
    doc = "anti join (SURVEY J8)") { (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** J6: LEFT OUTER join (reference `pg_stats LEFT OUTER JOIN`,
    * `postgres_manager.py:949-968`). The filtered right side produces
    * real null rows. Broadcast: the 25-row dim never shuffles.
    */
  val qJoinLeftOuter: QueryDef = QueryDef.sql(
    "q_join_left_outer",
    """SELECT n_nationkey, n_name, coalesce(cnt, 0) AS n_rich_suppliers
      |FROM nation LEFT OUTER JOIN
      |  (SELECT s_nationkey, count(*) AS cnt FROM supplier
      |   WHERE s_acctbal > 5000.0 GROUP BY s_nationkey) s
      |ON n_nationkey = s_nationkey
      |ORDER BY n_nationkey""".stripMargin,
    doc = "left outer join with null fill (SURVEY J6)") { (s, dir) =>
    val n = t(s, dir, "nation")
    val sup = t(s, dir, "supplier").filter(col("s_acctbal") > 5000.0)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("cnt"))
    n.join(sup, n("n_nationkey") === sup("s_nationkey"), "left_outer")
      .select(col("n_nationkey"), col("n_name"),
        coalesce(col("cnt"), lit(0L)).as("n_rich_suppliers"))
      .orderBy("n_nationkey")
  }

  /** J3: cross join with a broadcast 1-row bounds CTE (reference
    * `FROM raw r, file_bounds fb`, `data_loader.py:378-390`). The
    * scalar bounds stay a BroadcastNestedLoopJoin — zero shuffle of
    * the big side at any scale.
    */
  val qJoinCrossBounds: QueryDef = QueryDef.sql(
    "q_join_cross_bounds",
    """SELECT o_orderkey,
      |  CAST(round((o_totalprice - lo) / (hi - lo), 6) AS DOUBLE) AS price_pos
      |FROM orders CROSS JOIN
      |  (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders) b
      |WHERE o_orderkey <= 200
      |ORDER BY o_orderkey""".stripMargin,
    doc = "cross join vs broadcast scalar bounds (SURVEY J3)") { (s, dir) =>
    val o = t(s, dir, "orders")
    val bounds = o.agg(min(col("o_totalprice")).as("lo"),
      max(col("o_totalprice")).as("hi"))
    o.filter(col("o_orderkey") <= 200)
      .crossJoin(broadcast(bounds))
      .select(col("o_orderkey"),
        round((col("o_totalprice") - col("lo")) / (col("hi") - col("lo")), 6)
          .cast("double").as("price_pos"))
      .orderBy("o_orderkey")
  }

  /** J5: self theta-join (reference lock-graph self-join,
    * `postgres_manager.py:849-876`): pairs of suppliers in the same
    * nation, deduped by key inequality. Equi component (nationkey)
    * keeps it a hash join; the inequality is a post-join filter.
    */
  val qJoinTheta: QueryDef = QueryDef.sql(
    "q_join_theta",
    """SELECT a.s_suppkey AS sk1, b.s_suppkey AS sk2, a.s_nationkey AS nk
      |FROM supplier a JOIN supplier b
      |  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
      |ORDER BY sk1, sk2""".stripMargin,
    doc = "self theta join, equi + inequality (SURVEY J5)") { (s, dir) =>
    val a = t(s, dir, "supplier").select(
      col("s_suppkey").as("sk1"), col("s_nationkey").as("nk"))
    val b = t(s, dir, "supplier").select(
      col("s_suppkey").as("sk2"), col("s_nationkey").as("nk2"))
    a.join(b, a("nk") === b("nk2") && a("sk1") < b("sk2"))
      .select("sk1", "sk2", "nk")
      .orderBy("sk1", "sk2")
  }

  /** J5/P10: null-safe equality join (`IS NOT DISTINCT FROM`,
    * `postgres_manager.py:863-871`). nullif() manufactures NULL keys;
    * `<=>` matches NULL=NULL where `=` would drop those rows.
    */
  val qJoinNullSafe: QueryDef = QueryDef.sql(
    "q_join_null_safe",
    """SELECT a.s_suppkey AS sk1, b.s_suppkey AS sk2
      |FROM (SELECT s_suppkey, nullif(s_nationkey, 5) AS nk FROM supplier) a
      |JOIN (SELECT s_suppkey, nullif(s_nationkey, 5) AS nk FROM supplier) b
      |  ON a.nk IS NOT DISTINCT FROM b.nk AND a.s_suppkey < b.s_suppkey
      |ORDER BY sk1, sk2""".stripMargin,
    doc = "null-safe equality join (SURVEY J5/P10)") { (s, dir) =>
    val a = t(s, dir, "supplier").select(col("s_suppkey").as("sk1"),
      nullif(col("s_nationkey"), lit(5)).as("nk"))
    val b = t(s, dir, "supplier").select(col("s_suppkey").as("sk2"),
      nullif(col("s_nationkey"), lit(5)).as("nk2"))
    a.join(b, a("nk") <=> b("nk2") && a("sk1") < b("sk2"))
      .select("sk1", "sk2")
      .orderBy("sk1", "sk2")
  }

  /** J7: JOIN USING (reference `postgres_manager.py:1083-1085`) —
    * documents⋈embeddings on the shared id.
    */
  val qJoinUsing: QueryDef = QueryDef.sql(
    "q_join_using",
    """SELECT doc_id, lang, label FROM documents
      |JOIN (SELECT vec_id AS doc_id, label FROM embeddings) e USING (doc_id)
      |ORDER BY doc_id""".stripMargin,
    doc = "join USING shared column (SURVEY J7)") { (s, dir) =>
    t(s, dir, "documents")
      .join(t(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id"), col("label")), Seq("doc_id"))
      .select("doc_id", "lang", "label")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------- set ops

  /** U1: 3-branch UNION ALL (reference schema-diff,
    * `postgres_manager.py:1059-1086`) — unionByName keeps columns
    * aligned by name, not position.
    */
  val qUnionAll: QueryDef = QueryDef.sql(
    "q_union_all",
    """SELECT 'customer' AS src, count(*) AS n FROM customer
      |UNION ALL SELECT 'supplier' AS src, count(*) AS n FROM supplier
      |UNION ALL SELECT 'nation' AS src, count(*) AS n FROM nation
      |ORDER BY src""".stripMargin,
    doc = "3-branch UNION ALL (SURVEY U1)") { (s, dir) =>
    val c = t(s, dir, "customer").agg(count(lit(1)).as("n"))
      .select(lit("customer").as("src"), col("n"))
    val sup = t(s, dir, "supplier").agg(count(lit(1)).as("n"))
      .select(lit("supplier").as("src"), col("n"))
    val n = t(s, dir, "nation").agg(count(lit(1)).as("n"))
      .select(lit("nation").as("src"), col("n"))
    c.unionByName(sup).unionByName(n).orderBy("src")
  }

  /** INTERSECT/EXCEPT (beyond-reference set-op surface; the reference
    * only needed anti-join J8): user ids that clicked but never
    * purchased.
    */
  val qExcept: QueryDef = QueryDef.sql(
    "q_except",
    """SELECT user_id FROM events WHERE event_type = 'click'
      |EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase'
      |ORDER BY user_id""".stripMargin,
    doc = "EXCEPT set op") { (s, dir) =>
    val e = t(s, dir, "events")
    e.filter(col("event_type") === "click").select("user_id")
      .except(e.filter(col("event_type") === "purchase").select("user_id"))
      .orderBy("user_id")
  }

  /** ROLLUP grouping sets (beyond-reference analytics surface):
    * revenue by region with subtotals + grand total. Explicit NULLS
    * FIRST keeps Spark/DuckDB sort semantics identical on the
    * rollup's null group rows.
    */
  val qRollup: QueryDef = QueryDef.sql(
    "q_rollup",
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(s_acctbal AS DECIMAL(20,4))) AS DOUBLE) AS total_bal
      |FROM region
      |JOIN nation ON r_regionkey = n_regionkey
      |JOIN supplier ON n_nationkey = s_nationkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    doc = "ROLLUP subtotals") { (s, dir) =>
    val r = t(s, dir, "region")
    val n = t(s, dir, "nation")
    val sup = t(s, dir, "supplier")
    r.join(n, r("r_regionkey") === n("n_regionkey"))
      .join(sup, n("n_nationkey") === sup("s_nationkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(col("s_acctbal")).as("total_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** J1/J2: existence semi-join — the reference's overlap check shape
    * (`data_loader.py:377-429`).
    */
  val qJoinSemi: QueryDef = QueryDef.sql(
    "q_join_semi",
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
      |ORDER BY o_orderkey""".stripMargin,
    doc = "existence semi-join (SURVEY J1/J2)") { (s, dir) =>
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem").filter(col("l_quantity") >= 49.0)
      .select(col("l_orderkey").as("o_orderkey"))
    o.join(l, Seq("o_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  // -------------------------------------------------------- sorts / top-k

  /** O1/O2/O3: global top-k. Spark plans TakeOrderedAndProject — no full
    * sort, each partition keeps k rows; the driver merges k×partitions.
    */
  val qTopK: QueryDef = QueryDef.sql(
    "q_topk",
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin,
    doc = "global top-k (SURVEY O1-O3)") { (s, dir) =>
    t(s, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(10)
  }

  /** W-new + O4: ranked window — top 3 orders per priority class.
    * Window shuffles once on the partition key; no driver-side loop.
    */
  val qWindowRank: QueryDef = QueryDef.sql(
    "q_window_rank",
    """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin,
    doc = "ranked window top-n per group") { (s, dir) =>
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_orderpriority", "rn")
  }

  /** CUBE grouping sets (beyond-reference analytics surface, companion
    * to [[qRollup]]): all subtotal combinations of two dimensions.
    */
  val qCube: QueryDef = QueryDef.sql(
    "q_cube",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    doc = "CUBE grouping sets") { (s, dir) =>
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** Analytic-function sweep: lead, first_value, ntile and a running
    * frame sum in ONE window spec — Catalyst evaluates all four over a
    * single shuffle + sort on the partition key, which is the property
    * to preserve at scale (four specs = four sorts).
    */
  val qWindowFuncs: QueryDef = QueryDef.sql(
    "q_window_funcs",
    """SELECT o_custkey, o_orderkey,
      |  lead(o_orderkey) OVER w AS next_orderkey,
      |  first_value(o_orderkey) OVER w AS first_orderkey,
      |  ntile(4) OVER w AS quartile,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(20,4)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_spend
      |FROM orders WHERE o_custkey <= 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin,
    doc = "lead/first_value/ntile/running-frame in one window spec") { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_custkey") <= 50)
      .select(col("o_custkey"), col("o_orderkey"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
        first(col("o_orderkey")).over(w).as("first_orderkey"),
        ntile(4).over(w).as("quartile"),
        sum(col("o_totalprice").cast("decimal(20,4)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Value-RANGE window frames + rank distributions: `RANGE BETWEEN n
    * PRECEDING AND n FOLLOWING` over a numeric ordering (peers by
    * VALUE distance, not row position — a genuinely different frame
    * mechanic from §2.5's ROWS frames) plus percent_rank/cume_dist.
    */
  val qWindowRange: QueryDef = QueryDef.sql(
    "q_window_range",
    """SELECT o_custkey, o_orderkey,
      |  CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS pr,
      |  CAST(round(cume_dist() OVER w, 6) AS DOUBLE) AS cd,
      |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
      |    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_price_peers
      |FROM orders WHERE o_custkey <= 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin,
    doc = "RANGE value-frames + percent_rank/cume_dist (window mechanics)") { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val wRange = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice")).rangeBetween(-1000L, 1000L)
    t(s, dir, "orders")
      .filter(col("o_custkey") <= 50)
      .select(col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(w), 6).cast("double").as("pr"),
        round(cume_dist().over(w), 6).cast("double").as("cd"),
        count(lit(1)).over(wRange).as("n_price_peers"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Correlated subqueries through the SQL entry surface: EXISTS
    * (decorrelated by Catalyst to a semi-join) and a scalar aggregate
    * subquery (broadcast single-row) in one predicate — shapes the
    * reference ran as raw SQL text against Postgres.
    */
  val qSubqueryExists: QueryDef = QueryDef.sql(
    "q_subquery_exists",
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 200000)
      |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      |ORDER BY c_custkey""".stripMargin,
    doc = "correlated EXISTS + scalar subquery via SQL surface") { (s, dir) =>
    t(s, dir, "customer").createOrReplaceTempView("customer")
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 200000)
        |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** J9 recursive CTE ≡ driver-loop fixpoint ([[Iterate]]): transitive
    * closure over a deterministic functional graph derived from nation
    * (i → 7i mod 25: orbits of order 4), oracled against DuckDB's
    * actual `WITH RECURSIVE`. Each iteration is one distributed join;
    * the oracle proves loop+join+anti-accumulator ≡ SQL recursion.
    */
  val qTransitiveClosure: QueryDef = QueryDef.sql(
    "q_transitive_closure",
    """WITH RECURSIVE edges AS (
      |  SELECT n_nationkey AS src, (n_nationkey * 7) % 25 AS dst FROM nation),
      |reach AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
      |SELECT src, dst FROM reach ORDER BY src, dst""".stripMargin,
    doc = "recursive-CTE transitive closure via driver fixpoint (SURVEY J9)") { (s, dir) =>
    val edges = t(s, dir, "nation")
      .select(col("n_nationkey").as("src"),
        (col("n_nationkey") * 7 % 25).as("dst"))
    Iterate.transitiveClosure(edges, "src", "dst")
      .orderBy("src", "dst")
  }

  /** Bloom-pruned scan ([[graft.store.ScaleJoins.bloomPruned]]): a
    * bloom filter over the click event-ids prunes the full events scan
    * to candidate matches before any join. Contract oracle for the
    * bloom guarantees: NO false negatives (every true match survives
    * the prune — losslessness of the pruned anti/semi-join), and the
    * false-positive trickle stays under 5× the configured 1% fpp.
    */
  val qBloomPrune: QueryDef = QueryDef.sql(
    "q_bloom_prune",
    """SELECT count(CASE WHEN event_type = 'click' THEN 1 END) AS n_matches,
      |  true AS no_false_negatives, true AS fp_ok
      |FROM events""".stripMargin,
    doc = "bloom-filter scan pruning vs exact membership (contract oracle)") { (s, dir) =>
    val ev = t(s, dir, "events")
    val small = ev.filter(col("event_type") === "click").select(col("event_id"))
    val kept = graft.store.ScaleJoins.bloomPruned(
      small, ev, Seq("event_id"), expectedItems = small.count())
    val keptAgg = kept.agg(
      count(when(col("event_type") === "click", 1)).as("survived_matches"),
      count(lit(1)).as("kept_total"))
    val totals = ev.agg(
      count(when(col("event_type") === "click", 1)).as("n_matches"),
      count(lit(1)).as("total"))
    keptAgg.crossJoin(totals).select(
      col("n_matches"),
      (col("survived_matches") === col("n_matches")).as("no_false_negatives"),
      ((col("kept_total") - col("n_matches")).cast("double")
        <= lit(0.05) * (col("total") - col("n_matches"))).as("fp_ok"))
  }

  /** Explicit GROUPING SETS — the general form ROLLUP/CUBE specialize:
    * two independent one-dimension aggregates plus the grand total in
    * one pass (NOT expressible as either rollup or cube), with
    * `grouping()` flags disambiguating "null key" from "aggregated-out
    * key". Spark expands the sets into a single Expand + one
    * aggregation — one shuffle regardless of how many sets.
    */
  val qGroupingSets: QueryDef = QueryDef.sql(
    "q_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
      |  count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_prio,
      |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    doc = "explicit GROUPING SETS + grouping() flags (beyond rollup/cube)") { (s, dir) =>
    t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total"))
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("g_status"), col("g_prio"), col("n"), col("total"))
      .orderBy(col("g_status"), col("g_prio"),
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** INTERSECT ALL — multiset intersection (each user_id kept
    * min(click-count, purchase-count) times), the bag-semantics
    * counterpart of [[qExcept]]'s distinct set op. Spark plans a
    * single count-compare aggregate, not a join explosion.
    */
  val qIntersectAll: QueryDef = QueryDef.sql(
    "q_intersect_all",
    """SELECT user_id FROM events WHERE event_type = 'click'
      |INTERSECT ALL
      |SELECT user_id FROM events WHERE event_type = 'purchase'
      |ORDER BY user_id""".stripMargin,
    doc = "INTERSECT ALL multiset set op") { (s, dir) =>
    val e = t(s, dir, "events")
    e.filter(col("event_type") === "click").select("user_id")
      .intersectAll(e.filter(col("event_type") === "purchase").select("user_id"))
      .orderBy("user_id")
  }

  /** TPC-H Q3 shape (shipping priority): the selective-filters-first
    * 3-way join + grouped revenue + top-10. The plan property that
    * matters at 100 TB: BOTH date filters and the segment filter reach
    * their parquet scans (literal comparisons on raw columns, never
    * casts of the column), so the join inputs are pre-shrunk; the
    * top-10 runs as TakeOrderedAndProject (per-partition k, no global
    * sort). Neither customer nor lineitem is broadcast — both scale
    * with SF; AQE picks the build side locally.
    */
  val qTpchQ3: QueryDef = QueryDef.sql(
    "q_tpch_q3",
    s"""SELECT l_orderkey,
      |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    doc = "TPC-H Q3 shape: selective 3-way join + grouped top-10") { (s, dir) =>
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"))
      .join(li, col("o_orderkey") === li("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape (local supplier volume): the 6-way join with the
    * customer-nation = supplier-nation locality predicate. nation and
    * region are FIXED-cardinality dimensions (25/5 rows at any SF) —
    * explicitly broadcast; every other join shuffles on its key.
    */
  val qTpchQ5: QueryDef = QueryDef.sql(
    "q_tpch_q5",
    s"""SELECT n_name,
      |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin,
    doc = "TPC-H Q5 shape: 6-way join with locality predicate + broadcast dims") { (s, dir) =>
    val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"))
      .join(li, col("o_orderkey") === li("l_orderkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey") &&
        cust("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** SCD type-2 versioned merge ([[graft.store.Warehouse.mergeScd2]]):
    * every tenth customer gets a new balance effective mid-year — the
    * old version closes at the effective instant, the new version
    * opens, everyone else stays current. The oracle states the
    * expected HISTORY directly (semantics, not implementation), so the
    * whole versioning contract is hash-verified.
    */
  val qMergeScd2: QueryDef = QueryDef.sql(
    "q_merge_scd2",
    """WITH upd AS (
      |  SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal
      |  FROM customer WHERE c_custkey % 10 = 0)
      |SELECT c_custkey, c_acctbal, TIMESTAMP '2024-01-01' AS valid_from,
      |  CASE WHEN c_custkey % 10 = 0 THEN TIMESTAMP '2024-06-01' END AS valid_to
      |FROM customer
      |UNION ALL
      |SELECT c_custkey, c_acctbal, TIMESTAMP '2024-06-01',
      |  CAST(NULL AS TIMESTAMP)
      |FROM upd
      |ORDER BY c_custkey, valid_from""".stripMargin,
    doc = "SCD2 versioned dimension merge (history-preserving upsert)") { (s, dir) =>
    import graft.store.Warehouse
    val cust = t(s, dir, "customer")
    val existing = cust.select(col("c_custkey"), col("c_acctbal"),
      lit("2024-01-01").cast("timestamp").as("valid_from"),
      lit(null).cast("timestamp").as("valid_to"))
    val updates = cust.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"),
        (col("c_acctbal") + 100.0).as("c_acctbal"),
        lit("2024-06-01").cast("timestamp").as("eff"))
    Warehouse.mergeScd2(existing, updates, Seq("c_custkey"), "eff")
      .select("c_custkey", "c_acctbal", "valid_from", "valid_to")
      .orderBy("c_custkey", "valid_from")
  }

  /** Edit-distance fuzzy match: planted one-character typos rejoin
    * their source names under `levenshtein ≤ 1`. Deliberately a
    * bounded-scope theta-join (both sides are fixed-cardinality
    * dimensions); at corpus scale fuzzy matching blocks first (length
    * / prefix / q-gram buckets) exactly like the LSH dedup path — this
    * query pins the distance semantics both engines must agree on.
    */
  val qFuzzyMatch: QueryDef = QueryDef.sql(
    "q_fuzzy_match",
    """WITH typo AS (
      |  SELECT n_nationkey AS typo_key, n_name || 'X' AS tname
      |  FROM nation WHERE n_nationkey % 5 = 0)
      |SELECT typo_key, n_name,
      |  CAST(levenshtein(tname, n_name) AS INT) AS dist
      |FROM typo JOIN nation ON levenshtein(tname, n_name) <= 1
      |ORDER BY typo_key, n_name""".stripMargin,
    doc = "levenshtein fuzzy join over planted typos (entity matching)") { (s, dir) =>
    val nation = t(s, dir, "nation")
    val typo = nation.filter(col("n_nationkey") % 5 === 0)
      .select(col("n_nationkey").as("typo_key"),
        concat(col("n_name"), lit("X")).as("tname"))
    typo.join(nation, levenshtein(col("tname"), col("n_name")) <= 1)
      .select(col("typo_key"), col("n_name"),
        levenshtein(col("tname"), col("n_name")).cast("int").as("dist"))
      .orderBy("typo_key", "n_name")
  }

  /** PageRank via driver-loop fixpoint
    * ([[Iterate.pageRankFunctional]]), oracled against DuckDB's actual
    * `WITH RECURSIVE` running the SAME exact-decimal iteration over
    * the same functional graph as [[qTransitiveClosure]] (i → 7i mod
    * 25). Out-degree 1 ⇒ no rank/degree division ⇒ every iteration is
    * exact decimal + one HALF_UP round, so eight iterations of two
    * engines agree to the last digit — the graph-analytics family
    * (closure, components, ranking) all driver-loop + oracle.
    */
  val qPageRank: QueryDef = QueryDef.sql(
    "q_pagerank",
    """WITH RECURSIVE pr AS (
      |  SELECT n_nationkey AS node, CAST(0.04 AS DECIMAL(20,12)) AS rank,
      |    0 AS iter
      |  FROM nation
      |  UNION ALL
      |  SELECT nn.n_nationkey AS node,
      |    CAST(round(0.006 + 0.85 * coalesce(s.insum, 0), 12)
      |      AS DECIMAL(20,12)) AS rank,
      |    it.iter + 1 AS iter
      |  FROM (SELECT DISTINCT iter FROM pr WHERE iter < 8) it
      |  CROSS JOIN nation nn
      |  LEFT JOIN (
      |    SELECT (p.node * 7) % 25 AS dst, sum(p.rank) AS insum,
      |      p.iter AS piter
      |    FROM pr p GROUP BY 1, 3) s
      |  ON s.dst = nn.n_nationkey AND s.piter = it.iter)
      |SELECT node, CAST(rank AS DOUBLE) AS rank
      |FROM pr WHERE iter = 8 ORDER BY node""".stripMargin,
    doc = "PageRank fixpoint vs recursive-CTE oracle (graph analytics)") { (s, dir) =>
    val edges = t(s, dir, "nation")
      .select(col("n_nationkey").as("src"),
        (col("n_nationkey") * 7 % 25).as("dst"))
    Iterate.pageRankFunctional(edges, "src", "dst", iters = 8,
        damping = BigDecimal("0.85"), teleport = BigDecimal("0.006"))
      .select(col("node"), col("rank").cast("double").as("rank"))
      .orderBy("node")
  }

  /** General PageRank ([[Iterate.pageRank]]): out-degree normalized,
    * dangling mass redistributed — the distributed double-arithmetic
    * path (the exact-decimal functional variant above is the oracle
    * harness; THIS is the one that runs at graph scale). Oracle: the
    * same normalized iteration as a DuckDB recursive CTE over a fixed
    * in-plan graph with branching nodes and a dangling sink, rounded
    * to 9 decimals (both engines iterate IEEE doubles; residual
    * cross-engine sum-order noise is ~1e-15, six orders below the
    * rounding grid).
    */
  val qPageRankGeneral: QueryDef = QueryDef.sql(
    "q_pagerank_general",
    """WITH RECURSIVE edges AS (
      |  SELECT * FROM (VALUES (1, 2), (2, 1), (2, 3), (3, 4), (4, 1),
      |    (4, 6), (5, 1), (5, 2)) AS t(src, dst)),
      |nodes AS (
      |  SELECT DISTINCT node FROM (
      |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
      |deg AS (
      |  SELECT src, CAST(count(*) AS DOUBLE) AS deg
      |  FROM edges GROUP BY src),
      |pr AS (
      |  SELECT node, CAST(1.0 AS DOUBLE)/6 AS rank, 0 AS iter FROM nodes
      |  UNION ALL
      |  SELECT nn.node,
      |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))/6 +
      |      CAST(0.85 AS DOUBLE) *
      |        (sum(CASE WHEN c.dst = nn.node THEN c.share ELSE 0 END) +
      |         sum(CASE WHEN c.dst IS NULL THEN c.share ELSE 0 END)/6)
      |      AS rank,
      |    min(c.iter) + 1 AS iter
      |  FROM nodes nn CROSS JOIN (
      |    SELECT e.dst AS dst,
      |      CASE WHEN e.dst IS NULL THEN p.rank
      |           ELSE p.rank/d.deg END AS share,
      |      p.iter AS iter
      |    FROM pr p
      |      LEFT JOIN deg d ON d.src = p.node
      |      LEFT JOIN edges e ON e.src = p.node
      |    WHERE p.iter < 8) c
      |  GROUP BY nn.node)
      |SELECT node, round(rank, 9) AS rank
      |FROM pr WHERE iter = 8 ORDER BY node""".stripMargin,
    doc = "general PageRank (normalized, dangling-safe) vs recursive-CTE oracle (graph analytics)") { (s, dir) =>
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 1L),
      (4L, 6L), (5L, 1L), (5L, 2L)).toDF("src", "dst")
    Iterate.pageRank(edges, "src", "dst", iters = 8)
      .select(col("node").cast("int").as("node"),
        round(col("rank"), 9).as("rank"))
      .orderBy("node")
  }

  /** Triangle enumeration over a co-occurrence graph (users sharing an
    * (event-type, minute) activity bucket) via
    * [[Iterate.triangles]]'s degree orientation — out-degrees bounded
    * O(√m) under ANY skew, so a hub node cannot explode the wedge
    * join the way the naive u<v ordering's deg² does. The oracle runs
    * the naive 3-way self-join (same triangle set, the orientation is
    * count-preserving); both engines list the triangles themselves,
    * id-sorted, so a wedge or closure bug hash-fails, not just
    * miscounts.
    */
  val qTriangles: QueryDef = QueryDef.sql(
    "q_triangles",
    """WITH buckets AS (
      |  SELECT user_id, event_type, h FROM (
      |    SELECT user_id, event_type, h,
      |      row_number() OVER (PARTITION BY event_type, h
      |        ORDER BY user_id) AS rn
      |    FROM (SELECT DISTINCT user_id, event_type,
      |            date_trunc('minute', ts) AS h FROM events))
      |  WHERE rn <= 40),
      |edges AS (
      |  SELECT DISTINCT x.user_id AS u, y.user_id AS v
      |  FROM buckets x JOIN buckets y
      |    ON x.event_type = y.event_type AND x.h = y.h
      |    AND x.user_id < y.user_id)
      |SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |FROM edges e1
      |JOIN edges e2 ON e2.u = e1.v
      |JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
      |ORDER BY a, b, c""".stripMargin,
    doc = "triangle enumeration, degree-oriented wedge join (graph analytics)") { (s, dir) =>
    val edges = coOccurEdges(s, dir, "minute")
    Iterate.triangles(edges, "u", "v").orderBy("a", "b", "c")
  }

  /** Per-node local clustering coefficient — the BOUNDED-output graph
    * face (O(nodes) rows however dense the graph gets; the
    * enumeration twin q_triangles dumps the full triangle set, which
    * densifies quadratically under replication): triangle counts per
    * node from [[Iterate.triangles]], degrees from the edge list,
    * coeff = 2T/(d(d−1)). Same co-occurrence graph and naive-join
    * oracle as q_triangles.
    */
  val qClusteringCoeff: QueryDef = QueryDef.sql(
    "q_clustering_coeff",
    """WITH buckets AS (
      |  SELECT user_id, event_type, h FROM (
      |    SELECT user_id, event_type, h,
      |      row_number() OVER (PARTITION BY event_type, h
      |        ORDER BY user_id) AS rn
      |    FROM (SELECT DISTINCT user_id, event_type,
      |            date_trunc('minute', ts) AS h FROM events))
      |  WHERE rn <= 40),
      |edges AS (
      |  SELECT DISTINCT x.user_id AS u, y.user_id AS v
      |  FROM buckets x JOIN buckets y
      |    ON x.event_type = y.event_type AND x.h = y.h
      |    AND x.user_id < y.user_id),
      |tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM edges e1
      |  JOIN edges e2 ON e2.u = e1.v
      |  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
      |tcnt AS (
      |  SELECT n, count(*) AS t FROM (
      |    SELECT a AS n FROM tri UNION ALL
      |    SELECT b AS n FROM tri UNION ALL
      |    SELECT c AS n FROM tri) GROUP BY n),
      |deg AS (
      |  SELECT n, count(*) AS d FROM (
      |    SELECT u AS n FROM edges UNION ALL
      |    SELECT v AS n FROM edges) GROUP BY n)
      |SELECT deg.n AS user_id, deg.d AS degree,
      |  coalesce(tcnt.t, 0) AS triangles,
      |  round(CASE WHEN deg.d >= 2
      |    THEN 2.0 * coalesce(tcnt.t, 0) / (deg.d * (deg.d - 1))
      |    ELSE 0 END, 6) AS coeff
      |FROM deg LEFT JOIN tcnt ON tcnt.n = deg.n
      |ORDER BY user_id""".stripMargin,
    doc = "local clustering coefficient per node, bounded output (graph analytics)") { (s, dir) =>
    val edges = coOccurEdges(s, dir, "minute")
    val tri = Iterate.triangles(edges, "u", "v")
    val tcnt = tri.select(explode(array(col("a"), col("b"), col("c")))
        .as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("t"))
    val deg = edges.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    deg.join(tcnt, Seq("n"), "left")
      .select(col("n").as("user_id"), col("d").as("degree"),
        coalesce(col("t"), lit(0L)).as("triangles"),
        round(when(col("d") >= 2,
            lit(2.0) * coalesce(col("t"), lit(0L)) /
              (col("d") * (col("d") - 1)))
          .otherwise(lit(0.0)), 6).as("coeff"))
      .orderBy("user_id")
  }

  /** Connected components as a first-class graph face: min-label
    * propagation ([[graft.dedup.Dedup.nearDupClusters]] — the same
    * engine the dedup terminal path runs) over the co-occurrence
    * graph; component = smallest member id. The oracle computes the
    * identical labeling declaratively: component(n) = min over the
    * recursive reachability closure — tractable at oracle scale,
    * while the engine's iterative form converges in O(diameter)
    * joins at any scale.
    */
  val qConnectedComponents: QueryDef = QueryDef.sql(
    "q_connected_components",
    """WITH RECURSIVE buckets AS (
      |  SELECT user_id, event_type, h FROM (
      |    SELECT user_id, event_type, h,
      |      row_number() OVER (PARTITION BY event_type, h
      |        ORDER BY user_id) AS rn
      |    FROM (SELECT DISTINCT user_id, event_type,
      |            date_trunc('minute', ts) AS h FROM events))
      |  WHERE rn <= 40),
      |edges AS (
      |  SELECT DISTINCT x.user_id AS u, y.user_id AS v
      |  FROM buckets x JOIN buckets y
      |    ON x.event_type = y.event_type AND x.h = y.h
      |    AND x.user_id < y.user_id),
      |sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
      |reach(a, b) AS (
      |  SELECT u AS a, v AS b FROM sym
      |  UNION
      |  SELECT r.a, s.v AS b FROM reach r JOIN sym s ON s.u = r.b)
      |SELECT a AS user_id, least(a, min(b)) AS component
      |FROM reach GROUP BY a
      |ORDER BY user_id""".stripMargin,
    doc = "connected components via min-label propagation vs reachability-closure oracle (graph analytics)") { (s, dir) =>
    val edges = coOccurEdges(s, dir, "minute")
    graft.dedup.Dedup.nearDupClusters(edges, "u", "v")
      .select(col("id").as("user_id"), col("label").as("component"))
      .orderBy("user_id")
  }

  /** Weighted single-source shortest paths ([[Iterate.shortestPaths]]):
    * frontier Bellman-Ford over a deterministic 25-node / out-degree-2
    * weighted graph derived from nation (i → 7i mod 25 at weight
    * i mod 5 + 1, i → 3i+1 mod 25 at weight i mod 7 + 1), source 0.
    * Weights are integral, so distances are exact and the oracle is a
    * digit-for-digit DuckDB bounded-walk recursive CTE (every walk of
    * total weight < 200 — an upper bound on any 25-node shortest path
    * at max edge weight 7 — then min per node). Proves the frontier
    * delta loop ≡ SQL recursion, the same contract q_transitive_closure
    * pins for the unweighted closure.
    */
  val qSssp: QueryDef = QueryDef.sql(
    "q_sssp",
    """WITH RECURSIVE edges AS (
      |  SELECT n_nationkey AS src, (n_nationkey * 7) % 25 AS dst,
      |         n_nationkey % 5 + 1 AS w FROM nation
      |  UNION ALL
      |  SELECT n_nationkey, (n_nationkey * 3 + 1) % 25,
      |         n_nationkey % 7 + 1 FROM nation),
      |walk AS (
      |  SELECT 0 AS node, 0 AS d
      |  UNION
      |  SELECT e.dst, wk.d + e.w FROM walk wk JOIN edges e ON e.src = wk.node
      |  WHERE wk.d + e.w < 200)
      |SELECT node, min(d) AS dist FROM walk GROUP BY node
      |ORDER BY node""".stripMargin,
    doc = "weighted SSSP via frontier Bellman-Ford vs bounded-walk recursive CTE (graph analytics)") { (s, dir) =>
    val n = t(s, dir, "nation")
    val edges = n.select(col("n_nationkey").as("src"),
        (col("n_nationkey") * 7 % 25).as("dst"),
        (col("n_nationkey") % 5 + 1).as("w"))
      .unionByName(n.select(col("n_nationkey").as("src"),
        (col("n_nationkey") * 3 + 1) % 25 as "dst",
        (col("n_nationkey") % 7 + 1).as("w")))
    Iterate.shortestPaths(edges, "src", "dst", "w", source = 0L)
      .orderBy("node")
  }

  /** Link prediction over the co-occurrence graph
    * ([[Iterate.linkPrediction]]): top-20 non-adjacent user pairs by
    * common-neighbor count (neighborhood Jaccard as tie-quality) —
    * the recommendation face of the graph family. Same graph
    * construction and declarative-oracle discipline as q_triangles;
    * ordered by (common DESC, u, v), a total order, before the LIMIT,
    * so both engines cut the identical prefix.
    */
  val qLinkPrediction: QueryDef = QueryDef.sql(
    "q_link_prediction",
    """WITH buckets AS (
      |  SELECT user_id, event_type, h FROM (
      |    SELECT user_id, event_type, h,
      |      row_number() OVER (PARTITION BY event_type, h
      |        ORDER BY user_id) AS rn
      |    FROM (SELECT DISTINCT user_id, event_type,
      |            date_trunc('minute', ts) AS h FROM events))
      |  WHERE rn <= 40),
      |edges AS (
      |  SELECT DISTINCT x.user_id AS u, y.user_id AS v
      |  FROM buckets x JOIN buckets y
      |    ON x.event_type = y.event_type AND x.h = y.h
      |    AND x.user_id < y.user_id),
      |adj AS (
      |  SELECT u AS n, v AS nbr FROM edges
      |  UNION ALL SELECT v AS n, u AS nbr FROM edges),
      |deg AS (SELECT n, count(*) AS d FROM adj GROUP BY n),
      |centers AS (
      |  SELECT a.n, a.nbr FROM adj a
      |  JOIN deg dn ON dn.n = a.nbr WHERE dn.d <= 64),
      |cand AS (
      |  SELECT x.n AS u, y.n AS v, count(*) AS common
      |  FROM centers x JOIN centers y ON x.nbr = y.nbr AND x.n < y.n
      |  GROUP BY x.n, y.n),
      |nonadj AS (
      |  SELECT c.u, c.v, c.common FROM cand c
      |  LEFT JOIN edges e ON c.u = e.u AND c.v = e.v
      |  WHERE e.u IS NULL)
      |SELECT n.u, n.v, n.common,
      |  CAST(round(CAST(n.common AS DOUBLE) / (du.d + dv.d - n.common), 6)
      |    AS DOUBLE) AS jaccard
      |FROM nonadj n
      |JOIN deg du ON du.n = n.u
      |JOIN deg dv ON dv.n = n.v
      |ORDER BY n.common DESC, n.u, n.v LIMIT 20""".stripMargin,
    doc = "common-neighbor link prediction, hub-capped wedges, top-20 non-adjacent pairs (graph analytics)") { (s, dir) =>
    val edges = coOccurEdges(s, dir, "minute")
    Iterate.linkPrediction(edges, "u", "v", maxHubDegree = 64)
      .select(col("u"), col("v"), col("common"),
        round(col("jaccard"), 6).cast("double").as("jaccard"))
      .orderBy(col("common").desc, col("u"), col("v"))
      .limit(20)
  }

  /** Personalized PageRank ([[Iterate.personalizedPageRank]]): random
    * walk with restart into seed set {1, 5} over the same fixed graph
    * as q_pagerank_general — teleport and dangling mass land only on
    * seeds, so rank concentrates in the seeds' neighborhood and node 6
    * (reachable but sink) keeps only flow-through mass. Oracle: the
    * identical iteration as a DuckDB recursive CTE, rounded to 9
    * decimals (IEEE noise is ~1e-15, six orders below the grid).
    */
  val qPpr: QueryDef = QueryDef.sql(
    "q_ppr",
    """WITH RECURSIVE edges AS (
      |  SELECT * FROM (VALUES (1, 2), (2, 1), (2, 3), (3, 4), (4, 1),
      |    (4, 6), (5, 1), (5, 2)) AS t(src, dst)),
      |nodes AS (
      |  SELECT DISTINCT node FROM (
      |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
      |sv AS (
      |  SELECT node,
      |    CASE WHEN node IN (1, 5) THEN CAST(0.5 AS DOUBLE)
      |         ELSE CAST(0 AS DOUBLE) END AS sv
      |  FROM nodes),
      |deg AS (
      |  SELECT src, CAST(count(*) AS DOUBLE) AS deg
      |  FROM edges GROUP BY src),
      |pr AS (
      |  SELECT node, sv AS rank, 0 AS iter FROM sv
      |  UNION ALL
      |  SELECT nn.node,
      |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * nn.sv +
      |      CAST(0.85 AS DOUBLE) *
      |        (sum(CASE WHEN c.dst = nn.node THEN c.share ELSE 0 END) +
      |         sum(CASE WHEN c.dst IS NULL THEN c.share ELSE 0 END) * nn.sv)
      |      AS rank,
      |    min(c.iter) + 1 AS iter
      |  FROM sv nn CROSS JOIN (
      |    SELECT e.dst AS dst,
      |      CASE WHEN e.dst IS NULL THEN p.rank
      |           ELSE p.rank/d.deg END AS share,
      |      p.iter AS iter
      |    FROM pr p
      |      LEFT JOIN deg d ON d.src = p.node
      |      LEFT JOIN edges e ON e.src = p.node
      |    WHERE p.iter < 8) c
      |  GROUP BY nn.node, nn.sv)
      |SELECT node, round(rank, 9) AS rank
      |FROM pr WHERE iter = 8 ORDER BY node""".stripMargin,
    doc = "personalized PageRank with seed-restart vs recursive-CTE oracle (graph analytics)") { (s, dir) =>
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 1L),
      (4L, 6L), (5L, 1L), (5L, 2L)).toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("node")
    Iterate.personalizedPageRank(edges, "src", "dst", seeds, iters = 8)
      .select(col("node").cast("int").as("node"),
        round(col("rank"), 9).as("rank"))
      .orderBy("node")
  }

  /** Pareto skyline over parts ([[graft.transform.Skyline]]): the
    * price/size frontier — no other part is both cheaper and larger.
    * The engine's grid-pruned two-phase plan (bucket-max prune in one
    * scan, exact dominance anti-join on the pruned remnant) must equal
    * the oracle's quadratic NOT EXISTS — a recall proof that the grid
    * prune only ever drops dominated points.
    */
  val qSkyline: QueryDef = QueryDef.sql(
    "q_skyline",
    """WITH p AS (
      |  SELECT DISTINCT CAST(p_retailprice AS DOUBLE) AS price,
      |    CAST(p_size AS DOUBLE) AS size
      |  FROM part)
      |SELECT price, size FROM p a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM p b
      |  WHERE (b.price < a.price AND b.size >= a.size)
      |     OR (b.price <= a.price AND b.size > a.size))
      |ORDER BY price, size""".stripMargin,
    doc = "Pareto skyline (min price, max size) via grid-pruned dominance join") { (s, dir) =>
    graft.transform.Skyline.skyline2d(
        t(s, dir, "part").select(col("p_retailprice").as("price"),
          col("p_size").as("size")),
        "price", "size")
      .orderBy("price", "size")
  }

  /** K-core decomposition ([[Iterate.kCorePeel]]) of the part
    * co-order graph (parts appearing on the same order): peel nodes of
    * degree < 80 for a fixed 8 rounds — at this density the peel
    * reaches its fixpoint in 6, so the output IS the 80-core. The
    * oracle unrolls the identical peel as 8 chained CTE stages
    * (generated, not hand-copied), so engine and oracle execute the
    * same rounds and must agree even off-fixpoint. All arithmetic
    * integral; output nodes carry their degree inside the surviving
    * subgraph.
    */
  val qKcore: QueryDef = {
    val rounds = 8
    val k = 80
    val peel = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT node, count(*) AS degree FROM (
         |    SELECT u AS node FROM e${i - 1}
         |    UNION ALL SELECT v FROM e${i - 1})
         |  GROUP BY node),
         |n$i AS MATERIALIZED (SELECT node FROM d$i WHERE degree >= $k),
         |e$i AS MATERIALIZED (
         |  SELECT u, v FROM e${i - 1}
         |  WHERE u IN (SELECT node FROM n$i)
         |    AND v IN (SELECT node FROM n$i))""".stripMargin
    }.mkString(",\n")
    QueryDef.sql(
      "q_kcore",
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey
         |    AND a.l_partkey < b.l_partkey),
         |$peel
         |SELECT node, count(*) AS degree FROM (
         |  SELECT u AS node FROM e$rounds UNION ALL SELECT v FROM e$rounds)
         |GROUP BY node ORDER BY node""".stripMargin,
      doc = "80-core of the part co-order graph via fixed-round distributed peel") { (s, dir) =>
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
      Iterate.kCorePeel(e, "u", "v", k = k, rounds = rounds).orderBy("node")
    }
  }

  /** TPC-H Q17 shape (small-quantity-order revenue): the CORRELATED
    * scalar subquery — "lineitems under 20% of their part's average
    * quantity" — stated correlated in the oracle and hand-decorrelated
    * in the engine: one per-part average pre-aggregation joined back
    * on the part key, so the "subquery" costs one map-side-combined
    * pass instead of a per-row probe. The per-part average is the
    * identical decimal-sum/count double in both engines, so the
    * threshold comparison can't flip on boundary rows.
    */
  val qTpchQ17: QueryDef = QueryDef.sql(
    "q_tpch_q17",
    s"""SELECT CAST(round(
      |    ${dsumSql("l.l_extendedprice")} / 7.0, 4) AS DOUBLE)
      |  AS avg_yearly
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#4'
      |  AND l.l_quantity < (
      |    SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(20,4)))
      |      AS DOUBLE) / count(*))
      |    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin,
    doc = "TPC-H Q17 shape: correlated scalar subquery decorrelated to pre-agg join") { (s, dir) =>
    val li = t(s, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val partAvg = li.groupBy("l_partkey")
      .agg((sum(col("l_quantity").cast("decimal(20,4)")).cast("double")
        / count(lit(1))).as("avg_qty"))
    val brand = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#4").select("p_partkey")
    li.join(brand, li("l_partkey") === brand("p_partkey"))
      .join(partAvg.withColumnRenamed("l_partkey", "pa_key"),
        col("l_partkey") === col("pa_key"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(round(dsum(col("l_extendedprice")) / 7.0, 4)
        .cast("double").as("avg_yearly"))
  }

  /** Item-item collaborative filtering: top-5 most-similar parts by
    * co-order cosine (cooc(i,j) / √(n_i·n_j)) — the classic
    * "customers who bought X" recommender primitive. Co-occurrence
    * counts are one self-join aggregation on the order key (group
    * sizes bounded by order width, not catalog size); item
    * frequencies broadcast back; the top-5 cut is a window KEYED by
    * item (scales with catalog) which Spark executes as
    * WindowGroupLimit — per-partition top-k, no full sort of the
    * similarity table. Cosines are √-of-integer doubles, identical in
    * both engines; ranking ties break on the partner key.
    */
  val qItemSimilarity: QueryDef = QueryDef.sql(
    "q_item_similarity",
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |cooc AS (
      |  SELECT a.l_partkey AS i, b.l_partkey AS j, count(*) AS c
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      |  GROUP BY 1, 2),
      |freq AS (SELECT l_partkey AS k, count(*) AS n FROM li GROUP BY 1),
      |sim AS (
      |  SELECT cooc.i, cooc.j,
      |    round(cooc.c / sqrt(CAST(fi.n AS DOUBLE) * fj.n), 6) AS cos,
      |    row_number() OVER (PARTITION BY cooc.i
      |      ORDER BY cooc.c / sqrt(CAST(fi.n AS DOUBLE) * fj.n) DESC,
      |        cooc.j) AS rk
      |  FROM cooc JOIN freq fi ON cooc.i = fi.k
      |            JOIN freq fj ON cooc.j = fj.k)
      |SELECT i, rk, j, cos FROM sim
      |WHERE rk <= 5 AND i <= 60
      |ORDER BY i, rk""".stripMargin,
    doc = "item-item co-order cosine top-5 (recommendation, WindowGroupLimit cut)") { (s, dir) =>
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    val a = li.select(col("l_orderkey"), col("l_partkey").as("i"))
    val b = li.select(col("l_orderkey"), col("l_partkey").as("j"))
    val cooc = a.join(b, Seq("l_orderkey"))
      .filter(col("i") =!= col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("c"))
    val freq = li.groupBy(col("l_partkey").as("k"))
      .agg(count(lit(1)).as("n"))
    // freq scales with the catalog — keyed joins, no forced broadcast
    val sim = cooc
      .join(freq.select(col("k").as("i"), col("n").as("ni")), Seq("i"))
      .join(freq.select(col("k").as("j"), col("n").as("nj")), Seq("j"))
      .withColumn("cosRaw",
        col("c") / sqrt(col("ni").cast("double") * col("nj")))
    val w = Window.partitionBy(col("i"))
      .orderBy(col("cosRaw").desc, col("j"))
    sim.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5 && col("i") <= 60)
      .select(col("i"), col("rk"), col("j"),
        round(col("cosRaw"), 6).as("cos"))
      .orderBy("i", "rk")
  }

  /** TPC-H Q18 shape (large-volume customers): the IN-subquery over a
    * HAVING aggregate, executed as a pre-aggregation LEFT SEMI join —
    * the qualifying-orders set is itself an aggregation output, never
    * a materialized list, so the filter costs one map-side-combined
    * pass and one keyed semi join at any scale. The top-10 rides
    * TakeOrderedAndProject; quantity sums are decimal-exact.
    */
  val qTpchQ18: QueryDef = QueryDef.sql(
    "q_tpch_q18",
    """WITH big AS (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300),
      |agg AS (
      |  SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
      |    CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |      AS total_qty
      |  FROM customer c
      |  JOIN orders o ON c.c_custkey = o.o_custkey
      |  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
      |  GROUP BY c.c_custkey, o.o_orderkey, o.o_totalprice)
      |SELECT c_custkey, o_orderkey,
      |  CAST(o_totalprice AS DOUBLE) AS o_totalprice, total_qty
      |FROM agg
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    doc = "TPC-H Q18 shape: HAVING-aggregate IN-subquery as pre-agg semi join") { (s, dir) =>
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
    val big = li.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("oq"))
      .filter(col("oq") > 300).select("l_orderkey")
    val ord = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .join(big.withColumnRenamed("l_orderkey", "o_orderkey"),
        Seq("o_orderkey"), "left_semi")
    val cust = t(s, dir, "customer").select("c_custkey")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"))
      .join(li, ord("o_orderkey") === li("l_orderkey"))
      .groupBy(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
        .as("total_qty"))
      .select(col("c_custkey"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Degree distribution + Hill power-law exponent of the user
    * co-occurrence graph: the graph-shape profile (how heavy is the
    * hub tail?) that decides whether joins on node keys need skew
    * defenses. Degrees are one aggregation; the Hill MLE
    * α = 1 + n·(Σ ln(dᵢ/(dmin−½)))⁻¹ over the tail d ≥ dmin uses the
    * decimal-cast ln-sum idiom, so the estimate is identical in both
    * engines.
    */
  val qDegreePowerlaw: QueryDef = QueryDef.sql(
    "q_degree_powerlaw",
    """WITH buckets AS (
      |  SELECT user_id, event_type, h FROM (
      |    SELECT user_id, event_type, h,
      |      row_number() OVER (PARTITION BY event_type, h
      |        ORDER BY user_id) AS rn
      |    FROM (SELECT DISTINCT user_id, event_type,
      |            date_trunc('hour', ts) AS h FROM events))
      |  WHERE rn <= 40),
      |edges AS (
      |  SELECT DISTINCT x.user_id AS u, y.user_id AS v
      |  FROM buckets x JOIN buckets y
      |    ON x.event_type = y.event_type AND x.h = y.h
      |    AND x.user_id < y.user_id),
      |deg AS (
      |  SELECT node, count(*) AS d FROM (
      |    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
      |  GROUP BY node),
      |tail AS (SELECT d FROM deg WHERE d >= 5)
      |SELECT
      |  (SELECT count(*) FROM deg) AS n_nodes,
      |  count(*) AS n_tail,
      |  CAST(min(5) AS BIGINT) AS d_min,
      |  round(1 + count(*) / CAST(sum(CAST(ln(d / 4.5)
      |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS alpha
      |FROM tail""".stripMargin,
    doc = "degree distribution Hill power-law exponent (graph shape profile)") { (s, dir) =>
    val edges = coOccurEdges(s, dir, "hour")
    val deg = edges.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    deg.filter(col("d") >= 5)
      .agg(count(lit(1)).as("n_tail"),
        sum(log(col("d") / 4.5).cast("decimal(28,12)")).cast("double")
          .as("slog"))
      .crossJoin(broadcast(nNodes))
      .select(col("n_nodes"), col("n_tail"), lit(5L).as("d_min"),
        round(lit(1) + col("n_tail") / col("slog"), 6).as("alpha"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    * DOUBLE correlated subquery — EXISTS (another supplier in the same
    * order) AND NOT EXISTS (another LATE supplier in the same order) —
    * stated literally in the oracle and decorrelated in the engine to
    * ONE per-order aggregation: per (order, supplier) late-flags roll
    * up to per-order (#distinct suppliers, #late suppliers), and a row
    * qualifies iff it is late, the order is multi-supplier, and its
    * supplier is the ONLY late one. Two self-joins become two
    * aggregations over the same l_orderkey exchange; the supplier
    * dimension broadcasts. "Late" is adapted to the testdata's columns
    * (shipdate > orderdate + 75 days — no receipt/commit dates here);
    * shape of TPC-H Q21 (`specification`, public).
    */
  val qTpchQ21: QueryDef = QueryDef.sql(
    "q_tpch_q21",
    """WITH lo AS (
      |  SELECT l.l_orderkey, l.l_suppkey,
      |    CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
      |      THEN 1 ELSE 0 END AS late
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderstatus = 'F')
      |SELECT s.s_name, count(*) AS numwait
      |FROM lo l1
      |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
      |WHERE l1.late = 1
      |  AND EXISTS (SELECT 1 FROM lo l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lo l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s.s_name LIMIT 20""".stripMargin,
    doc = "TPC-H Q21 shape: exists/not-exists pair decorrelated to one per-order aggregation") { (s, dir) =>
    val lo = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(t(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 75 DAYS"))
          .cast("int").as("late"))
      // One explicit fact exchange on the order key. hash(l_orderkey)
      // satisfies every downstream requirement — the (orderkey,
      // suppkey) aggregation (subset clustering), the per-order
      // rollup, and the join back — and the two consumers of `lo`
      // share the identical subtree, so ReuseExchange ships the fact
      // ONCE instead of the 3-exchange / 2-scan plan the planner
      // picks bottom-up (pinned in TpchPlanSpec).
      .repartition(col("l_orderkey"))
    // Decorrelation: both EXISTS collapse into one per-order profile.
    val perSupp = lo.groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("late")).as("slate"))
    val perOrd = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("nsupp"), sum(col("slate")).as("nlate"))
    lo.filter(col("late") === 1)
      .join(perOrd, Seq("l_orderkey"))
      .filter(col("nsupp") > 1 && col("nlate") === 1)
      .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q22 shape (global sales opportunity): a SCALAR aggregate
    * subquery (average positive balance over the candidate nations)
    * used as a filter threshold, plus a NOT EXISTS anti join against
    * the activity table. The scalar is a one-row broadcast — never a
    * per-row re-evaluation — and the anti probe is a distinct-key
    * left_anti join. Adapted to the testdata's columns: nation-key set
    * instead of phone prefixes, "no URGENT order" instead of "no
    * order" (every sf customer has orders). Shape of TPC-H Q22
    * (`specification`, public).
    */
  val qTpchQ22: QueryDef = QueryDef.sql(
    "q_tpch_q22",
    """WITH pool AS (SELECT * FROM customer
      |  WHERE c_nationkey IN (1,3,5,7,9,11,13)),
      |ab AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(20,4)))
      |    AS DOUBLE) / count(*) AS a
      |  FROM pool WHERE c_acctbal > 0)
      |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE)
      |    AS totacctbal
      |FROM pool, ab
      |WHERE c_acctbal > ab.a
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = pool.c_custkey
      |      AND o.o_orderpriority = '1-URGENT')
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    doc = "TPC-H Q22 shape: scalar-subquery threshold broadcast + anti join") { (s, dir) =>
    val pool = t(s, dir, "customer")
      .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val avgBal = pool.filter(col("c_acctbal") > 0)
      .agg((dsum(col("c_acctbal")) / count(lit(1))).as("a"))
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct()
    pool.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("a"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("cntrycode")
  }

  val all: Seq[QueryDef] = Seq(
    q1Agg, qScanProject, qFilterIn, qJoinInner, qJoinAnti, qJoinSemi,
    qJoinLeftOuter, qJoinCrossBounds, qJoinTheta, qJoinNullSafe, qJoinUsing,
    qUnionAll, qExcept, qRollup, qCube, qTopK, qWindowRank, qWindowFuncs,
    qWindowRange, qSubqueryExists, qTransitiveClosure, qBloomPrune,
    qGroupingSets, qIntersectAll, qTpchQ3, qTpchQ5, qMergeScd2, qFuzzyMatch,
    qPageRank, qPageRankGeneral, qTriangles, qClusteringCoeff,
    qConnectedComponents, qSssp, qLinkPrediction, qPpr, qSkyline, qKcore,
    qTpchQ17, qItemSimilarity, qTpchQ18, qDegreePowerlaw, qTpchQ21,
    qTpchQ22)
}
