package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.transform.Transforms
import graft.profile.Sampling

/** Oracle-verified queries driving the transform + sampling MODULES
  * (not reimplementations) over the driver testdata, so the
  * correctness gate covers module code paths end-to-end.
  */
object TransformQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Melt (wide→long unpivot) — the reference's signature transform
    * (`data_transformer.py:169-211`) applied to lineitem measures.
    * UNPIVOT is a Generate: zero shuffle, local row expansion.
    */
  val qMelt: QueryDef = QueryDef.sql(
    "q_melt",
    """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem WHERE l_orderkey <= 1000
      |UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem WHERE l_orderkey <= 1000
      |UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem WHERE l_orderkey <= 1000
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    doc = "melt/unpivot wide->long (SURVEY §2.11 melt)") { (s, dir) =>
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") <= 1000)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount")
    Transforms.melt(li, idCols = Seq("l_orderkey", "l_linenumber"),
      variableName = "metric", valueName = "val")
      .orderBy("l_orderkey", "l_linenumber", "metric")
  }

  /** Global min-max normalize (`data_transformer.py:139-167`, dataset-
    * level semantics per SURVEY §7.4.2): scalar-agg bounds broadcast
    * over the scan — the big side never shuffles.
    */
  val qNormalizeGlobal: QueryDef = QueryDef.sql(
    "q_normalize_global",
    """SELECT o_orderkey,
      |  CAST(round((o_totalprice - lo) / (hi - lo), 6) AS DOUBLE) AS normalized
      |FROM orders CROSS JOIN
      |  (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders) b
      |WHERE o_orderkey <= 500
      |ORDER BY o_orderkey""".stripMargin,
    doc = "global min-max normalize (SURVEY A2)") { (s, dir) =>
    Transforms.normalizeGlobal(t(s, dir, "orders"), "o_totalprice")
      .filter(col("o_orderkey") <= 500)
      .select(col("o_orderkey"),
        round(col("normalized"), 6).cast("double").as("normalized"))
      .orderBy("o_orderkey")
  }

  /** Per-group min-max normalize — one window shuffle on the group
    * key (SURVEY A2 per-group variant).
    */
  val qNormalizeGroup: QueryDef = QueryDef.sql(
    "q_normalize_group",
    """SELECT c_custkey,
      |  CAST(round((c_acctbal - min(c_acctbal) OVER (PARTITION BY c_mktsegment))
      |    / (max(c_acctbal) OVER (PARTITION BY c_mktsegment)
      |       - min(c_acctbal) OVER (PARTITION BY c_mktsegment)), 6) AS DOUBLE) AS normalized
      |FROM customer
      |ORDER BY c_custkey""".stripMargin,
    doc = "per-group min-max normalize (SURVEY A2)") { (s, dir) =>
    Transforms.normalizePerGroup(t(s, dir, "customer"), "c_acctbal",
        Seq("c_mktsegment"))
      .select(col("c_custkey"),
        round(col("normalized"), 6).cast("double").as("normalized"))
      .orderBy("c_custkey")
  }

  /** Systematic sampling (SURVEY SA2): every ⌊total/size⌋-th row in
    * key order. The oracle recomputes the capped size and stride from
    * the table's own count (min(requested, 100k, 0.5%·total), stride =
    * total ÷ size) so the check holds at every scale factor — a
    * hardcoded stride silently diverges the moment the row count
    * changes. floor() is explicit because DuckDB's double->bigint cast
    * ROUNDS while Scala's .toLong truncates (off-by-one at sf0.001
    * where 0.5% of 1500 = 7.5).
    */
  val qSampleSystematic: QueryDef = QueryDef.sql(
    "q_sample_systematic",
    """WITH p AS (
      |  SELECT greatest(count(*) // least(100,
      |           greatest(CAST(floor(count(*) * 0.005) AS BIGINT), 1)), 1) AS step
      |  FROM orders)
      |SELECT o_orderkey FROM (
      |  SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn
      |  FROM orders) CROSS JOIN p
      |WHERE (rn - 1) % step = 0
      |ORDER BY o_orderkey""".stripMargin,
    doc = "systematic sampling stride (SURVEY SA2)") { (s, dir) =>
    new Sampling.SystematicStrategy("o_orderkey")
      .sample(t(s, dir, "orders"), 100)
      .select("o_orderkey")
      .orderBy("o_orderkey")
  }

  /** Stratified fixed-n sampling (SURVEY SA3), deterministic variant:
    * lowest-keyed n rows per stratum via one partitioned window.
    */
  val qSampleStratified: QueryDef = QueryDef.sql(
    "q_sample_stratified",
    """SELECT lang, doc_id FROM (
      |  SELECT lang, doc_id,
      |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 3
      |ORDER BY lang, doc_id""".stripMargin,
    doc = "stratified fixed-n sampling (SURVEY SA3)") { (s, dir) =>
    new Sampling.StratifiedStrategy("lang", "doc_id")
      .sample(t(s, dir, "documents"), 3)
      .select("lang", "doc_id")
      .orderBy("lang", "doc_id")
  }

  /** Random sampling (SURVEY SA1): seeded Bernoulli draw with forced
    * first/last-row inclusion. Spark's sample() draw has no DuckDB
    * twin (membership is engine-specific), so the hash-checked output
    * is the strategy's CONTRACT, proven in-plan over the real sample:
    * first and last key present, no duplicate rows, every key drawn
    * from the table's key range. The oracle recomputes the expected
    * first/last keys from the table and states the invariants.
    */
  val qSampleRandom: QueryDef = QueryDef.sql(
    "q_sample_random",
    """SELECT min(o_orderkey) AS first_key, max(o_orderkey) AS last_key,
      |  true AS has_first, true AS has_last, true AS no_dupes, true AS in_range
      |FROM orders""".stripMargin,
    doc = "seeded random sampling w/ first+last inclusion (SURVEY SA1)") { (s, dir) =>
    val orders = t(s, dir, "orders")
    val sample = new Sampling.RandomStrategy("o_orderkey")
      .sample(orders, 200).select("o_orderkey")
    val bounds = orders.agg(
      min(col("o_orderkey")).as("tbl_min"),
      max(col("o_orderkey")).as("tbl_max"))
    sample.crossJoin(broadcast(bounds))
      .agg(
        min(col("tbl_min")).as("first_key"),
        max(col("tbl_max")).as("last_key"),
        max(when(col("o_orderkey") === col("tbl_min"), 1).otherwise(0))
          .as("hit_first"),
        max(when(col("o_orderkey") === col("tbl_max"), 1).otherwise(0))
          .as("hit_last"),
        count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_distinct"),
        min(when(col("o_orderkey").between(col("tbl_min"), col("tbl_max")), 1)
          .otherwise(0)).as("all_in_range"))
      .select(col("first_key"), col("last_key"),
        (col("hit_first") === 1).as("has_first"),
        (col("hit_last") === 1).as("has_last"),
        (col("n") === col("n_distinct")).as("no_dupes"),
        (col("all_in_range") === 1).as("in_range"))
  }

  /** Mixture sampling (training-data curation): deterministic largest-
    * remainder quotas from language weights, first-n per language by
    * doc_id. Quotas are driver-computed from the weights alone, so the
    * oracle can state them as literals; the data-side semantics (rank
    * within group ≤ quota) mirror exactly.
    */
  private val MixtureWeights = Map(
    "en" -> 0.5, "de" -> 0.2, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.05)
  private val MixtureQuotas = Sampling.mixtureQuotas(MixtureWeights, 100)

  val qMixtureSample: QueryDef = QueryDef.sql(
    "q_mixture_sample",
    s"""SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
       |  FROM documents)
       |WHERE ${MixtureQuotas.toSeq.sortBy(_._1)
          .map { case (g, q) => s"(lang = '$g' AND rn <= $q)" }
          .mkString("\n   OR ")}
       |ORDER BY doc_id""".stripMargin,
    doc = "weighted mixture sampling (training-data curation)") { (s, dir) =>
    Sampling.mixtureSample(t(s, dir, "documents"), "lang", "doc_id",
        MixtureWeights, 100)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** MERGE INTO semantics ([[graft.store.Warehouse.mergeFrames]]):
    * updated rows win, unmatched existing rows survive, brand-new keys
    * insert — the oracle states it as updates ∪ (existing ANTI JOIN
    * updates). The warehouse-level merge (partition-selective rewrite)
    * is exercised in WarehouseSpec; this pins the relational core.
    */
  val qMergeUpsert: QueryDef = QueryDef.sql(
    "q_merge_upsert",
    """WITH existing AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      |  FROM orders WHERE o_orderkey < 1000),
      |updates AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice,
      |    'U' AS o_orderstatus
      |  FROM orders WHERE o_orderkey < 100
      |  UNION ALL
      |  SELECT o_orderkey + 1000000, o_custkey, o_totalprice, 'N'
      |  FROM orders WHERE o_orderkey < 50)
      |SELECT * FROM updates
      |UNION ALL
      |SELECT e.* FROM existing e ANTI JOIN updates u
      |  ON e.o_orderkey = u.o_orderkey
      |ORDER BY o_orderkey""".stripMargin,
    doc = "MERGE INTO upsert: updates win, new keys insert (warehouse ops)") { (s, dir) =>
    import graft.store.Warehouse
    val o = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val existing = o.filter(col("o_orderkey") < 1000)
    val updates = o.filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") * 2).as("o_totalprice"),
        lit("U").as("o_orderstatus"))
      .unionByName(o.filter(col("o_orderkey") < 50)
        .select((col("o_orderkey") + 1000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"),
          lit("N").as("o_orderstatus")))
    Warehouse.mergeFrames(existing, updates, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  /** Morton z-value computation ([[graft.store.ZOrder.zValue]]) —
    * the data-skipping sort key, bit-exact against the oracle's
    * shift/mask arithmetic (both sides generated from the same bit
    * layout: bit j of col c → position j*k + (k-1-c)). The layout
    * write + footer-pruning payoff is proven in ZOrderSpec; this pins
    * the curve itself.
    */
  val qZorderValue: QueryDef = {
    val zexprSql = (0 until 8).flatMap(j => Seq(
      s"((((l_orderkey % 256) >> $j) & 1) << ${2 * j + 1})",
      s"((((l_suppkey % 256) >> $j) & 1) << ${2 * j})")).mkString(" | ")
    QueryDef.sql(
      "q_zorder_value",
      s"""SELECT l_orderkey, l_linenumber,
         |  $zexprSql AS zv
         |FROM lineitem WHERE l_orderkey < 2000
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,
      doc = "Morton z-value bit interleave, bit-exact vs SQL shifts (layout ops)") { (s, dir) =>
      import graft.store.ZOrder
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          ZOrder.zValue(
            Seq(col("l_orderkey") % 256, col("l_suppkey") % 256), 8).as("zv"))
        .orderBy("l_orderkey", "l_linenumber")
    }
  }

  /** Weighted sampling without replacement
    * ([[Sampling.weightedSample]], Efraimidis-Spirakis A-ES): the
    * reproducible uniform comes from the same 16-bit-limb hash32 as
    * the split bucketing, so the DuckDB oracle replays the identical
    * draw arithmetic BIGINT-for-BIGINT and the selected id set matches
    * exactly — a fully oracle-checked weighted draw, not just an
    * invariant contract. Weight = document length (the
    * importance-weighted curation shape; pairs with DSIR scores at
    * scale); plan is one distributed top-k, no global sort.
    */
  val qSampleWeighted: QueryDef = QueryDef.sql(
    "q_sample_weighted",
    """SELECT doc_id, n_chars FROM (
      |  SELECT doc_id, n_chars,
      |    ln((((((((doc_id % 4294967296) + 4294967296) % 4294967296)
      |            // 65536) * 2654435761) % 4294967296 * 65536
      |         + (((doc_id % 4294967296) + 4294967296) % 4294967296)
      |            % 65536 * 2654435761) % 4294967296 + 0.5)
      |       / 4294967296.0) / n_chars AS wkey
      |  FROM documents WHERE n_chars > 0
      |  ORDER BY wkey DESC LIMIT 60)
      |ORDER BY doc_id""".stripMargin,
    doc = "A-ES weighted sample w/o replacement, hash-reproducible draw (SURVEY SA extension)") { (s, dir) =>
    Sampling.weightedSample(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 60)
      .orderBy("doc_id")
  }

  /** Incremental materialized-view maintenance
    * ([[graft.store.MatView]]): the fact table arrives as three
    * deterministic delta batches (`l_orderkey % 3`), each folded into
    * the keyed partial state (exact decimal sums, counts, extrema) by
    * the associative merge, and the finalized view must equal the
    * oracle's ONE-SHOT aggregation over the full table — the
    * refresh-schedule-independence contract that lets a 100 TB rollup
    * refresh at O(delta + state) cost. The disk-backed refresh loop
    * (crash-safe state replace, HLL register merge) is proven in
    * MatViewSpec; this pins the algebra end-to-end against DuckDB.
    */
  val qMatviewRollup: QueryDef = QueryDef.sql(
    "q_matview_rollup",
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
      |    AS sum_l_quantity,
      |  min(l_shipdate) AS min_l_shipdate,
      |  max(l_extendedprice) AS max_l_extendedprice,
      |  CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE)
      |    / count(l_discount) AS avg_l_discount
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    doc = "incremental materialized view: 3-batch partial-state fold == one-shot aggregate") { (s, dir) =>
    import graft.store.{MatView, MatViewDef, MvMeasure}
    val mv = MatViewDef("rollup", Seq("l_returnflag", "l_linestatus"), Seq(
      MvMeasure("count"), MvMeasure("sum", "l_quantity"),
      MvMeasure("min", "l_shipdate"), MvMeasure("max", "l_extendedprice"),
      MvMeasure("avg", "l_discount")))
    val li = t(s, dir, "lineitem")
    val batches = (0 to 2).map(i =>
      MatView.partial(li.filter(pmod(col("l_orderkey"), lit(3)) === i), mv))
    val state = batches.reduce(MatView.mergeStates(_, _, mv))
    MatView.finalizeView(state, mv)
      .withColumn("sum_l_quantity", col("sum_l_quantity").cast("double"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Snapshot CDC ([[graft.store.SnapshotDiff]]): a mutation batch
    * (keyed deletes, value updates, inserts) applied to orders, then
    * the diff of the two snapshots must recover exactly the applied
    * changes — the oracle restates the classification as a literal
    * FULL OUTER JOIN with IS NOT DISTINCT FROM column compares. One
    * keyed co-partitioned join at any scale; the fingerprint variant
    * for wide tables is pinned equivalent in SnapshotDiffSpec.
    */
  val qSnapshotDiff: QueryDef = QueryDef.sql(
    "q_snapshot_diff",
    """WITH b AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      |  FROM orders),
      |a AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderstatus
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 1000000, o_custkey, o_totalprice, 'N'
      |  FROM orders WHERE o_orderkey < 50)
      |SELECT coalesce(b.o_orderkey, a.o_orderkey) AS o_orderkey,
      |  CASE WHEN b.o_orderkey IS NULL THEN 'insert'
      |       WHEN a.o_orderkey IS NULL THEN 'delete'
      |       WHEN NOT (b.o_custkey IS NOT DISTINCT FROM a.o_custkey
      |             AND b.o_totalprice IS NOT DISTINCT FROM a.o_totalprice
      |             AND b.o_orderstatus IS NOT DISTINCT FROM a.o_orderstatus)
      |       THEN 'update' END AS change
      |FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey
      |WHERE CASE WHEN b.o_orderkey IS NULL THEN 'insert'
      |       WHEN a.o_orderkey IS NULL THEN 'delete'
      |       WHEN NOT (b.o_custkey IS NOT DISTINCT FROM a.o_custkey
      |             AND b.o_totalprice IS NOT DISTINCT FROM a.o_totalprice
      |             AND b.o_orderstatus IS NOT DISTINCT FROM a.o_orderstatus)
      |       THEN 'update' END IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin,
    doc = "snapshot CDC: keyed full-outer diff recovers the applied mutation batch") { (s, dir) =>
    import graft.store.SnapshotDiff
    val before = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val after = before.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")))
      .unionByName(before.filter(col("o_orderkey") < 50)
        .select((col("o_orderkey") + 1000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"),
          lit("N").as("o_orderstatus")))
    SnapshotDiff.diff(before, after, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  /** Incremental JOIN-view maintenance ([[graft.store.JoinView]]):
    * orders and lineitem each arrive in three append-only batches and
    * the view grows by the delta-join algebra
    * ΔL⋈R_old ∪ (L_old ∪ ΔL)⋈ΔR — every batch pair joined exactly
    * once, refresh cost O(Δ⋈archive), never a history re-join. The
    * folded view must equal the oracle's one-shot join. Disk-backed
    * replay idempotence is proven in JoinViewSpec.
    */
  val qMatviewJoin: QueryDef = QueryDef.sql(
    "q_matview_join",
    """SELECT o.o_orderkey, l.l_linenumber, o.o_custkey, l.l_quantity
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE o.o_orderkey < 3000
      |ORDER BY o_orderkey, l_linenumber, l_quantity""".stripMargin,
    doc = "incremental join-view: 3x3 delta-join fold == one-shot join") { (s, dir) =>
    val ords = t(s, dir, "orders")
      .filter(col("o_orderkey") < 3000)
      .select("o_orderkey", "o_custkey")
    val li = t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 3000)
      .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
        col("l_quantity"))
    def dL(i: Int) = ords.filter(pmod(col("o_orderkey"), lit(3)) === i)
    def dR(i: Int) = li.filter(pmod(col("l_linenumber"), lit(3)) === i)
    // in-plan fold of the JoinView delta algebra across 3 batch pairs
    var aL = ords.limit(0); var aR = li.limit(0)
    var view = ords.join(li.limit(0), Seq("o_orderkey"))
    (0 to 2).foreach { i =>
      val nl = dL(i); val nr = dR(i)
      view = view.unionByName(nl.join(aR, Seq("o_orderkey")))
        .unionByName(aL.unionByName(nl).join(nr, Seq("o_orderkey")))
      aL = aL.unionByName(nl); aR = aR.unionByName(nr)
    }
    view.select("o_orderkey", "l_linenumber", "o_custkey", "l_quantity")
      .orderBy("o_orderkey", "l_linenumber", "l_quantity")
  }

  /** Incremental CUBE maintenance ([[graft.store.MatView.partialCube]]):
    * every grouping set of the cube folds batch-by-batch through the
    * same mergeable-partial algebra (cube-of-union = merge-of-cubes),
    * keyed by grouping id — Spark's `grouping_id()` and DuckDB's
    * GROUPING_ID share the bit convention (first key most
    * significant), so the oracle checks all 4 grouping sets exactly.
    */
  val qMatviewCube: QueryDef = QueryDef.sql(
    "q_matview_cube",
    """SELECT GROUPING_ID(l_returnflag, l_linestatus) AS gid,
      |  l_returnflag, l_linestatus, count(*) AS cnt,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
      |    AS sum_l_quantity
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    doc = "incremental cube: 3-batch grouping-set fold == one-shot GROUP BY CUBE") { (s, dir) =>
    import graft.store.{MatView, MatViewDef, MvMeasure}
    val mv = MatViewDef("cube", Seq("l_returnflag", "l_linestatus"),
      Seq(MvMeasure("count"), MvMeasure("sum", "l_quantity")))
    val li = t(s, dir, "lineitem")
    val state = (0 to 2)
      .map(i => MatView.partialCube(
        li.filter(pmod(col("l_orderkey"), lit(3)) === i), mv))
      .reduce(MatView.mergeCubes(_, _, mv))
    MatView.finalizeCube(state, mv)
      .select(col("__gid").as("gid"), col("l_returnflag"),
        col("l_linestatus"), col("cnt"),
        col("sum_l_quantity").cast("double").as("sum_l_quantity"))
      .orderBy("gid", "l_returnflag", "l_linestatus")
  }

  /** Retraction IVM, rescan path ([[graft.store.MatView.mutateState]]):
    * a mutation batch (keyed deletes, value updates, inserts) folds
    * into a view holding NON-invertible measures (min/max) — groups
    * touched by a removal are rebuilt from the post-mutation base
    * restricted by semi-join to the affected keys (O(Δkeys · group),
    * never a full rescan), groups only appended-to fold
    * incrementally. The oracle recomputes the view ONE-SHOT over the
    * mutated table — the drift this closes: an append-only fold over
    * a merged/CDC-maintained base silently diverges.
    */
  val qMatviewDelete: QueryDef = QueryDef.sql(
    "q_matview_delete",
    """WITH a AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 100
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 1000000, 'N', o_totalprice
      |  FROM orders WHERE o_orderkey < 50)
      |SELECT o_orderstatus, count(*) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
      |    AS sum_o_totalprice,
      |  min(o_totalprice) AS min_o_totalprice,
      |  max(o_totalprice) AS max_o_totalprice
      |FROM a GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    doc = "retraction IVM (rescan path): delete/update/insert batch folds == one-shot over mutated base") { (s, dir) =>
    import graft.store.{MatView, MatViewDef, MvMeasure}
    val mv = MatViewDef("ret_delete", Seq("o_orderstatus"), Seq(
      MvMeasure("count"), MvMeasure("sum", "o_totalprice"),
      MvMeasure("min", "o_totalprice"), MvMeasure("max", "o_totalprice")))
    val before = t(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val deletes = before.filter(col("o_orderkey") % 97 === 0)
    val updPre = before.filter(col("o_orderkey") % 97 =!= 0 &&
      col("o_orderkey") % 13 === 0)
    val updPost = updPre.withColumn("o_totalprice", col("o_totalprice") + 100)
    val inserts = before.filter(col("o_orderkey") < 50)
      .select((col("o_orderkey") + 1000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("o_totalprice"))
    val after = before.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 100)
          .otherwise(col("o_totalprice")))
      .unionByName(inserts)
    val state0 = MatView.partial(before, mv)
    val state1 = MatView.mutateState(state0,
      deletes.unionByName(updPre), updPost.unionByName(inserts), after, mv)
    MatView.finalizeView(state1, mv)
      .withColumn("sum_o_totalprice", col("sum_o_totalprice").cast("double"))
      .orderBy("o_orderstatus")
  }

  /** Retraction IVM, signed path: when EVERY measure is invertible
    * (count/sum/avg form a group under +row/−row), the same mutation
    * batch folds as one signed partial merged into state — the base
    * table is NEVER read (`baseAfter` here is a poison pill that
    * throws on evaluation, so this oracle entry also proves the
    * zero-base-I/O contract at the gate). O(|delta| + |state|) per
    * mutation at any base scale.
    */
  val qMatviewRetractSigned: QueryDef = QueryDef.sql(
    "q_matview_retract_signed",
    """WITH a AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 100
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 1000000, 'N', o_totalprice
      |  FROM orders WHERE o_orderkey < 50)
      |SELECT o_orderstatus, count(*) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
      |    AS sum_o_totalprice,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
      |    / count(o_totalprice) AS avg_o_totalprice
      |FROM a GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    doc = "retraction IVM (signed path): invertible measures retract with zero base reads") { (s, dir) =>
    import graft.store.{MatView, MatViewDef, MvMeasure}
    val mv = MatViewDef("ret_signed", Seq("o_orderstatus"), Seq(
      MvMeasure("count"), MvMeasure("sum", "o_totalprice"),
      MvMeasure("avg", "o_totalprice")))
    val before = t(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val deletes = before.filter(col("o_orderkey") % 97 === 0)
    val updPre = before.filter(col("o_orderkey") % 97 =!= 0 &&
      col("o_orderkey") % 13 === 0)
    val updPost = updPre.withColumn("o_totalprice", col("o_totalprice") + 100)
    val inserts = before.filter(col("o_orderkey") < 50)
      .select((col("o_orderkey") + 1000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("o_totalprice"))
    val state0 = MatView.partial(before, mv)
    val state1 = MatView.mutateState(state0,
      deletes.unionByName(updPre), updPost.unionByName(inserts),
      sys.error("signed retraction must not read the base"), mv)
    MatView.finalizeView(state1, mv)
      .withColumn("sum_o_totalprice", col("sum_o_totalprice").cast("double"))
      .orderBy("o_orderstatus")
  }

  /** Cube retraction ([[graft.store.MatView.mutateCube]]): the same
    * delete/update/insert batch as q_matview_retract_signed folds
    * into a CUBE state — every grouping set retracts independently
    * through the signed partials under the shared grouping id, and
    * the oracle recomputes GROUP BY CUBE one-shot over the mutated
    * table. Invertible measures only (the all-rollup grouping set
    * makes semilattice rescans base-sized — mutateCube refuses them).
    */
  val qMatviewCubeRetract: QueryDef = QueryDef.sql(
    "q_matview_cube_retract",
    """WITH a AS (
      |  SELECT o_orderkey, o_orderstatus, o_orderpriority,
      |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 100
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 1000000, 'N', '0-NEW', o_totalprice
      |  FROM orders WHERE o_orderkey < 50)
      |SELECT GROUPING_ID(o_orderstatus, o_orderpriority) AS gid,
      |  o_orderstatus, o_orderpriority, count(*) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
      |    AS sum_o_totalprice
      |FROM a GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,
    doc = "cube retraction: signed grouping-set fold == one-shot GROUP BY CUBE over mutated base") { (s, dir) =>
    import graft.store.{MatView, MatViewDef, MvMeasure}
    val mv = MatViewDef("ret_cube", Seq("o_orderstatus", "o_orderpriority"),
      Seq(MvMeasure("count"), MvMeasure("sum", "o_totalprice")))
    val before = t(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice")
    val deletes = before.filter(col("o_orderkey") % 97 === 0)
    val updPre = before.filter(col("o_orderkey") % 97 =!= 0 &&
      col("o_orderkey") % 13 === 0)
    val updPost = updPre.withColumn("o_totalprice", col("o_totalprice") + 100)
    val inserts = before.filter(col("o_orderkey") < 50)
      .select((col("o_orderkey") + 1000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), lit("0-NEW").as("o_orderpriority"),
        col("o_totalprice"))
    val state0 = MatView.partialCube(before, mv)
    val state1 = MatView.mutateCube(state0,
      deletes.unionByName(updPre), updPost.unionByName(inserts), mv)
    MatView.finalizeCube(state1, mv)
      .select(col("__gid").as("gid"), col("o_orderstatus"),
        col("o_orderpriority"), col("cnt"),
        col("sum_o_totalprice").cast("double").as("sum_o_totalprice"))
      .orderBy("gid", "o_orderstatus", "o_orderpriority")
  }

  /** Exact COUNT(DISTINCT) retraction
    * ([[graft.store.MatView.distinctDef]]): the same
    * delete/update/insert schedule folds into the keyed SUB-STATE —
    * one row per (status, custkey) multiplicity, invertible, so the
    * whole mutation rides the signed path with a poison-pill base
    * (zero base reads, proven at the gate like
    * q_matview_retract_signed) — and finalizes as the count of
    * surviving sub-rows. The oracle recomputes COUNT(DISTINCT)
    * one-shot over the mutated table; the schedule exercises both
    * hazards: a deleted row whose value survives elsewhere (the
    * multiplicity must NOT hit zero) and updates that move a value
    * out of its group entirely.
    */
  val qMatviewDistinctRetract: QueryDef = QueryDef.sql(
    "q_matview_distinct_retract",
    """WITH a AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 500000
      |         ELSE o_custkey END AS o_custkey
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 1000000, 'N', o_custkey
      |  FROM orders WHERE o_orderkey < 50)
      |SELECT o_orderstatus, count(DISTINCT o_custkey) AS distinct_o_custkey
      |FROM a GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    doc = "COUNT(DISTINCT) retraction via keyed sub-state: delete/update/insert fold == one-shot distinct over mutated base") { (s, dir) =>
    import graft.store.MatView
    val dd = MatView.distinctDef("ret_distinct", Seq("o_orderstatus"),
      "o_custkey")
    val before = t(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_custkey")
    val deletes = before.filter(col("o_orderkey") % 97 === 0)
    val updPre = before.filter(col("o_orderkey") % 97 =!= 0 &&
      col("o_orderkey") % 13 === 0)
    val updPost = updPre.withColumn("o_custkey", col("o_custkey") + 500000L)
    val inserts = before.filter(col("o_orderkey") < 50)
      .select((col("o_orderkey") + 1000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("o_custkey"))
    val state0 = MatView.partial(before, dd)
    val state1 = MatView.mutateState(state0,
      deletes.unionByName(updPre), updPost.unionByName(inserts),
      sys.error("distinct retraction must not read the base"), dd)
    MatView.finalizeDistinct(state1, Seq("o_orderstatus"), "o_custkey")
      .orderBy("o_orderstatus")
  }

  /** Join-view retraction ([[graft.store.JoinView.mutateView]]): the
    * maintained orders⋈lineitem view absorbs a mutation on BOTH sides
    * — order deletions, lineitem quantity updates (remove pre-image +
    * add post-image), fresh lineitem inserts — through id-keyed anti
    * joins plus the one-sided delta additions, and must equal the
    * oracle's one-shot join over the mutated inputs. The append-only
    * fold (q_matview_join) and this mutation fold together cover the
    * full JoinView algebra at the gate.
    */
  val qJoinviewMutate: QueryDef = QueryDef.sql(
    "q_joinview_mutate",
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey FROM orders
      |  WHERE o_orderkey < 3000 AND o_orderkey % 19 <> 0),
      |l AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN l_linenumber = 1 THEN l_quantity + 100
      |         ELSE l_quantity END AS l_quantity
      |  FROM lineitem WHERE l_orderkey < 3000
      |  UNION ALL
      |  SELECT l_orderkey, 900 + l_linenumber, l_quantity
      |  FROM lineitem WHERE l_orderkey < 100)
      |SELECT o.o_orderkey, l.l_linenumber, o.o_custkey, l.l_quantity
      |FROM o JOIN l ON o.o_orderkey = l.l_orderkey
      |ORDER BY o_orderkey, l_linenumber, l_quantity""".stripMargin,
    doc = "join-view retraction: two-sided delete/update/insert fold == one-shot join of mutated inputs") { (s, dir) =>
    import graft.store.JoinView
    val ords = t(s, dir, "orders")
      .filter(col("o_orderkey") < 3000)
      .select("o_orderkey", "o_custkey")
    val li = t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 3000)
      .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
        col("l_quantity"))
    val view0 = ords.join(li, Seq("o_orderkey"))
    // left: delete every 19th order; right: update line 1's quantity
    // (+100) and insert shifted copies for low orderkeys
    val lRem = ords.filter(col("o_orderkey") % 19 === 0)
    val rUpdPre = li.filter(col("l_linenumber") === 1)
    val rUpdPost = rUpdPre.withColumn("l_quantity", col("l_quantity") + 100)
    val rIns = li.filter(col("o_orderkey") < 100)
      .withColumn("l_linenumber", col("l_linenumber") + 900)
    val lAfter = ords.filter(col("o_orderkey") % 19 =!= 0)
    val rAfter = li.filter(col("l_linenumber") =!= 1)
      .unionByName(rUpdPost).unionByName(rIns)
    JoinView.mutateView(view0, Seq("o_orderkey"), lAfter, rAfter,
        leftId = Seq("o_orderkey"),
        rightId = Seq("o_orderkey", "l_linenumber", "l_quantity"),
        lRemoved = lRem, lAdded = lAfter.limit(0),
        rRemoved = rUpdPre, rAdded = rUpdPost.unionByName(rIns))
      .select("o_orderkey", "l_linenumber", "o_custkey", "l_quantity")
      .orderBy("o_orderkey", "l_linenumber", "l_quantity")
  }

  val all: Seq[QueryDef] = Seq(
    qMelt, qNormalizeGlobal, qNormalizeGroup, qSampleSystematic,
    qSampleStratified, qSampleRandom, qMixtureSample, qMergeUpsert,
    qZorderValue, qSampleWeighted, qMatviewRollup, qSnapshotDiff,
    qMatviewJoin, qMatviewCube, qMatviewDelete, qMatviewRetractSigned,
    qMatviewCubeRetract, qMatviewDistinctRetract, qJoinviewMutate)
}
