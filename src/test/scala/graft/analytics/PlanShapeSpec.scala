package graft.analytics

import graft.SparkSpec
import graft.ops.EngineOps

/** Physical-plan regression guards for the plans the 100 TB posture
  * depends on. A silent optimizer/plan change that turns a broadcast
  * into a sort-merge shuffle or un-prunes a scan would pass every
  * value-level test and only show up at scale — these specs pin the
  * shapes.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    EngineOps.explain(Catalog.byName(name).run(spark, dir), "formatted")

  test("q_overlap_semi: bounds side broadcast, semi join, no sort-merge") {
    val p = plan("q_overlap_semi")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("LeftSemi"), p.take(800))
  }

  test("q_join_inner: dimension joins broadcast, scan pruned to used columns") {
    val p = plan("q_join_inner")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("PushedFilters"), p.take(800))
  }

  test("q_scan_project: filter pushed to parquet, narrow ReadSchema") {
    val p = plan("q_scan_project")
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(p).isDefined,
      "no pushed filters:\n" + p.take(800))
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_comment"), readSchema)
  }

  test("q_sim_topk: bounded query side broadcast against single corpus scan") {
    val p = plan("q_sim_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(800))
  }

  test("q_dedup_minhash: band join shuffles ids only (no shingle arrays in exchange)") {
    val p = plan("q_dedup_minhash")
    // the candidate-generation exchange partitions on (band_idx, band_key)
    assert(p.contains("band_idx"), p.take(1200))
    // verified-pair join brings shingles back by id afterwards
    assert(p.contains("hashpartitioning"), p.take(1200))
  }

  test("q_pack_sequences: exactly one shard-keyed exchange feeds the window") {
    val df = Catalog.byName("q_pack_sequences").run(spark, dir)
    val s = EngineOps.planSummaryNoAqe(spark, df)
    // one hash exchange for the shard window + the final presentation
    // sort's range exchange — anything more means the prefix-sum
    // stopped being a single-pass plan
    assert(s.exchangeCount <= 2,
      EngineOps.explain(df, "formatted").take(1200))
  }

  test("q_sim_quantized: quantized corpus scanned once, queries broadcast") {
    val p = plan("q_sim_quantized")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(1200))
    // the int8 kernels are inside codegen, not interpreted projections
    assert(p.contains("int8_cosine"), p.take(1200))
  }

  test("top-k-per-group rank filters get WindowGroupLimit (partial top-k, no full per-group sort)") {
    // Spark rewrites rank()<=k / row_number()<=k into a group-limit
    // that keeps only k rows per key BEFORE the window sort — the
    // difference between sorting k rows and sorting the whole
    // partition at 100 TB. Pin it on the catalog queries built from
    // that shape.
    for (q <- Seq("q_window_rank", "q_tfidf")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"), s"$q lost WindowGroupLimit:\n" +
        p.take(1200))
    }
  }

  test("q_setsim_topk: per-doc trim is a WindowGroupLimit; no cartesian product") {
    // the class-collapsed exact top-k face must trim each doc's
    // candidate list with a group limit (k rows per doc before the
    // sort), and candidate generation must stay an equi-join on
    // prefix tokens — a cartesian anywhere means the collapse broke
    val p = plan("q_setsim_topk")
    assert(p.contains("WindowGroupLimit"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q_asof_join: one exchange total — the union shuffles once on the key") {
    val s = EngineOps.planSummaryNoAqe(spark,
      Catalog.byName("q_asof_join").run(spark, dir))
    // 1 window exchange + 1 final orderBy range exchange
    assert(s.exchangeCount <= 2, s)
  }

  test("q_range_join_skew: equi-join on (level, bin), no cartesian against the data") {
    val p = plan("q_range_join_skew")
    // the only nested-loop allowed is the broadcast of the tiny
    // distinct-level set onto the points — the join proper must be a
    // hash/sort equi-join keyed by (__lvl, __bin)
    assert(p.contains("__bin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    // formatted explain names each operator twice (tree + details), so
    // one physical join = two string hits
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(nlj <= 2, s"${nlj / 2} nested-loop joins (expected only the level broadcast):\n${p.take(1200)}")
  }

  test("q_interval_overlap: both disjuncts plan as bin equi-joins, no cartesian") {
    val p = plan("q_interval_overlap")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(nlj <= 4, s"${nlj / 2} nested-loop joins (expected the two level broadcasts):\n${p.take(1200)}")
  }

  test("q_decontaminate: eval gram set broadcast, corpus never shuffled for the probe") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("q_text_bm25: df and corpus stats broadcast; only query-term tokens shuffle") {
    val p = plan("q_text_bm25")
    // df (≤|Q| rows) joins broadcast; the 1-row (n, avgdl) stats ride
    // a broadcast nested-loop cross join — no sort-merge anywhere
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    // the term filter sits under the tf aggregation's exchange: the
    // shuffle moves O(matching tokens), not O(corpus tokens)
    assert(p.contains("vector"), p.take(1200))
    assert(p.contains("hashpartitioning"), p.take(1200))
  }

  test("q_forecast_baseline: cut scalar and hour-of-day model both broadcast, test scan never sorted") {
    val p = plan("q_forecast_baseline")
    // the 24×|types| model must ride a broadcast hash join onto the
    // test scan; the 1-row cut rides broadcast nested-loop cross joins
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q_triangles: every join is an equi hash join on node keys — no cartesian, no nested loop") {
    val p = plan("q_triangles")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("q_shard_balanced: prefix sum is range-partitioned; corpus never funnels into one partition") {
    val p = plan("q_shard_balanced")
    // the corpus window runs per range bucket...
    assert(p.contains("rangepartitioning"), p.take(1500))
    // ...and the only SinglePartition funnels are the P-row offsets
    // window and the ordered 8-row output (each names one Exchange)
    val sp = "Exchange SinglePartition".r.findAllIn(p).size
    assert(sp <= 2, s"$sp single-partition exchanges:\n${p.take(1500)}")
  }

  test("q_tpch_q17: correlated subquery decorrelated — no window, brand filter pushed") {
    val p = plan("q_tpch_q17")
    assert(!p.contains("Window"), p.take(1200))
    assert(p.contains("PushedFilters: [IsNotNull(p_brand), EqualTo(p_brand,Brand#4)]") ||
      raw"PushedFilters: \[[^\]]*p_brand".r.findFirstIn(p).isDefined,
      p.take(1500))
  }

  test("q_attribution: argmin/argmax is one aggregation — no window, no per-user sort") {
    val p = plan("q_attribution")
    assert(!p.contains("Window"), p.take(1200))
    val df = Catalog.byName("q_attribution").run(spark, dir)
    val s = EngineOps.planSummaryNoAqe(spark, df)
    // one hash exchange for the user grouping + the presentation sort
    assert(s.exchangeCount <= 2,
      EngineOps.explain(df, "formatted").take(1200))
  }

  test("q_skyline: dominance resolves on the pruned remnant via broadcast — never a cartesian") {
    val p = plan("q_skyline")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("q_editdist_join: candidates come from the gram equi-join, not a cartesian") {
    val p = plan("q_editdist_join")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the inverted-index join is a hash join on the gram key
    assert(p.contains("hashpartitioning") || p.contains("BroadcastHashJoin"),
      p.take(1500))
  }

  test("q_tpch_q18: HAVING subquery runs as a semi join, top-10 as ordered take") {
    val p = plan("q_tpch_q18")
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q_item_similarity: per-item top-5 cut runs as a group limit, not a full sort") {
    val p = plan("q_item_similarity")
    assert(p.contains("WindowGroupLimit"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q_gini: rank windows run on the bucket grid — bounded single-partition funnels") {
    val p = plan("q_gini")
    // the offsets roll (≤256 rows) and the in-bucket rank window; the
    // raw fact rows never sort in one partition
    val sp = "Exchange SinglePartition".r.findAllIn(p).size
    assert(sp <= 2, s"$sp single-partition exchanges:\n${p.take(1500)}")
    assert(p.contains("hashpartitioning"), p.take(1500))
  }

  test("q_ks_test: CDFs build on bucket-keyed windows, never one global window over values") {
    val p = plan("q_ks_test")
    // the only single-partition funnels are the bucket-offsets roll
    // and (possibly) the final 1-row assembly
    val sp = "Exchange SinglePartition".r.findAllIn(p).size
    assert(sp <= 2, s"$sp single-partition exchanges:\n${p.take(1500)}")
  }
}
