package graft.analytics

import graft.SparkSpec

/** Plan-shape guards for the TPC-H-style joins: the properties that
  * matter at 100 TB, pinned so a refactor can't silently lose them.
  */
class TpchPlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("Q3: filters reach the scans; top-10 is TakeOrdered, not a global sort") {
    val df = Catalog.byName("q_tpch_q3").run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must not be a global sort:\n$plan")
    // every selective predicate is pushed into its parquet scan
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")
      || plan.contains("EqualTo(c_mktsegment,BUILDING)"), s"segment filter not pushed:\n$plan")
    assert(plan.contains("LessThan(o_orderdate,"), s"order-date filter not pushed:\n$plan")
    assert(plan.contains("GreaterThan(l_shipdate,"), s"ship-date filter not pushed:\n$plan")
  }

  test("q_join_inner: lineitem pre-aggregates on its join key BELOW the fact-fact join — size-adaptive") {
    // the 10× bench showed the orders⋈lineitem exchange dominating;
    // collapsing ~4 lines/order before the join cuts that shuffle ~4×.
    // Round 15 made the pre-agg SIZE-ADAPTIVE (at sf0.1 the extra agg
    // stage costs more than the shuffle it saves: 1.87 s vs 1.21 s
    // direct): the pre-agg plan must appear once lineitem crosses
    // spark.graft.join.preaggBytes, and the small-input default must
    // be the direct join. Both branches broadcast the customer dim.
    spark.conf.set("spark.graft.join.preaggBytes", "0") // force big-input branch
    try {
      val df = Catalog.byName("q_join_inner").run(spark, sf)
      val plan = df.queryExecution.optimizedPlan.toString
      val aggIdx = plan.indexOf("Aggregate [l_orderkey")
      assert(aggIdx >= 0, s"lineitem pre-aggregation missing:\n$plan")
      val exec = df.queryExecution.executedPlan.toString
      assert(exec.contains("BroadcastHashJoin"),
        s"customer dim must broadcast:\n$exec")
    } finally spark.conf.unset("spark.graft.join.preaggBytes")
    // default threshold (256 MB) over test-sized lineitem: direct join
    val small = Catalog.byName("q_join_inner").run(spark, sf)
    val smallPlan = small.queryExecution.optimizedPlan.toString
    assert(!smallPlan.contains("Aggregate [l_orderkey"),
      s"small-input plan must skip the pre-agg:\n$smallPlan")
    assert(small.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "customer dim must broadcast")
  }

  test("Q21: two-level decorrelation reuses ONE order-key exchange; top-20 is TakeOrdered") {
    val df = Catalog.byName("q_tpch_q21").run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the (orderkey, suppkey) -> orderkey agg pair must NOT re-exchange
    // on the compound key: hash(l_orderkey) satisfies both levels
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey#") ||
      !"""hashpartitioning\(l_orderkey#\d+L, l_suppkey""".r
        .findFirstIn(plan).isDefined,
      s"compound-key exchange crept back under the agg pair:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must not be a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin [l_suppkey"),
      s"supplier dim must broadcast:\n$plan")
    // status filter reaches the orders scan
    assert(plan.contains("EqualTo(o_orderstatus,F)"),
      s"status filter not pushed:\n$plan")
  }

  test("Q22: scalar threshold broadcasts one row; NOT EXISTS is a hash anti join") {
    val df = Catalog.byName("q_tpch_q22").run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("Cross"),
      s"scalar avg must ride a 1-row broadcast, not a per-row re-eval:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"NOT EXISTS must plan as an anti join:\n$plan")
    assert(plan.contains("EqualTo(o_orderpriority,1-URGENT)"),
      s"priority filter not pushed:\n$plan")
  }

  test("Q5: fixed-cardinality dims ride broadcasts; date filter pushed") {
    val df = Catalog.byName("q_tpch_q5").run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"nation/region must broadcast:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate,"),
      s"order-date filter not pushed:\n$plan")
  }
}
