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

  test("Q5: fixed-cardinality dims ride broadcasts; date filter pushed") {
    val df = Catalog.byName("q_tpch_q5").run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"nation/region must broadcast:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate,"),
      s"order-date filter not pushed:\n$plan")
  }
}
