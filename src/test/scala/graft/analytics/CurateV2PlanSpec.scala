package graft.analytics

import graft.SparkSpec

/** Plan-shape guard for the v2 curation pipeline: the only shuffles
  * allowed are the quality-gate's (doc, bigram) count + per-doc max,
  * the stats↔per-row join, the dedup window, and the final sort —
  * chunking and splitting must stay map-only. A refactor that sneaks
  * an extra exchange into the per-row stages fails here before it
  * costs anything at scale.
  */
class CurateV2PlanSpec extends SparkSpec {
  test("curate v2 keeps chunk+split map-only (bounded exchange count)") {
    val df = Catalog.byName("q_curate_v2").run(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 10, s"exchange count grew to $exchanges:\n$plan")
    // the generator stage (chunk fan-out) must sit ABOVE the dedup
    // window with no exchange between them
    assert(plan.contains("Generate"), "chunk explode missing from plan")
  }
}
