package graft.analytics

import graft.SparkSpec

/** Every catalog query must at least ANALYZE against the real test
  * tables — resolving columns, types and function signatures — so a
  * schema drift or API breakage in any of the 136 queries goes red in
  * `sbt test` (seconds of plan analysis), not only in the full Verify
  * run (minutes of execution). Complements TestdataSchemaSpec: that
  * suite pins the table schemas; this one pins every query against
  * them.
  */
class CatalogAnalysisSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("all catalog queries analyze against sf0.001 (no execution)") {
    val failures = Catalog.all.flatMap { q =>
      try {
        // force analysis (resolution + type checking), not execution
        q.run(spark, dir).queryExecution.analyzed
        None
      } catch {
        case e: Exception => Some(s"${q.name}: ${e.getMessage.take(200)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("catalog conventions: unique q_-prefixed names, every query oracled") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(names.forall(n => n == "q1_agg" || n.startsWith("q_")),
      names.filterNot(_.startsWith("q_")).mkString(","))
    val unoracled = Catalog.all.filter(_.oracle.isEmpty).map(_.name)
    assert(unoracled.isEmpty,
      s"rows-only entries are banned since round 5: $unoracled")
  }
}
