package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sorted-neighborhood dedup: planted adjacent near-dups are found,
  * the candidate bound (w−1)·N holds by construction, the distributed
  * global rank is layout-independent, and far-apart keys are (by
  * design) not compared — the documented recall trade of SNM.
  */
class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "alpha beta gamma delta zeta"),     // near-dup of 1, adjacent key
    (3L, "totally different content here now"),
    (4L, "unrelated words occupy this record"),
    (5L, "alpha beta gamma delta epsilon"),  // exact dup of 1
    (6L, "zzz end of sort order sentinel")
  ).toDF("doc_id", "text")

  test("planted near-dups in the same key neighborhood are paired") {
    val pairs = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
        windowSize = 4, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 5L)))
    assert(pairs.contains((2L, 5L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(6L) })
  }

  test("candidate volume is exactly (w-1)*N minus the tail truncation") {
    // verify the hard bound: with minJaccard 0 every candidate survives
    val n = 40
    val many = (1 to n).map(i => (i.toLong, s"word$i unique text $i"))
      .toDF("doc_id", "text")
    val all = Dedup.sortedNeighborhoodPairs(many, "doc_id", "text",
      windowSize = 4, minJaccard = 0.0).count()
    // ranks 1..n, deltas 1..3; pairs with rn+d <= n: 3n - (1+2+3)
    assert(all == 3L * n - 6)
  }

  test("pairs are layout-independent (distributed rank == global sort)") {
    val a = Dedup.sortedNeighborhoodPairs(docs.repartition(1), "doc_id",
        "text", windowSize = 3, minJaccard = 0.3)
      .select("id_a", "id_b", "rank_dist")
      .as[(Long, Long, Int)].collect().toSet
    val b = Dedup.sortedNeighborhoodPairs(docs.repartition(7), "doc_id",
        "text", windowSize = 3, minJaccard = 0.3)
      .select("id_a", "id_b", "rank_dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }
}
