package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** kCorePeel against a driver-side sequential peel: planted
  * clique-plus-fringe graphs, a seeded random graph, and the
  * rounds-past-fixpoint no-op invariant.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def densePeel(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var e = edges.map { case (a, b) =>
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    var changed = true
    while (changed) {
      val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity)
        .view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val ne = e.filter(p => keep(p._1) && keep(p._2))
      changed = ne.size != e.size
      e = ne
    }
    (e.map(_._1) ++ e.map(_._2)).groupBy(identity)
      .view.mapValues(_.size).toMap
  }

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] =
    Iterate.kCorePeel(edges.toDF("a", "b"), "a", "b", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("clique with pendant chain: the chain peels away, the clique stays") {
    val clique = for {
      a <- 1L to 5L; b <- 1L to 5L if a < b
    } yield (a, b)
    // chain 5-10-11-12 hangs off the clique
    val edges = clique ++ Seq((5L, 10L), (10L, 11L), (11L, 12L))
    val got = run(edges, k = 3, rounds = 6)
    assert(got.keySet === (1L to 5L).toSet)
    assert(got.values.forall(_ === 4L))
  }

  test("matches the sequential fixpoint peel on a seeded random graph") {
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val expected = densePeel(edges, k = 5)
    // 60 nodes → peel depth < 60; 20 rounds is past fixpoint
    val got = run(edges, k = 5, rounds = 20)
    assert(got.view.mapValues(_.toInt).toMap === expected)
  }

  test("extra rounds past the fixpoint are no-ops") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(150)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val a = run(edges, k = 4, rounds = 25)
    val b = run(edges, k = 4, rounds = 40)
    assert(a === b)
  }

  test("k above max degree empties the graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(run(edges, k = 3, rounds = 5).isEmpty)
  }
}
