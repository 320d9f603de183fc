package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Personalized PageRank against a driver-side dense iteration: same
  * restart vector, same dangling redistribution, on a seeded random
  * graph — plus the structural invariants (mass conservation,
  * unreachable nodes at zero) that distinguish PPR from global
  * PageRank.
  */
class PprSpec extends SparkSpec {
  import spark.implicits._

  private def dense(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int, d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val sv = nodes.map(n =>
      n -> (if (seeds(n)) 1.0 / seeds.size else 0.0)).toMap
    var rank = sv
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val in = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (s, _) => rank(s) / out(s) }.sum
      }.toMap
      rank = nodes.map { n =>
        n -> ((1 - d) * sv(n) +
          d * (in.getOrElse(n, 0.0) + dangling * sv(n)))
      }.toMap
    }
    rank
  }

  test("matches the dense driver iteration on a seeded random graph") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).distinct
    val seeds = Set(0L, 7L, 13L)
    val expected = dense(edges, seeds, iters = 12, d = 0.85)
    val got = Iterate.personalizedPageRank(edges.toDF("src", "dst"),
        "src", "dst", seeds.toSeq.toDF("node"), iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (n, r) =>
      assert(math.abs(got(n) - r) < 1e-12, s"node $n")
    }
  }

  test("mass is conserved and unreachable components rank zero") {
    // two components: seeds live in {1,2,3}; {10,11} is unreachable
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 10L))
    val got = Iterate.personalizedPageRank(edges.toDF("src", "dst"),
        "src", "dst", Seq(1L).toDF("node"), iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    assert(got(10L) === 0.0)
    assert(got(11L) === 0.0)
    assert(got(1L) > got(3L) || got(1L) > got(2L))
  }

  test("single seed with dangling sink keeps mass on the walk") {
    // 1 -> 2 -> (dangling): dangling mass restarts at the seed
    val edges = Seq((1L, 2L))
    val got = Iterate.personalizedPageRank(edges.toDF("src", "dst"),
        "src", "dst", Seq(1L).toDF("node"), iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    assert(got(1L) > got(2L))
  }
}
