package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Iterate.shortestPaths]] — frontier Bellman-Ford contract:
  * distances match a driver-side Dijkstra on planted and pseudo-random
  * graphs, parallel edges collapse to their min, unreachable nodes are
  * absent, and negative-weight edges are excluded by contract.
  */
class ShortestPathsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], source: Long = 0L) =
    Iterate.shortestPaths(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", source)
      .orderBy("node").as[(Long, Long)].collect().toMap

  /** Reference Dijkstra on the driver. */
  private def dijkstra(edges: Seq[(Long, Long, Long)],
      source: Long): Map[Long, Long] = {
    val adj = edges.filter(_._3 >= 0)
      .groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => (e._2, e._3)).toSeq }
    val dist = scala.collection.mutable.Map(source -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, source))(
      Ordering.by(x => -x._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (d == dist(u)) adj.getOrElse(u, Nil).foreach { case (v, w) =>
        if (!dist.contains(v) || d + w < dist(v)) {
          dist(v) = d + w; pq.enqueue((d + w, v))
        }
      }
    }
    dist.toMap
  }

  test("planted diamond: relaxation picks the cheaper two-hop route") {
    // 0->1 (1), 1->3 (1) beats 0->3 (5); 0->2 (2), 2->3 (10) loses
    val edges = Seq((0L, 1L, 1L), (1L, 3L, 1L), (0L, 3L, 5L),
      (0L, 2L, 2L), (2L, 3L, 10L))
    assert(run(edges) === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("parallel edges collapse to min; unreachable nodes absent") {
    val edges = Seq((0L, 1L, 7L), (0L, 1L, 3L), (5L, 6L, 1L))
    assert(run(edges) === Map(0L -> 0L, 1L -> 3L)) // 5,6 unreachable
  }

  test("cycle does not loop forever; zero-weight edges fine") {
    val edges = Seq((0L, 1L, 0L), (1L, 2L, 4L), (2L, 0L, 1L))
    assert(run(edges) === Map(0L -> 0L, 1L -> 0L, 2L -> 4L))
  }

  test("negative-weight edges are excluded by contract") {
    val edges = Seq((0L, 1L, 2L), (0L, 2L, -5L))
    assert(run(edges) === Map(0L -> 0L, 1L -> 2L)) // the -5 edge dropped
  }

  test("pseudo-random graph matches driver Dijkstra exactly") {
    // deterministic multiplicative-hash graph: 60 nodes, out-degree 3
    val edges = for {
      i <- 0L until 60L
      k <- 1L to 3L
      h = (i * 2654435761L + k * 40503L) & 0x7fffffffL
    } yield (i, h % 60L, h % 13L + 1L)
    val got = run(edges)
    val want = dijkstra(edges, 0L)
    assert(got === want)
  }

  test("catalog q_sssp runs green on smoke data") {
    val df = Catalog.byName("q_sssp").run(spark, "/root/testdata/sf0.001")
    val rows = df.as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.head === ((0L, 0L))) // source at distance 0
    assert(rows.map(_._1).distinct.length === rows.length)
  }
}
