package graft.analytics

import graft.SparkSpec

class IterateSpec extends SparkSpec {
  import spark.implicits._

  test("transitive closure over a chain + branch") {
    // 1→2→3→4, 2→5
    val edges = Seq((1, 2), (2, 3), (3, 4), (2, 5)).toDF("src", "dst")
    val closure = Iterate.transitiveClosure(edges, "src", "dst")
      .as[(Int, Int)].collect().toSet
    assert(closure === Set(
      (1, 2), (2, 3), (3, 4), (2, 5),
      (1, 3), (1, 4), (1, 5), (2, 4)))
  }

  test("cycle terminates at fixpoint") {
    val edges = Seq((1, 2), (2, 3), (3, 1)).toDF("src", "dst")
    val closure = Iterate.transitiveClosure(edges, "src", "dst")
      .as[(Int, Int)].collect().toSet
    assert(closure === Set((1,2),(2,3),(3,1),(1,3),(2,1),(3,2),(1,1),(2,2),(3,3)))
  }

  test("triangles: planted shapes, hub skew, dirty input") {
    // K4 on {1..4} has 4 triangles; node 9 is a hub touching everything
    // but closing nothing new beyond its own wedges with existing edges
    val k4 = for (i <- 1 to 4; j <- (i + 1) to 4) yield (i.toLong, j.toLong)
    // hub 9 connects to 5,6,7,8 (a star: zero triangles among leaves)
    val star = Seq((9L, 5L), (9L, 6L), (9L, 7L), (9L, 8L))
    // dirty rows: duplicates, reversed orientation, self-loop
    val dirty = Seq((2L, 1L), (1L, 2L), (3L, 3L))
    val edges = (k4 ++ star ++ dirty).toDF("a", "b")
    val got = Iterate.triangles(edges, "a", "b")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 3L, 4L)))
  }

  test("triangles matches brute force on a pseudo-random graph") {
    // deterministic LCG edge sample over 30 nodes
    val pairs = for {
      i <- 0 until 29; j <- (i + 1) until 30
      if ((i * 31 + j * 17 + 7) % 5) == 0
    } yield (i.toLong, j.toLong)
    val edgeSet = pairs.toSet
    val expected = (for {
      a <- 0L until 30L; b <- (a + 1) until 30L; c <- (b + 1) until 30L
      if edgeSet((a, b)) && edgeSet((b, c)) && edgeSet((a, c))
    } yield (a, b, c)).toSet
    assert(expected.nonEmpty) // the sample actually plants triangles
    val got = Iterate.triangles(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("linkPrediction: planted path, square, and adjacency exclusion") {
    // path 1-2-3: (1,3) share {2} → common 1, union {2} → jaccard 1.0
    // square 10-11-12-13-10: diagonals (10,12),(11,13) common 2, jacc 1.0
    val edges = Seq((1L, 2L), (2L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L)).toDF("a", "b")
    val got = Iterate.linkPrediction(edges, "a", "b")
      .select("u", "v", "common", "jaccard")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got((1L, 3L)) == ((1L, 1.0)))
    assert(got((10L, 12L)) == ((2L, 1.0)))
    assert(got((11L, 13L)) == ((2L, 1.0)))
    // adjacent pairs never predicted; no other pair shares a neighbor
    assert(got.size == 3)
  }

  test("linkPrediction: dirty input and brute-force parity on a random graph") {
    val pairs = for {
      i <- 0 until 25; j <- 0 until 25
      if i != j && ((i * 31 + j * 17 + i * j) % 7 == 0)
    } yield (i.toLong, j.toLong)
    // duplicates + both orientations tolerated
    val df = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("a", "b")
    val adjSet = pairs.flatMap(p => Seq(p, p.swap)).toSet
    val nbrs = (0L until 25L).map(n =>
      n -> adjSet.filter(_._1 == n).map(_._2).toSet).toMap
    val expected = (for {
      u <- 0L until 25L; v <- (u + 1) until 25L
      if !adjSet((u, v))
      common = (nbrs(u) intersect nbrs(v)).size
      if common > 0
    } yield (u, v, common.toLong,
      common.toDouble / (nbrs(u) union nbrs(v)).size)).toSet
    val got = Iterate.linkPrediction(df, "a", "b")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty && got === expected)
  }

  test("linkPrediction: hub cap drops only wedges centered on the hub") {
    // star: hub 0 connected to 1..6; plus edge 1-2.
    val star = (1L to 6L).map(i => (0L, i))
    val edges = (star :+ (1L, 2L)).toDF("a", "b")
    val exact = Iterate.linkPrediction(edges, "a", "b")
      .as[(Long, Long, Long, Double)].collect().toSet
    // exact: all fan pairs (i,j) i,j in 1..6 non-adjacent share hub 0;
    // (3..6 pairs) common=1; (1,2) adjacent → excluded; pairs (1,j)/(2,j)
    // common=1 via hub. Plus (0,?) none (0 adjacent to all).
    assert(exact.forall(_._3 >= 1))
    val capped = Iterate.linkPrediction(edges, "a", "b", maxHubDegree = 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    // hub (deg 6) removed as center: only wedges centered at 1 or 2
    // survive → prediction (0, anything)? 0-1-2 and 0-2-1 wedges are
    // adjacent pairs; no non-adjacent pair shares a low-degree center.
    assert(capped.isEmpty)
  }
}
