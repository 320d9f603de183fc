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
}
