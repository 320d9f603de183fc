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
}
