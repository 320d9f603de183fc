package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int = 8) =
    Iterate.pageRankFunctional(edges.toDF("src", "dst"), "src", "dst",
      iters, damping = BigDecimal("0.85"),
      teleport = BigDecimal("0.0375")) // (1-0.85)/4

  test("permutation graph stays uniform; total mass conserved") {
    // 4-cycle: 0->1->2->3->0
    val ranks = run(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
      .select($"rank".cast("double")).as[Double].collect()
    assert(ranks.forall(r => math.abs(r - 0.25) < 1e-12))
  }

  test("contraction concentrates rank on the sink component") {
    // 0,1,2 all point at 3; 3 points at itself
    val ranks = run(Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)))
      .orderBy("node").select($"rank".cast("double")).as[Double].collect()
    assert(ranks(3) > 0.7, s"sink rank ${ranks(3)}")
    assert(ranks(0) === ranks(1))
    assert(math.abs(ranks(0) - 0.0375) < 1e-12) // sources get teleport only
  }

  test("non-functional graph is refused") {
    val err = intercept[IllegalArgumentException] {
      run(Seq((0L, 1L), (0L, 2L), (1L, 0L), (2L, 0L)))
    }
    assert(err.getMessage.contains("functional"))
  }
}
