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

  // ---- general pageRank: out-degree normalized, dangling-safe ----

  private def runGeneral(edges: Seq[(Long, Long)], iters: Int = 8) =
    Iterate.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)

  test("general pageRank agrees with the functional variant on a 4-cycle") {
    val general = runGeneral(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
      .orderBy("node").select($"rank").as[Double].collect()
    assert(general.forall(r => math.abs(r - 0.25) < 1e-12))
  }

  test("out-degree normalization splits rank across multiple out-edges") {
    // 0 -> {1, 2}; 1 -> 0; 2 -> 0: by symmetry rank(1) == rank(2),
    // and each receives half of 0's damped rank
    val r = runGeneral(Seq((0L, 1L), (0L, 2L), (1L, 0L), (2L, 0L)), iters = 40)
      .orderBy("node").select($"rank").as[Double].collect()
    assert(math.abs(r(1) - r(2)) < 1e-12)
    assert(math.abs(r.sum - 1.0) < 1e-9, s"mass ${r.sum}")
    // analytic fixpoint of r1 = t + d*r0/2, r0 = t + 2d*r1 with
    // t = 0.05, d = 0.85: r1 = t(1 + d/2)/(1 - d²). 40 iterations
    // converge to within ~0.85⁴⁰ ≈ 1.5e-3 of it.
    val r1Exact = 0.05 * (1 + 0.85 / 2) / (1 - 0.85 * 0.85)
    assert(math.abs(r(1) - r1Exact) < 2e-3, s"r1 ${r(1)} vs $r1Exact")
  }

  test("dangling node's mass is redistributed — total mass conserved") {
    // 2 is dangling (no out-edges)
    val r = runGeneral(Seq((0L, 1L), (1L, 2L)), iters = 20)
      .orderBy("node").select($"rank").as[Double].collect()
    assert(r.length === 3)
    assert(math.abs(r.sum - 1.0) < 1e-9, s"mass ${r.sum}")
    assert(r(2) > r(1) && r(1) > r(0)) // rank flows down the chain
  }

  test("1e5 nodes iterate without driver materialization") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val n = 100000L
    // ring + a skip edge per node: non-functional, no dangling
    val edges = spark.range(n).selectExpr("id AS src", s"(id + 1) % $n AS dst")
      .unionByName(spark.range(n)
        .selectExpr("id AS src", s"(id * 7 + 3) % $n AS dst"))
    val ranks = Iterate.pageRank(edges, "src", "dst", iters = 3)
    // distributed end-to-end: the result plan must hold no
    // driver-side LocalRelation leaf (the pre-fix shape collected all
    // ranks to the driver every iteration and re-created a local frame)
    val leaves = ranks.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty &&
      leaves.forall(!_.isInstanceOf[LocalRelation]), leaves.mkString(", "))
    val agg = ranks.agg(sum($"rank"), count($"rank")).head()
    assert(math.abs(agg.getDouble(0) - 1.0) < 1e-6)
    assert(agg.getLong(1) === n)
  }
}
