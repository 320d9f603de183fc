package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("power iteration recovers a planted dominant direction") {
    // variance 4 along dim 2, variance ~0.01 along dim 4, zero mean
    val rows = (0 until 40).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      val t = if (i % 4 < 2) 0.1f else -0.1f
      (i.toLong, Array(0.0f, 2.0f * s, 0.0f, t, 0.0f))
    }
    val cov = Similarity.covarianceMatrix(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val out = Pca.powerIteration(cov, iters = 12)
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    val loadings = out.map(_._2)
    val eig = out.head._3
    // dominant axis = dim 2 (1-based index 2): |loading| ≈ 1 there, ~0 elsewhere
    assert(math.abs(math.abs(loadings(1)) - 1.0) < 1e-6,
      s"loadings=${loadings.toSeq}")
    assert(loadings.zipWithIndex.filter(_._2 != 1)
      .forall(l => math.abs(l._1) < 1e-6))
    assert(math.abs(eig - 4.0) < 1e-6, s"eigenvalue=$eig") // var = 4
  }

  test("iterates are layout-independent (decimal-exact matvec)") {
    val rows = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(6)(d => math.sin(i * 0.7 + d).toFloat))
    }
    def run(parts: Int) = Pca.powerIteration(
      Similarity.covarianceMatrix(
        rows.toDF("vec_id", "embedding").repartition(parts),
        "vec_id", "embedding"), iters = 5)
      .as[(Int, Double, Double)].collect().sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }
}
