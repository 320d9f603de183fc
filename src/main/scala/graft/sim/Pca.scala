package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Principal-component extraction by power iteration over the
  * distributed covariance matrix — the classic embedding-analysis
  * question ("what direction explains this corpus") answered with
  * O(d²) state however large the corpus: [[Similarity.covarianceMatrix]]
  * reduces N vectors to d(d+1)/2 exact entries, then each power step
  * is one d²-row join + one d-row aggregate (matrix-vector product) —
  * never touching the corpus again.
  *
  * Determinism (the oracle contract): covariance entries are exact-sum
  * doubles; every matvec product c·v_j is decimal-cast before its sum,
  * the norm accumulates decimal-cast squares, and the only IEEE
  * divisions run on bit-identical inputs — so all `iters` iterates,
  * not just the result, replay exactly in a SQL CTE chain. Start
  * vector is all-ones (deterministic sign convention); convergence to
  * the dominant eigenvector needs the standard non-orthogonality
  * caveat, irrelevant for a corpus covariance with a spread spectrum.
  */
object Pca {

  /** One dominant (eigenvector, eigenvalue) pair from an
    * upper-triangle covariance table (i, j, cov) with 1-based indices:
    * returns (i, loading, eigenvalue) — eigenvalue = |C·v| of the last
    * step (→ λ₁ as v converges).
    */
  def powerIteration(covUpper: DataFrame, iters: Int = 8): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // materialize the d²-row symmetric matrix ONCE — every power step
    // joins against it, and without this the whole upstream covariance
    // plan would re-execute per iteration
    val sym = covUpper.select(col("i"), col("j"), col("cov"))
      .union(covUpper.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cov")))
      .localCheckpoint()
    var v = sym.select(col("j")).distinct()
      .select(col("j"), lit(1.0).as("v"))
    var lastNorm: DataFrame = null
    (0 until iters).foreach { _ =>
      val y = sym.join(v, Seq("j"))
        .groupBy(col("i"))
        .agg(sum((col("cov") * col("v")).cast("decimal(28,14)"))
          .cast("double").as("y"))
      val nrm = y.agg(
        sqrt(sum((col("y") * col("y")).cast("decimal(30,14)"))
          .cast("double")).as("nrm"))
      v = y.crossJoin(broadcast(nrm))
        .select(col("i").as("j"), (col("y") / col("nrm")).as("v"))
        .localCheckpoint()
      lastNorm = nrm
    }
    v.select(col("j").as("i"), col("v").as("loading"))
      .crossJoin(broadcast(lastNorm.select(col("nrm").as("eigenvalue"))))
  }
}
