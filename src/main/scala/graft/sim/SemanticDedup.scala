package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): coarse-cluster the embedding space, then treat
  * any within-cluster pair whose cosine clears a threshold as
  * semantic duplicates and keep one representative — the embedding
  * sibling of the lexical MinHash path in [[graft.dedup.Dedup]].
  *
  * The quadratic is bounded by the CELL, never the corpus: vectors
  * pair only against cell-mates, so the candidate volume is
  * Σ|cell|², controlled by the centroid count (and optionally capped
  * hard by `maxCellSize`, mirroring the LSH stop-bucket cap). The
  * drop rule — a vector is dropped iff some SMALLER-id cell-mate
  * clears the threshold — is deterministic, needs no iteration, and
  * keeps exactly one representative (the min id) of every duplicate
  * group whose members share a cell, which is SemDeDup's contract.
  *
  * Shuffles: one broadcast-assign pass (no shuffle), one cell-keyed
  * exchange for the self-join, one id-keyed anti-join. Nothing
  * corpus-quadratic, nothing driver-side.
  */
object SemanticDedup {

  /** Per-vector verdict: (idCol, cell, keep). `keep = false` iff a
    * smaller-id vector in the same cell has cosine ≥ `threshold`.
    * Cells larger than `maxCellSize` (when set) skip pairing entirely
    * and keep all members — the explicit stop-cell escape hatch for
    * degenerate centroid sets at scale (better to under-dedup a hot
    * cell than go quadratic on it); the cap check rides the SAME
    * cell-keyed shuffle the self-join needs.
    */
  def verdicts(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      threshold: Double, maxCellSize: Option[Int] = None): DataFrame = {
    val assigned = Similarity
      .ivfAssign(df, idCol, vecCol, centroids, centIdCol, centVecCol)
      .select(col(idCol), col(vecCol), col("centroid_id").as("cell"))
    val pairable = maxCellSize match {
      case Some(cap) =>
        assigned
          .withColumn("__csz", count(lit(1)).over(
            Window.partitionBy(col("cell"))))
          .filter(col("__csz") <= cap).drop("__csz")
      case None => assigned
    }
    val a = pairable.select(col("cell"), col(idCol).as("__id_a"),
      col(vecCol).as("__v_a"))
    val b = pairable.select(col("cell"), col(idCol).as("__id_b"),
      col(vecCol).as("__v_b"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("__id_a") < col("__id_b"))
      .filter(Similarity.cosine(col("__v_a"), col("__v_b")) >= threshold)
      .select(col("__id_b").as(idCol)).distinct()
    assigned
      .join(dropped.withColumn("__drop", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        not(coalesce(col("__drop"), lit(false))).as("keep"))
  }

  /** Survivors only — every column of `df`, minus dropped vectors. */
  def dedup(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      threshold: Double, maxCellSize: Option[Int] = None): DataFrame =
    df.join(
      verdicts(df, idCol, vecCol, centroids, centIdCol, centVecCol,
        threshold, maxCellSize)
        .filter(col("keep")).select(col(idCol)),
      Seq(idCol), "left_semi")
}
