package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around orthogonal axes + one singleton between
  private def vecs = Seq(
    (0L, Array(1.00f, 0.00f, 0.0f)),   // cluster A seed
    (1L, Array(0.99f, 0.05f, 0.0f)),   // near-dup of 0
    (2L, Array(0.98f, 0.08f, 0.0f)),   // near-dup of 0 and 1
    (10L, Array(0.00f, 1.00f, 0.0f)),  // cluster B seed
    (11L, Array(0.05f, 0.99f, 0.0f)),  // near-dup of 10
    (20L, Array(0.60f, 0.60f, 0.5f))   // unique-ish
  ).toDF("vec_id", "embedding")

  private def centroids = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f))
  ).toDF("cid", "cvec")

  test("keeps exactly the min id of each within-cell dup group") {
    val v = SemanticDedup.verdicts(vecs, "vec_id", "embedding",
      centroids, "cid", "cvec", threshold = 0.95)
      .orderBy("vec_id")
      .as[(Long, Long, Boolean)].collect()
    val keep = v.collect { case (id, _, true) => id }.toSet
    val drop = v.collect { case (id, _, false) => id }.toSet
    assert(keep === Set(0L, 10L, 20L))
    assert(drop === Set(1L, 2L, 11L))
  }

  test("verdicts cover every input row and match dedup survivors") {
    val v = SemanticDedup.verdicts(vecs, "vec_id", "embedding",
      centroids, "cid", "cvec", threshold = 0.95)
    assert(v.count() === vecs.count())
    val survivors = SemanticDedup.dedup(vecs, "vec_id", "embedding",
      centroids, "cid", "cvec", threshold = 0.95)
    assert(survivors.select("vec_id").as[Long].collect().toSet ===
      v.filter(col("keep")).select("vec_id").as[Long].collect().toSet)
    // survivors retain the original schema
    assert(survivors.columns.toSeq === vecs.columns.toSeq)
  }

  test("identical vectors in different cells are NOT deduped (cell-bounded contract)") {
    // same vector twice, but centroids chosen so argmax tie-break
    // can't separate them — instead plant them in different cells by
    // making each closest to its own centroid
    val twins = Seq(
      (1L, Array(1.0f, 0.1f)),
      (2L, Array(0.1f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("cid", "cvec")
    val v = SemanticDedup.verdicts(twins, "vec_id", "embedding",
      cents, "cid", "cvec", threshold = 0.5)
    // cosine(v1, v2) ≈ 0.198 < 0.5 anyway, but the point is cells:
    // they landed apart and both survive
    assert(v.filter(col("keep")).count() === 2)
    assert(v.select("cell").distinct().count() === 2)
  }

  test("maxCellSize stop-cell cap skips pairing for hot cells") {
    // 5 mutual near-dups in one cell: with the cap below 5 the cell is
    // skipped and all survive; without it only the min id survives
    val hot = (0L to 4L).map(i => (i, Array(1.0f, i.toFloat * 1e-4f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0f, 0.0f))).toDF("cid", "cvec")
    val uncapped = SemanticDedup.verdicts(hot, "vec_id", "embedding",
      cents, "cid", "cvec", threshold = 0.99)
    assert(uncapped.filter(col("keep")).count() === 1)
    val capped = SemanticDedup.verdicts(hot, "vec_id", "embedding",
      cents, "cid", "cvec", threshold = 0.99, maxCellSize = Some(4))
    assert(capped.filter(col("keep")).count() === 5)
  }
}
