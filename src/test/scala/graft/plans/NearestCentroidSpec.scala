package graft.plans

import graft.SparkSpec
import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** [[NearestCentroid]] / [[CentroidKernel]]: the pruned pure-
  * projection assignment must be BIT-IDENTICAL to the windowed N×k
  * reference plan — same cell, same similarity double — on every
  * shape that can reach it: random clusters, exact ties, zero
  * vectors, float vs double columns, corpus-scaled centroid counts.
  */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private def diff(df: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame): Unit = {
    val fast = Similarity.ivfAssign(df, "id", "v", cents, "cid", "cv")
      .select(col("id"), col("centroid_id"), col("centroid_sim"))
    val slow = Similarity.ivfAssignWindowed(df, "id", "v", cents, "cid", "cv")
      .select(col("id"), col("centroid_id").cast("long"),
        col("centroid_sim"))
    // bit-exact: join on id, compare cell AND the raw sim double
    val joined = fast.as("f").join(slow.as("s"), Seq("id"))
    val n = df.count()
    assert(joined.count() === n)
    val bad = joined.filter(
      col("f.centroid_id") =!= col("s.centroid_id") ||
        col("f.centroid_sim") =!= col("s.centroid_sim") ||
        col("f.centroid_sim").isNull =!= col("s.centroid_sim").isNull)
    assert(bad.count() === 0L,
      "pruned assignment diverged:\n" +
        bad.limit(5).collect().mkString("\n"))
  }

  test("random clustered doubles: pruned ≡ windowed, corpus-scaled k") {
    val rnd = new scala.util.Random(20260815L)
    val dim = 16
    // 40 cluster centers, 1200 points jittered around them
    val centers = Array.fill(40)(Array.fill(dim)(rnd.nextGaussian()))
    val pts = (0 until 1200).map { i =>
      val c = centers(rnd.nextInt(centers.length))
      (i.toLong, c.map(x => x + 0.05 * rnd.nextGaussian()).toSeq)
    }
    val df = pts.toDF("id", "v")
    val cents = centers.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq.toDF("cid", "cv")
    diff(df, cents)
  }

  test("float embeddings against the real table: pruned ≡ windowed") {
    val emb = graft.io.Tables.table(spark, "/root/testdata/sf0.01",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    // corpus-scaled SemDeDup shape: first N/16 vectors as centroids
    // (denser than production N/256 — harder pruning case)
    val cents = emb.filter(col("id") < 32)
      .select(col("id").as("cid"), col("v").as("cv"))
    diff(emb, cents)
  }

  test("exact ties break to the smallest centroid id") {
    // duplicate centroids: identical similarity doubles by
    // construction, so the argmax is decided purely by the tie-break
    val df = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("id", "v")
    val cents = Seq(
      (7L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)), // dup pair — 3 must win
      (9L, Seq(0.0, 1.0)), (5L, Seq(0.0, 1.0))) // dup pair — 5 must win
      .toDF("cid", "cv")
    diff(df, cents)
    val got = Similarity.ivfAssign(df, "id", "v", cents, "cid", "cv")
      .select("id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(got(1L) === 3L)
    assert(got(2L) === 5L)
  }

  test("zero vectors and zero centroids: cosine-0 guard matches") {
    val df = Seq(
      (1L, Seq(0.0, 0.0)),        // zero vector: sim 0.0 everywhere
      (2L, Seq(1.0, 2.0)),
      (3L, Seq(-1.0, -2.0))).toDF("id", "v")
    val cents = Seq(
      (4L, Seq(0.0, 0.0)),        // zero centroid: sim 0.0 with all
      (6L, Seq(2.0, 4.0)),
      (8L, Seq(-3.0, 1.0))).toDF("cid", "cv")
    diff(df, cents)
  }

  test("single centroid and k smaller than √-group floor") {
    val df = (0 until 50).map(i => (i.toLong, Seq(i.toDouble, 1.0)))
      .toDF("id", "v")
    diff(df, Seq((42L, Seq(1.0, 1.0))).toDF("cid", "cv"))
    diff(df, Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("cid", "cv"))
  }

  test("anti-parallel and near-tie geometry survives pruning") {
    // centroids on a line: x and −x (cosine −1), plus nearly-identical
    // directions 1e-12 apart — pruning bounds must not drop the true
    // winner when distances differ by less than ε
    val rnd = new scala.util.Random(7L)
    val base = Array.fill(8)(rnd.nextGaussian())
    val tweak = base.clone(); tweak(0) += 1e-12
    val cents = Seq(
      (1L, base.toSeq), (2L, base.map(-_).toSeq), (3L, tweak.toSeq))
      .toDF("cid", "cv")
    val df = (0 until 200).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian()).toSeq)
    }.toDF("id", "v")
    diff(df, cents)
  }

  test("empty centroid table yields an empty assignment (windowed parity)") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
    val cents = Seq.empty[(Long, Seq[Double])].toDF("cid", "cv")
    assert(Similarity.ivfAssign(df, "id", "v", cents, "cid", "cv")
      .count() === 0L)
  }

  test("assignment is a pure projection: no exchange in the plan") {
    val emb = graft.io.Tables.table(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val cents = emb.filter(col("id") < 8)
      .select(col("id").as("cid"), col("v").as("cv"))
    val plan = graft.ops.EngineOps.explain(
      Similarity.ivfAssign(emb, "id", "v", cents, "cid", "cv"),
      "formatted")
    assert(!plan.contains("Exchange"),
      "nearest-centroid assignment should not shuffle:\n" + plan)
    assert(plan.contains("codegen id"),
      "assignment fell out of whole-stage codegen:\n" + plan)
  }
}
