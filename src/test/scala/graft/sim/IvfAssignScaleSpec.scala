package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The corpus-scaled-k guard on [[Similarity.ivfAssign]]: above
  * `spark.graft.ivfAssign.maxKernelCentroids` the assignment routes
  * through the two-level distributed path instead of a driver-built
  * kernel. Pinned here: (a) exhaustive probing makes the route EXACTLY
  * equal to the windowed reference plan; (b) default probing keeps
  * high assignment recall on clustered data; (c) the kernel path is
  * untouched below the threshold.
  */
class IvfAssignScaleSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 12

  private def clustered(n: Int, nCenters: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nCenters)(Array.fill(dim)(rnd.nextGaussian()))
    (0 until n).map { i =>
      val c = centers(i % nCenters)
      (i.toLong, c.map(x => x + 0.05 * rnd.nextGaussian()).toSeq)
    }
  }

  private def withThreshold[T](maxKernel: Int, probes: Int)(body: => T): T = {
    spark.conf.set("spark.graft.ivfAssign.maxKernelCentroids",
      maxKernel.toString)
    spark.conf.set("spark.graft.ivfAssign.metaProbes", probes.toString)
    try body finally {
      spark.conf.unset("spark.graft.ivfAssign.maxKernelCentroids")
      spark.conf.unset("spark.graft.ivfAssign.metaProbes")
    }
  }

  test("above-threshold k with exhaustive probes ≡ windowed reference, nulls included") {
    val pts = clustered(400, 25, 1L).toDF("id", "v")
      // a NULL vector must keep its row with a null assignment
      .union(Seq((9999L, null.asInstanceOf[Seq[Double]])).toDF("id", "v"))
    val cents = clustered(60, 25, 2L)
      .map { case (i, v) => (i + 100, v) }.toDF("cid", "cv")
    // threshold 16 < 60 centroids → two-level; probes ≥ metaK(=16)
    // → exhaustive → exact
    val got = withThreshold(16, 999) {
      Similarity.ivfAssign(pts, "id", "v", cents, "cid", "cv")
        .select("id", "centroid_id", "centroid_sim").collect()
    }.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else (r.getLong(1), r.getDouble(2)))).toMap
    val want = Similarity.ivfAssignWindowed(
        pts.filter(col("v").isNotNull), "id", "v", cents, "cid", "cv")
      .select(col("id"), col("centroid_id").cast("long"),
        col("centroid_sim")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.size === want.size + 1)
    assert(got(9999L) === null, "null-vector row lost its null assignment")
    want.foreach { case (id, w) =>
      assert(got(id) === w, s"row $id diverged: got ${got(id)}, want $w")
    }
  }

  test("default probing keeps ≥0.95 assignment agreement on clustered data") {
    val pts = clustered(600, 40, 3L).toDF("id", "v")
    val cents = clustered(120, 40, 4L)
      .map { case (i, v) => (i + 1000, v) }.toDF("cid", "cv")
    val got = withThreshold(16, 8) {
      Similarity.ivfAssign(pts, "id", "v", cents, "cid", "cv")
        .select("id", "centroid_id").as[(Long, Long)].collect().toMap
    }
    val want = Similarity.ivfAssignWindowed(pts, "id", "v", cents,
        "cid", "cv")
      .select(col("id"), col("centroid_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    val agree = want.count { case (id, c) => got.get(id).contains(c) }
    val frac = agree.toDouble / want.size
    assert(frac >= 0.95, s"two-level default-probe agreement $frac < 0.95")
  }

  test("below the threshold the kernel path is untouched (pure projection plan)") {
    // spark.range input: a LocalRelation would constant-fold the
    // whole projection away and hide the expression from the plan
    val pts = spark.range(100).select(col("id"),
      array((0 until dim).map(j => rand(j) + col("id")): _*).as("v"))
    val cents = clustered(10, 5, 6L).toDF("cid", "cv")
    val plan = graft.ops.EngineOps.explain(
      Similarity.ivfAssign(pts, "id", "v", cents, "cid", "cv"), "formatted")
    assert(plan.contains("nearest_centroid"),
      s"kernel projection missing below threshold:\n${plan.take(1200)}")
    assert(!plan.contains("max_by"),
      "two-level aggregate appeared below the threshold")
  }

  test("trainCentroids above-threshold k: distributed loop ≡ driver loop (exhaustive probes)") {
    val pts = clustered(300, 20, 9L).toDF("id", "v")
    // k = 40 > threshold 8 → the large-k loop (distributed seeds +
    // localCheckpoint rounds + two-level assignment); exhaustive
    // probing makes every assignment identical to the kernel loop,
    // so centroids agree up to double-sum association (tolerance)
    val big = withThreshold(8, 999) {
      Similarity.trainCentroids(pts, "id", "v", k = 40, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    }
    val small = Similarity.trainCentroids(pts, "id", "v", k = 40, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(big.keySet === small.keySet,
      s"cell sets diverged: ${big.keySet.diff(small.keySet)} / " +
        s"${small.keySet.diff(big.keySet)}")
    big.foreach { case (id, v) =>
      val w = small(id)
      assert(v.size === w.size)
      v.zip(w).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-6,
          s"centroid $id diverged beyond sum-association tolerance")
      }
    }
  }

  test("column order and schema match the kernel path") {
    val pts = clustered(50, 4, 7L).toDF("id", "v")
      .withColumn("extra", col("id") * 2)
    val cents = clustered(12, 4, 8L).toDF("cid", "cv")
    val twoLevel = withThreshold(4, 999) {
      Similarity.ivfAssign(pts, "id", "v", cents, "cid", "cv")
    }
    val kernel = Similarity.ivfAssign(pts, "id", "v", cents, "cid", "cv")
    assert(twoLevel.columns.toSeq === kernel.columns.toSeq)
  }

  test("kernelCap routes by dimension-aware estimate; explicit override wins") {
    // at d=768 the caps land essentially AT the old fixed 32768
    // (BASELINE's derivation); at d=64 the kernel serves ~180k
    val cap768 = Similarity.kernelCap(spark, 768)
    assert(cap768 >= 32768 && cap768 <= 40000, s"cap768=$cap768")
    val cap64 = Similarity.kernelCap(spark, 64)
    assert(cap64 > 100000, s"cap64=$cap64")
    // the floor preserves every previously-kernel route at huge d
    assert(Similarity.kernelCap(spark, 100000) === 32768)
    // an explicit maxKernelCentroids still wins outright
    spark.conf.set("spark.graft.ivfAssign.maxKernelCentroids", "7")
    try assert(Similarity.kernelCap(spark, 64) === 7)
    finally spark.conf.unset("spark.graft.ivfAssign.maxKernelCentroids")
    // and the caps themselves are tunable
    spark.conf.set("spark.graft.ivfAssign.maxKernelBytes",
      (1024L * 1024 * 1024).toString)
    try assert(Similarity.kernelCap(spark, 64) >= cap64)
    finally spark.conf.unset("spark.graft.ivfAssign.maxKernelBytes")
  }
}
