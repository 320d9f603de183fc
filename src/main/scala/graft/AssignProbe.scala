package graft

import org.apache.spark.sql.functions._

/** Two-level ivfAssign probe at REAL above-threshold k: the
  * corpus-scaled-k guard ([[graft.sim.Similarity.ivfAssign]] routing
  * to `ivfAssignTwoLevel` above
  * `spark.graft.ivfAssign.maxKernelCentroids`) is spec-pinned at toy
  * scale; this probe measures it on a replica corpus with k forced
  * ABOVE the 32768 default — wall for both routes, assignment
  * agreement, and the downstream SemDeDup survivor drift — the
  * evidence behind BASELINE.md's two-level row.
  *
  * Usage: `runMain graft.AssignProbe <dir> [k]` (default k = 40000,
  * centroids = the k lowest ids, the gate idiom). The kernel path is
  * forced by raising the threshold above k; the two-level path runs
  * at the DEFAULT threshold, so what is timed is exactly what a user
  * gets.
  */
object AssignProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale100")
    val k = args.lift(1).map(_.toInt).getOrElse(40000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.SparkEnv.session(appName = "graft-assignprobe",
      cores = cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.io.Tables.readParquet(spark, s"$dir/embeddings.parquet")
      .localCheckpoint()
    val n = emb.count()
    require(k > 32768, s"probe k=$k must exceed the default threshold")
    require(n > k, s"corpus n=$n must exceed k=$k")
    val cents = emb.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid_vec"))
      .localCheckpoint()

    def assignAll(threshold: Int): (Double, org.apache.spark.sql.DataFrame) = {
      spark.conf.set("spark.graft.ivfAssign.maxKernelCentroids", threshold)
      def pass() = graft.sim.Similarity.ivfAssign(emb, "vec_id",
          "embedding", cents, "centroid_id", "centroid_vec")
        .select(col("vec_id"), col("centroid_id"))
      pass().write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      val out = pass().localCheckpoint()
      ((System.nanoTime() - t0) / 1e9, out)
    }

    val (tKernel, aKernel) = assignAll(threshold = k + 1) // forced kernel
    val (tTwo, aTwo) = assignAll(threshold = 32768)       // forced two-level
    val agree = aKernel.as("a").join(aTwo.as("b"), Seq("vec_id"))
      .filter(col("a.centroid_id") === col("b.centroid_id")).count()
    // the DEFAULT (no override) route: dimension-aware estimate caps
    // decide — at this corpus's d the kernel serves far past 32768,
    // which is the round-12 cliff fix under measurement here
    spark.conf.unset("spark.graft.ivfAssign.maxKernelCentroids")
    val dim = emb.select(col("embedding")).limit(1).collect()
      .head.getSeq[Any](0).length
    val cap = graft.sim.Similarity.kernelCap(spark, dim)
    val defaultRoute = if (k <= cap) "kernel" else "twolevel"
    def passDefault() = graft.sim.Similarity.ivfAssign(emb, "vec_id",
        "embedding", cents, "centroid_id", "centroid_vec")
      .select(col("vec_id"), col("centroid_id"))
    passDefault().write.format("noop").mode("overwrite").save() // warm
    val t0d = System.nanoTime()
    val aDef = passDefault().localCheckpoint()
    val tDef = (System.nanoTime() - t0d) / 1e9
    val agreeDef = aKernel.as("a").join(aDef.as("b"), Seq("vec_id"))
      .filter(col("a.centroid_id") === col("b.centroid_id")).count()

    def survivors(threshold: Int): Long = {
      spark.conf.set("spark.graft.ivfAssign.maxKernelCentroids", threshold)
      graft.sim.SemanticDedup.verdicts(emb, "vec_id", "embedding",
          cents.select(col("centroid_id").as("vec_id"),
            col("centroid_vec").as("embedding")),
          "vec_id", "embedding", threshold = 0.3)
        .filter(col("keep")).count()
    }
    val keptKernel = survivors(k + 1)
    val keptTwo = survivors(32768)

    println(s"""{"probe":"assign_twolevel","n":$n,"k":$k,"dim":$dim,""" +
      s""""kernel_sec":${f"$tKernel%.3f"},"twolevel_sec":${f"$tTwo%.3f"},""" +
      s""""agreement":${f"${agree.toDouble / n}%.5f"},""" +
      s""""default_route":"$defaultRoute","default_cap":$cap,""" +
      s""""default_sec":${f"$tDef%.3f"},""" +
      s""""default_agreement":${f"${agreeDef.toDouble / n}%.5f"},""" +
      s""""kept_kernel":$keptKernel,"kept_twolevel":$keptTwo,""" +
      s""""kept_drift":${keptKernel - keptTwo}}""")
    spark.stop()
  }
}
