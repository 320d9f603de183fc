package graft

import org.apache.spark.sql.functions._

/** ANN drift-lifecycle probe — the evidence behind BASELINE.md's
  * retrain row: build an IVF index on a clustered synthetic corpus,
  * append an opposite-half-space drift batch (the recall-killing
  * shape: near-orthogonal to every frozen centroid, so members
  * scatter on noise), and report what [[graft.sim.IvfIndex.staleness]]
  * sees plus measured recall@10 before/after
  * [[graft.sim.IvfIndex.retrain]].
  *
  * Vectors are generated deterministically (xxhash64-derived noise),
  * so runs are comparable across rounds.
  *
  * Usage: `runMain graft.AnnProbe [nBase] [nDrift] [dim] [k]`.
  */
object AnnProbe {

  def main(args: Array[String]): Unit = {
    val nBase = args.lift(0).map(_.toInt).getOrElse(100000)
    val nDrift = args.lift(1).map(_.toInt).getOrElse(50000)
    val dim = args.lift(2).map(_.toInt).getOrElse(32)
    val k = args.lift(3).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.SparkEnv.session(appName = "graft-annprobe",
      cores = cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sim.{IvfIndex, Similarity}

    val nClusters = 8
    // member of cluster (id % nClusters): one-hot axis ± hash noise;
    // drift rows sit on NEGATED axes (near-orthogonal to all base
    // centroids — the scatter-on-noise worst case)
    def corpus(n: Int, offset: Long, sign: Double) =
      spark.range(n).select(
        (col("id") + offset).as("id"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          when(j === pmod(col("id"), lit(nClusters)).cast("int"), lit(sign))
            .otherwise(lit(0.0)) +
            (xxhash64(col("id") + offset, j).cast("double")
              / lit(Long.MaxValue.toDouble)) * lit(0.05)).as("v"))
    val base = corpus(nBase, 0L, 1.0).localCheckpoint(eager = true)
    val drift = corpus(nDrift, 10000000L, -1.0).localCheckpoint(eager = true)
    val full = base.union(drift)
    val queries = drift.limit(5).localCheckpoint(eager = true)

    val wh = new graft.store.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("annprobe").toString)
    def recall(): Double = {
      val got = IvfIndex.search(wh, "ann", queries, "id", "v",
        k = 10, nProbe = 4)
      val exact = Similarity.bruteForceTopK(full, queries, "id", "v", k = 10)
      got.select("query_id", "corpus_id")
        .join(exact.select(col("query_id"), col("corpus_id")),
          Seq("query_id", "corpus_id")).count().toDouble / exact.count()
    }

    val t0 = System.nanoTime()
    IvfIndex.build(wh, "ann", base, "id", "v", k = k, iters = 3)
    val tBuild = (System.nanoTime() - t0) / 1e9
    IvfIndex.append(wh, "ann", drift, "id", "v")
    val before = recall()
    val rep = IvfIndex.staleness(wh, "ann").head()
    val t1 = System.nanoTime()
    IvfIndex.retrain(wh, "ann", "id", "v", k = k + k / 2, iters = 3)
    val tRetrain = (System.nanoTime() - t1) / 1e9
    val after = recall()
    val healed = IvfIndex.staleness(wh, "ann").head()

    def r3(x: Double) = math.rint(x * 1000) / 1000
    println(s"""{"probe":"ann_drift","n_base":$nBase,"n_drift":$nDrift,""" +
      s""""dim":$dim,"k":$k,""" +
      s""""dist_ratio":${r3(rep.getAs[Double]("dist_ratio"))},""" +
      s""""skew_ratio":${r3(rep.getAs[Double]("skew_ratio"))},""" +
      s""""stale":${rep.getAs[Boolean]("stale")},""" +
      s""""recall_before":${r3(before)},"recall_after":${r3(after)},""" +
      s""""stale_after":${healed.getAs[Boolean]("stale")},""" +
      s""""build_sec":${r3(tBuild)},"retrain_sec":${r3(tRetrain)}}""")
    spark.stop()
  }
}
