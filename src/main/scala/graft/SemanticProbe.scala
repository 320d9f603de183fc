package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup scaling probe: within-cell pairing is Σ|cell|², so a
  * FIXED centroid count (the gate's deterministic 8) goes quadratic
  * as the corpus grows — the 100× sweep measured q_semantic_dedup at
  * 319 s that way. SemDeDup's own recipe scales the cluster count
  * with the corpus; this probe times [[graft.sim.SemanticDedup.verdicts]]
  * with k = max(8, N/256) centroids on the same corpus, the evidence
  * behind BASELINE.md's explanation that the 150× ratio is a
  * gate-parameterization artifact, not an operator defect.
  *
  * Usage: `runMain graft.SemanticProbe <dir>`.
  */
object SemanticProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.SparkEnv.session(appName = "graft-semprobe",
      cores = cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.io.Tables.readParquet(spark, s"$dir/embeddings.parquet")
      .localCheckpoint()
    val n = emb.count()
    val k = math.max(8L, n / 256L)
    // deterministic centroid set: the k lowest ids (gate idiom)
    val cents = emb.orderBy(col("vec_id")).limit(k.toInt)
      .localCheckpoint()
    def run(): Long =
      graft.sim.SemanticDedup.verdicts(emb, "vec_id", "embedding",
          cents, "vec_id", "embedding", threshold = 0.3)
        .filter(!col("keep")).count()
    run() // warm
    val t0 = System.nanoTime()
    val dropped = run()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"probe":"semantic_scaled","n":$n,"k":$k,""" +
      s""""dropped":$dropped,"sec":${math.rint(sec * 1000) / 1000}}""")
    spark.stop()
  }
}
