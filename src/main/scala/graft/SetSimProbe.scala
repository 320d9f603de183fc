package graft

import org.apache.spark.sql.functions._

/** Scale probe for the class-collapsed exact top-k similarity face
  * ([[graft.dedup.Dedup.setSimTopKPrefix]]) on its TARGET corpus
  * shape: EXACT-copy replication (the web-crawl dedup case). Copies
  * with byte-identical text collapse into one equivalence class per
  * distinct shingle set, so the prefix join runs over the base-corpus
  * class table however many copies exist — this probe replicates the
  * base documents n× WITHOUT ScaleUp's per-copy salt and times the
  * operator at two replication factors; a flat-ish ratio is the
  * class-collapse contract.
  *
  * (ScaleUp's salted replicas are NEAR-dups by design — every copy
  * pair genuinely exceeds τ with distinct sets, so EXACT top-k has
  * provably Ω(copies²) candidate work per clone group there; that
  * corpus shape is the LSH family's job — see BASELINE.md round 8.)
  *
  * Usage: `runMain graft.SetSimProbe <sfDir> [n1 n2 k tau]`.
  */
object SetSimProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n1 = args.lift(1).map(_.toInt).getOrElse(10)
    val n2 = args.lift(2).map(_.toInt).getOrElse(100)
    val k = args.lift(3).map(_.toInt).getOrElse(3)
    val tau = args.lift(4).map(_.toDouble).getOrElse(0.3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.SparkEnv.session(appName = "graft-setsimprobe",
      cores = cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.io.Tables.readParquet(spark, s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def replicate(n: Int) = base
      .withColumn("__r", explode(sequence(lit(0), lit(n - 1))))
      .select((col("doc_id") + col("__r") * 10000000L).as("doc_id"),
        col("text"))
      .localCheckpoint()

    def time(n: Int): (Long, Double) = {
      val corpus = replicate(n)
      val rows = corpus.count()
      val t0 = System.nanoTime()
      graft.dedup.Dedup.setSimTopKPrefix(corpus, "doc_id", "text",
          shingleSize = 2, minJaccard = tau, k = k)
        .write.format("noop").mode("overwrite").save()
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    val (r1, s1) = time(n1)
    val (r2, s2) = time(n2)
    println(s"""{"probe":"setsim_topk_exact_copies","tau":$tau,"k":$k,""" +
      s""""n1":$n1,"rows1":$r1,"sec1":${math.rint(s1 * 1000) / 1000},""" +
      s""""n2":$n2,"rows2":$r2,"sec2":${math.rint(s2 * 1000) / 1000},""" +
      s""""ratio":${math.rint(s2 / s1 * 100) / 100}}""")
    spark.stop()
  }
}
