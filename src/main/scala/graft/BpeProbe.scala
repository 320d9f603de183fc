package graft

import org.apache.spark.sql.functions._

/** BPE training-scale probe: [[graft.text.Vocab.bpeTrain]] launches
  * one full pair-scoring Spark job per merge (32k merges = 32k jobs —
  * spec-sized only); [[graft.text.Vocab.bpeTrainFast]] pays ONE
  * corpus aggregation and then trains driver-side over the
  * vocabulary-sized word-frequency table. This probe times
  * bpeTrainFast at real merge counts on a replica corpus — the
  * evidence behind BASELINE.md's BPE row.
  *
  * Usage: `runMain graft.BpeProbe <dir> [nMerges] [minFreq]`.
  * `synth:20000000 200 7` exercises the OPEN-VOCABULARY path: 20M raw
  * distinct words refuse the driver guard outright; minFreq pruning
  * (standard Sennrich practice) brings the frequency table under it
  * and training proceeds — the 100-TB-crawl recourse documented on
  * [[graft.text.Vocab.bpeTrainFast]].
  */
object BpeProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale10")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(1000)
    val minFreq = args.lift(2).map(_.toLong).getOrElse(1L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.SparkEnv.session(appName = "graft-bpeprobe",
      cores = cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val docs =
      if (dir.startsWith("synth:")) {
        // the testdata corpus has ~30 distinct words — it exhausts
        // after ~100 merges, which says nothing about vocab-scale
        // cost. synth:V builds a deterministic V-word corpus (md5-hex
        // words, 6–13 chars, Zipf-ish 1–7 repeats) so the merge loop
        // runs at real vocabulary sizes.
        val v = dir.stripPrefix("synth:").toLong
        spark.range(v).select(col("id").as("doc_id"),
          concat_ws(" ", array_repeat(
            substring(md5(col("id").cast("string")), lit(1),
              (lit(6) + pmod(col("id"), lit(8))).cast("int")),
            (lit(1) + pmod(col("id"), lit(7))).cast("int"))).as("text"))
      } else graft.io.Tables.readParquet(spark, s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val rules = graft.text.Vocab.bpeTrainFast(docs, "text", nMerges,
      maxWords = 1 << 23, minFreq = minFreq)
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"probe":"bpe_fast","corpus":"$dir","n_docs":$nDocs,""" +
      s""""n_merges":${rules.length},"min_freq":$minFreq,""" +
      s""""sec":${math.rint(sec * 1000) / 1000}}""")
    spark.stop()
  }
}
