package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.io.Tables
import graft.sim.IvfIndex
import graft.store.Warehouse
import org.apache.spark.sql.functions._

class StreamSimilaritySpec extends SparkSpec {

  private def emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("streamed ingest ≡ batch append; replay appends nothing") {
    val wh = new Warehouse(spark, Files.createTempDirectory("ssim_wh").toString)
    val whB = new Warehouse(spark, Files.createTempDirectory("ssim_whB").toString)
    val in = Files.createTempDirectory("ssim_in").toString
    val ckpt = Files.createTempDirectory("ssim_ckpt").toString

    // both indexes built on the same seed corpus → identical centroids
    val seed = emb.filter(col("vec_id") < 30)
    IvfIndex.build(wh, "ann", seed, "vec_id", "embedding", k = 4, iters = 3)
    IvfIndex.build(whB, "ann", seed, "vec_id", "embedding", k = 4, iters = 3)

    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamSimilarity.ivfIngestStream(wh, "ann",
        StreamIngest.readFileStream(spark, in, schema),
        "vec_id", "embedding", ckpt).awaitTermination()
    }
    // two micro-batch file drops
    emb.filter(col("vec_id") >= 30 && col("vec_id") < 40)
      .coalesce(1).write.mode("append").parquet(in)
    drain()
    emb.filter(col("vec_id") >= 40 && col("vec_id") < 50)
      .coalesce(1).write.mode("append").parquet(in)
    drain()

    // batch twin over the same two batches
    IvfIndex.append(whB, "ann",
      emb.filter(col("vec_id") >= 30 && col("vec_id") < 40),
      "vec_id", "embedding")
    IvfIndex.append(whB, "ann",
      emb.filter(col("vec_id") >= 40 && col("vec_id") < 50),
      "vec_id", "embedding")

    def cells(w: Warehouse) = w.read("ann__cells")
      .select("vec_id", "centroid_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(cells(wh) === cells(whB))
    assert(cells(wh).map(_._1).distinct.size === 50)

    // replay: same checkpoint, no new files → nothing re-ingested
    val before = cells(wh)
    drain()
    assert(cells(wh) === before)

    // id-level idempotency without the checkpoint's help: a fresh
    // stream over the SAME files (new checkpoint) reprocesses them,
    // and IvfIndex.append drops every already-assigned id
    val ckpt2 = Files.createTempDirectory("ssim_ckpt2").toString
    val schema = spark.read.parquet(in).schema
    StreamSimilarity.ivfIngestStream(wh, "ann",
      StreamIngest.readFileStream(spark, in, schema),
      "vec_id", "embedding", ckpt2).awaitTermination()
    assert(cells(wh) === before)
  }

  test("checkpoint LOSS: re-streamed search results never duplicate") {
    val wh = new Warehouse(spark, Files.createTempDirectory("ssim_wh3").toString)
    val in = Files.createTempDirectory("ssim_in3").toString
    val ckptA = Files.createTempDirectory("ssim_ckpt4").toString
    val ckptB = Files.createTempDirectory("ssim_ckpt5").toString
    IvfIndex.build(wh, "ann", emb, "vec_id", "embedding", k = 8, iters = 3)
    def drain(ckpt: String): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamSimilarity.ivfSearchStream(wh, "ann",
        StreamIngest.readFileStream(spark, in, schema),
        "vec_id", "embedding", k = 5, nProbe = 2,
        sinkTable = "annl_results", checkpoint = ckpt).awaitTermination()
    }
    emb.filter(col("vec_id") < 2).coalesce(1).write.mode("append").parquet(in)
    drain(ckptA)
    emb.filter(col("vec_id") >= 2 && col("vec_id") < 4)
      .coalesce(1).write.mode("append").parquet(in)
    drain(ckptA)
    // checkpoint dies: the restarted query re-serves everything at
    // id 0 — stale result partitions under the old batching must
    // clear or every pre-loss query's results duplicate
    emb.filter(col("vec_id") >= 4 && col("vec_id") < 5)
      .coalesce(1).write.mode("append").parquet(in)
    drain(ckptB)
    val res = wh.read("annl_results").select("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(res.length === res.distinct.length,
      "duplicate results after checkpoint loss")
    assert(res.map(_._1).distinct.sorted === Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("streamed search lands per-batch results ≡ direct IvfIndex.search") {
    val wh = new Warehouse(spark, Files.createTempDirectory("ssim_wh2").toString)
    val in = Files.createTempDirectory("ssim_in2").toString
    val ckpt = Files.createTempDirectory("ssim_ckpt3").toString
    IvfIndex.build(wh, "ann", emb, "vec_id", "embedding", k = 8, iters = 3)

    val queries = emb.filter(col("vec_id") < 3)
    queries.coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    StreamSimilarity.ivfSearchStream(wh, "ann",
      StreamIngest.readFileStream(spark, in, schema),
      "vec_id", "embedding", k = 5, nProbe = 2,
      sinkTable = "ann_results", checkpoint = ckpt).awaitTermination()

    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "corpus_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sorted.toSeq
    val streamed = key(wh.read("ann_results"))
    val direct = key(IvfIndex.search(wh, "ann", queries, "vec_id",
      "embedding", k = 5, nProbe = 2))
    assert(streamed === direct)
    assert(streamed.nonEmpty)
    // sink is physically partitioned by batch (the replay-overwrite unit)
    assert(wh.readMeta("ann_results").exists(_.partitionBy === Seq("batch_id")))
  }
}
