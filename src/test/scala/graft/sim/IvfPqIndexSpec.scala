package graft.sim

import graft.SparkSpec
import graft.io.Tables
import graft.store.Warehouse
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[IvfPqIndex]]: the persisted three-tier funnel — compressed codes
  * partition-pruned to the probed cells, full vectors touched only
  * shortlist-deep, recall holding against the exact truth.
  */
class IvfPqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.table(spark, "/root/testdata/sf0.001",
    "embeddings").select(col("vec_id"), col("embedding"))

  test("persisted search recall ≥ 0.9 @10 vs exact; all four tables land") {
    val wh = new Warehouse(spark, Files.createTempDirectory("ivfpq").toString)
    val (nCells, nCodes) = IvfPqIndex.build(wh, "ann", emb,
      "vec_id", "embedding", kCoarse = 8, m = 16, ksub = 16, iters = 3)
    assert(nCells > 1 && nCells <= 8)
    assert(nCodes === emb.count())
    for (t <- Seq("ann__centroids", "ann__books", "ann__codes", "ann__cells"))
      assert(wh.tableExists(t), s"missing $t")
    // codes are centroid-partitioned (the pruning unit)
    assert(wh.readMeta("ann__codes").exists(_.partitionBy ===
      Seq("centroid_id")))

    val queries = emb.filter(col("vec_id").isin(0, 1, 2))
    val got = IvfPqIndex.search(wh, "ann", queries, "vec_id", "embedding",
      k = 10, nProbe = 4, rerank = 100)
    val exact = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 10)
    val hits = got.select("query_id", "corpus_id")
      .join(exact.select(col("query_id"), col("corpus_id")),
        Seq("query_id", "corpus_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    for (q <- Seq(0L, 1L, 2L))
      assert(hits.getOrElse(q, 0L) >= 9L, s"query $q recall ${hits.get(q)}")
    // ranks are exact-cosine ordered within each query
    val ranked = got.filter(col("query_id") === 0).orderBy("rank")
      .select("cosine").as[Double].collect()
    assert(ranked.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("incremental append: both tiers grow, replay appends nothing, recall holds") {
    val wh = new Warehouse(spark, Files.createTempDirectory("ivfpqa").toString)
    val base = emb.filter(col("vec_id") < 80)
    val tail = emb.filter(col("vec_id") >= 80)
    val nTail = tail.count()
    assert(nTail > 0, "premise: non-empty append batch")
    IvfPqIndex.build(wh, "ann", base, "vec_id", "embedding",
      kCoarse = 8, m = 16, ksub = 16, iters = 3)
    assert(IvfPqIndex.append(wh, "ann", tail, "vec_id", "embedding") === nTail)
    // both tiers now cover the full corpus, and codes agree with cells
    val n = emb.count()
    assert(wh.read("ann__cells").count() === n)
    assert(wh.read("ann__codes").select("id").distinct().count() === n)
    val mismatch = wh.read("ann__codes").select(col("id"),
        col("centroid_id").as("__code_cell")).distinct()
      .join(wh.read("ann__cells").select(col("vec_id").as("id"),
        col("centroid_id")), Seq("id"))
      .filter(col("__code_cell") =!= col("centroid_id")).count()
    assert(mismatch === 0L, "code rows disagree with cell assignment")
    // idempotent: a replayed batch appends nothing to either tier
    assert(IvfPqIndex.append(wh, "ann", tail, "vec_id", "embedding") === 0L)
    assert(wh.read("ann__codes").count() ===
      n * 16, "codes tier grew on replay")
    // appended vectors are searchable: recall@10 vs exact over the
    // FULL corpus (truth includes the appended tail)
    // appended vectors are searchable: recall@10 vs exact over the
    // FULL corpus (truth includes the appended tail). nProbe=8 of 8
    // ISOLATES the append path: at this degenerate corpus size (~100
    // vectors, ~12 per cell) an unprobed cell structurally hides part
    // of a query's true top-10 — pruned-probe recall is contract-gated
    // where the corpus is big enough (the build test above and
    // q_sim_ivfpq_index at sf0.01); here any recall miss must mean a
    // tail vector failed to reach a tier
    val queries = emb.filter(col("vec_id").isin(0, 1, 2))
    val got = IvfPqIndex.search(wh, "ann", queries, "vec_id", "embedding",
      k = 10, nProbe = 8, rerank = 100)
    val exact = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 10)
    val hits = got.select("query_id", "corpus_id")
      .join(exact.select(col("query_id"), col("corpus_id")),
        Seq("query_id", "corpus_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    for (q <- Seq(0L, 1L, 2L))
      assert(hits.getOrElse(q, 0L) >= 9L, s"query $q recall ${hits.get(q)}")
  }

  test("in-batch duplicate ids collapse: append stays idempotent per id WITHIN a batch") {
    // the anti-join dedups across calls, but a single micro-batch
    // carrying the same id twice would land twice in both tiers and
    // double-count ADC terms at search time — append must collapse
    // them (IvfIndex.append shares the contract)
    val wh = new Warehouse(spark, Files.createTempDirectory("ivfpqd").toString)
    val base = emb.filter(col("vec_id") < 80)
    val tail = emb.filter(col("vec_id") >= 80)
    val nTail = tail.count()
    IvfPqIndex.build(wh, "ann", base, "vec_id", "embedding",
      kCoarse = 8, m = 16, ksub = 16, iters = 3)
    val dupBatch = tail.union(tail) // every id twice in ONE batch
    assert(IvfPqIndex.append(wh, "ann", dupBatch, "vec_id", "embedding")
      === nTail)
    val n = emb.count()
    assert(wh.read("ann__cells").count() === n, "cells tier double-counted")
    assert(wh.read("ann__codes").count() === n * 16,
      "codes tier double-counted")
    assert(wh.read("ann__codes").select("id", "sub").distinct().count()
      === n * 16, "duplicate (id, sub) code rows")
  }

  test("streamed ingest ≡ batch append on both tiers") {
    import graft.streaming.{StreamIngest, StreamSimilarity}
    val wh = new Warehouse(spark, Files.createTempDirectory("ivfpqs").toString)
    val whB = new Warehouse(spark, Files.createTempDirectory("ivfpqsB").toString)
    val in = Files.createTempDirectory("ivfpqs_in").toString
    val ckpt = Files.createTempDirectory("ivfpqs_ck").toString
    val seed = emb.filter(col("vec_id") < 60)
    IvfPqIndex.build(wh, "ann", seed, "vec_id", "embedding",
      kCoarse = 4, m = 8, ksub = 16, iters = 3)
    IvfPqIndex.build(whB, "ann", seed, "vec_id", "embedding",
      kCoarse = 4, m = 8, ksub = 16, iters = 3)
    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamSimilarity.ivfPqIngestStream(wh, "ann",
        StreamIngest.readFileStream(spark, in, schema),
        "vec_id", "embedding", ckpt).awaitTermination()
    }
    emb.filter(col("vec_id") >= 60 && col("vec_id") < 75)
      .coalesce(1).write.mode("append").parquet(in)
    drain()
    emb.filter(col("vec_id") >= 75)
      .coalesce(1).write.mode("append").parquet(in)
    drain()
    IvfPqIndex.append(whB, "ann",
      emb.filter(col("vec_id") >= 60 && col("vec_id") < 75),
      "vec_id", "embedding")
    IvfPqIndex.append(whB, "ann", emb.filter(col("vec_id") >= 75),
      "vec_id", "embedding")
    def rows(w: Warehouse, tbl: String, cols: String*) = w.read(tbl)
      .select(cols.map(col): _*)
      .collect().map(_.toSeq.map(String.valueOf(_)).mkString(","))
      .sorted.toSeq
    assert(rows(wh, "ann__codes", "id", "sub", "cid", "centroid_id") ===
      rows(whB, "ann__codes", "id", "sub", "cid", "centroid_id"))
    assert(rows(wh, "ann__cells", "vec_id", "centroid_id") ===
      rows(whB, "ann__cells", "vec_id", "centroid_id"))
    assert(wh.read("ann__cells").count() === emb.count())
  }

  test("compressed scan is partition-pruned to the probed cells") {
    val wh = new Warehouse(spark, Files.createTempDirectory("ivfpq2").toString)
    IvfPqIndex.build(wh, "ann", emb, "vec_id", "embedding",
      kCoarse = 8, m = 8, ksub = 16, iters = 3)
    val one = emb.filter(col("vec_id") === 0)
    val result = IvfPqIndex.search(wh, "ann", one, "vec_id", "embedding",
      k = 3, nProbe = 1, rerank = 10)
    val plan = graft.ops.EngineOps.explain(result, "formatted")
    assert(
      raw"PartitionFilters: \[[^\]]*centroid_id".r.findFirstIn(plan).isDefined,
      "no partition filter on centroid_id:\n" + plan.take(1500))
  }
}
