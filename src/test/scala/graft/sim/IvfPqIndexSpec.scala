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
      k = 10, nProbe = 4, m = 16, rerank = 100)
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

  test("compressed scan is partition-pruned to the probed cells") {
    val wh = new Warehouse(spark, Files.createTempDirectory("ivfpq2").toString)
    IvfPqIndex.build(wh, "ann", emb, "vec_id", "embedding",
      kCoarse = 8, m = 8, ksub = 16, iters = 3)
    val one = emb.filter(col("vec_id") === 0)
    val result = IvfPqIndex.search(wh, "ann", one, "vec_id", "embedding",
      k = 3, nProbe = 1, m = 8, rerank = 10)
    val plan = graft.ops.EngineOps.explain(result, "formatted")
    assert(
      raw"PartitionFilters: \[[^\]]*centroid_id".r.findFirstIn(plan).isDefined,
      "no partition filter on centroid_id:\n" + plan.take(1500))
  }
}
