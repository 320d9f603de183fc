package graft.sim

import java.nio.file.Files

import graft.SparkSpec
import graft.io.Tables
import graft.store.Warehouse
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  test("persisted index search ≡ in-memory ivfTopK; cells land partitioned by cell") {
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val wh = new Warehouse(spark, Files.createTempDirectory("ivf_wh").toString)

    val nCells = IvfIndex.build(wh, "ann", emb, "vec_id", "embedding",
      k = 8, iters = 3)
    assert(nCells > 1 && nCells <= 8)
    // the cells table is physically partitioned by centroid_id
    assert(wh.readMeta("ann__cells").exists(_.partitionBy === Seq("centroid_id")))

    val queries = emb.filter(col("vec_id") < 3)
    val got = IvfIndex.search(wh, "ann", queries, "vec_id", "embedding",
        k = 5, nProbe = 2)
      .select("query_id", "corpus_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq

    // reference: the same search straight from the in-memory frames
    val cents = wh.read("ann__centroids")
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding",
      cents, "centroid_id", "centroid_vec")
    val want = Similarity.ivfTopK(assigned, queries, "vec_id", "embedding",
        cents, "centroid_id", "centroid_vec", k = 5, nProbe = 2)
      .select("query_id", "corpus_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq

    assert(got === want)
    assert(got.nonEmpty)
  }

  test("search scan is pruned to the probed cell directories") {
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val wh = new Warehouse(spark, Files.createTempDirectory("ivf_wh2").toString)
    IvfIndex.build(wh, "ann", emb, "vec_id", "embedding", k = 8, iters = 3)

    val one = emb.filter(col("vec_id") === 0)
    val result = IvfIndex.search(wh, "ann", one, "vec_id", "embedding",
      k = 3, nProbe = 1)
    // the probed-cell isin filter must reach the cells scan as a
    // PARTITION filter (directory pruning), not a post-scan predicate
    val plan = graft.ops.EngineOps.explain(result, "formatted")
    assert(
      raw"PartitionFilters: \[[^\]]*centroid_id".r.findFirstIn(plan).isDefined,
      "no partition filter on centroid_id:\n" + plan.take(1500))
  }
}
