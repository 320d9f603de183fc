package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters in 8 dims: ids 0-9 around e1, ids 100-109 around e5
  private def clustered = {
    val rows = (0 until 10).map { i =>
      val v = Array.fill(8)(0.01f * i)
      v(0) = 1.0f; v(1) = 0.1f * (i % 3)
      (i.toLong, v)
    } ++ (0 until 10).map { i =>
      val v = Array.fill(8)(0.01f * i)
      v(4) = 1.0f; v(5) = 0.1f * (i % 3)
      (100L + i, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("components: subspace/offset mapping and unit normalization") {
    val one = Seq((7L, Array(3.0f, 4.0f, 0.0f, 12.0f)))
      .toDF("vec_id", "embedding")
    val comp = ProductQuantization.components(one, "vec_id", "embedding", 2)
      .orderBy("sub", "q")
      .as[(Long, Int, Int, Double)].collect()
    // |v| = 13; dims (0,1) → sub 0 offsets (0,1); dims (2,3) → sub 1
    assert(comp.map(c => (c._2, c._3)) ===
      Seq((0, 0), (0, 1), (1, 0), (1, 1)))
    assert(math.abs(comp(0)._4 - 3.0 / 13) < 1e-9)
    assert(math.abs(comp(3)._4 - 12.0 / 13) < 1e-9)
  }

  test("codes are within [0, ksub) and cover both planted clusters") {
    val comp = ProductQuantization.components(clustered, "vec_id",
      "embedding", 2)
    val cents = ProductQuantization.train(comp, ksub = 4, iters = 3)
    val codes = ProductQuantization.assignCodes(comp, cents)
      .as[(Long, Int, Int)].collect()
    assert(codes.length == 20 * 2) // one code per (vec, subspace)
    assert(codes.forall(c => c._3 >= 0 && c._3 < 4))
    // cluster members must agree on the code of their dominant subspace
    val sub0 = codes.filter(_._2 == 0).groupBy(_._1).view.mapValues(_.head._3)
    val a = (0L until 10L).map(sub0(_)).toSet
    val b = (100L until 110L).map(sub0(_)).toSet
    // k-means may subdivide a cluster (ksub > clusters) — what matters
    // is that no code is SHARED across the two planted clusters
    assert((a intersect b).isEmpty,
      s"cluster codes not separated: $a vs $b")
  }

  test("pqTopK retrieves same-cluster neighbors") {
    val queries = clustered.filter(col("vec_id").isin(0, 100))
    val got = ProductQuantization.pqTopK(clustered, queries, "vec_id",
        "embedding", k = 3, m = 2, ksub = 4, iters = 3, rerank = 6)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got(0L).forall(_ < 100L), s"cross-cluster hits: ${got(0L)}")
    assert(got(100L).forall(_ >= 100L), s"cross-cluster hits: ${got(100L)}")
  }

  test("ivfPqTopK composed funnel retrieves same-cluster neighbors") {
    // prune (2 coarse cells) -> compressed scan -> exact re-rank: the
    // planted clusters land in separate cells, so each query's results
    // must come from its own cluster even with nProbe = 1
    val queries = clustered.filter(col("vec_id").isin(0, 100))
    val got = ProductQuantization.ivfPqTopK(clustered, queries, "vec_id",
        "embedding", k = 3, kCoarse = 2, nProbe = 1, m = 2, ksub = 4,
        iters = 3, rerank = 6)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got(0L).size === 3 && got(0L).forall(_ < 100L),
      s"cluster-0 results: ${got(0L)}")
    assert(got(100L).size === 3 && got(100L).forall(_ >= 100L),
      s"cluster-1 results: ${got(100L)}")
    // ranks are exact-cosine ordered (the re-rank tier is authoritative)
    val ranked = ProductQuantization.ivfPqTopK(clustered, queries,
        "vec_id", "embedding", k = 3, kCoarse = 2, nProbe = 2, m = 2,
        ksub = 4, iters = 3, rerank = 20)
      .filter(col("query_id") === 0L).orderBy("rank")
      .select("corpus_id", "cosine").as[(Long, Double)].collect()
    assert(ranked.map(_._2).sliding(2).forall(p => p(0) >= p(1)),
      s"re-rank order broken: ${ranked.toSeq}")
  }

  test("codebooks and codes are layout-independent (decimal-exact means)") {
    def run(parts: Int) = {
      val comp = ProductQuantization.components(
        clustered.repartition(parts), "vec_id", "embedding", 2)
      val cents = ProductQuantization.train(comp, ksub = 4, iters = 2)
      ProductQuantization.assignCodes(comp, cents)
        .as[(Long, Int, Int)].collect().toSet
    }
    assert(run(1) == run(7))
  }
}
