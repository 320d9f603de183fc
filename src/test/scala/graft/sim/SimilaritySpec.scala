package graft.sim

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine basics: parallel=1, orthogonal=0, zero-guard") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(2.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 3.0f), 0.0),
      (Array(1.0f, 1.0f), Array(0.0f, 0.0f), 0.0)
    ).toDF("a", "b", "expected")
    val rows = df.select(Similarity.cosine($"a", $"b").as("c"), $"expected")
      .as[(Double, Double)].collect()
    rows.foreach { case (c, e) => assert(math.abs(c - e) < 1e-12) }
  }

  test("bruteForceTopK ranks nearest first with deterministic ties") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(corpus,
      corpus.filter($"vec_id" === 1), "vec_id", "embedding", 2)
      .select("rank", "corpus_id").as[(Int, Long)].collect().sorted
    assert(top.toSeq === Seq((1, 2L), (2, 3L)))
  }

  test("lshTopK recall vs brute force on real embeddings >= 60%") {
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
      nPlanes = 4, nTables = 16)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("ivfAssign puts each vector in its nearest centroid cell") {
    val data = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.2f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val centroids = Seq(
      (10L, Array(1.0f, 0.0f)), (20L, Array(0.0f, 1.0f)))
      .toDF("cid", "cvec")
    val assigned = Similarity.ivfAssign(data, "vec_id", "embedding", centroids, "cid", "cvec")
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(assigned === Map(1L -> 10L, 2L -> 10L, 3L -> 20L))
  }
}
