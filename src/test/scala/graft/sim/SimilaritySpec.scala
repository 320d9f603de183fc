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

  test("trainCentroids recovers an obvious cluster structure") {
    // three tight direction-clusters in 3d; ids chosen so the k seeds
    // (lowest ids) start one per cluster after iteration regardless
    val mk = (base: Array[Float], eps: Float, n: Int, id0: Long) =>
      (0 until n).map(i => (id0 + i,
        base.zipWithIndex.map { case (x, j) =>
          x + (if (j == i % 3) eps * (1 + i % 2) else 0f) }))
    val data = (mk(Array(10f, 0f, 0f), 0.1f, 10, 0L) ++
      mk(Array(0f, 10f, 0f), 0.1f, 10, 100L) ++
      mk(Array(0f, 0f, 10f), 0.1f, 10, 200L)).toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(data, "vec_id", "embedding",
      k = 3, iters = 4)
    assert(cents.count() === 3)
    // every point lands in a cell whose centroid points its way
    val assigned = Similarity.ivfAssign(data, "vec_id", "embedding",
      cents, "centroid_id", "centroid_vec")
    val purity = assigned
      .withColumn("cluster", (col("vec_id") / 100).cast("int"))
      .groupBy("cluster").agg(countDistinct("centroid_id").as("n_cells"))
      .select("n_cells").as[Long].collect()
    assert(purity.forall(_ === 1L), purity.toSeq.toString)
  }

  test("ivfTopK recall vs brute force >= 60% on real embeddings; probes prune the corpus") {
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
      k = 8, iters = 3)
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding",
      cents, "centroid_id", "centroid_vec")
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(assigned, queries, "vec_id", "embedding",
      cents, "centroid_id", "centroid_vec", k = 5, nProbe = 3)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("covarianceMatrix: hand-checked entries, layout-independent") {
    import spark.implicits._
    // x1 = (1,2,4), x2 = (2,4,8): cov(1,1)=var(x1), cov(1,2)=2*var(x1)
    // means: m1=7/3, m2=14/3; E[x1²]=7, var1=7-49/9=14/9
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(2.0f, 4.0f)),
      (3L, Array(4.0f, 8.0f))).toDF("vec_id", "embedding")
    def entries(df: org.apache.spark.sql.DataFrame) =
      Similarity.covarianceMatrix(df, "vec_id", "embedding")
        .as[(Int, Int, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val got = entries(vecs)
    assert(got.size == 3)
    assert(math.abs(got((1, 1)) - 14.0 / 9) < 1e-6)
    assert(math.abs(got((1, 2)) - 28.0 / 9) < 1e-6)
    assert(math.abs(got((2, 2)) - 56.0 / 9) < 1e-6)
    // exact decimal sums → bit-identical under any partitioning
    val reparted = entries(vecs.repartition(5))
    assert(got.forall { case (k, v) => reparted(k) == v })
  }
}
