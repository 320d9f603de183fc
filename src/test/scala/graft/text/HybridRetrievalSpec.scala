package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 is the lexical hit; doc 3 is the dense hit; doc 2 is both
  private def docs = Seq(
    (1L, "spark spark spark engine"),
    (2L, "spark cluster"),
    (3L, "unrelated words entirely"),
    (4L, "more unrelated filler text")
  ).toDF("doc_id", "text")

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f)),   // query vector
    (1L, Array(0.0f, 1.0f)),
    (2L, Array(0.9f, 0.1f)),
    (3L, Array(1.0f, 0.05f)),
    (4L, Array(-1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("doc in both lists outranks single-list docs; rrf math exact") {
    val r = HybridRetrieval.rrfFuse(docs, "doc_id", "text",
        Seq("spark"), vecs, "vec_id", "embedding",
        queryId = 0L, depth = 2, k = 60)
      .as[(Long, Option[Int], Option[Int], Double)].collect()
      .map(x => x._1 -> x).toMap
    // sparse arm: docs 1, 2 (bm25 desc); dense arm: 3, 2 (cosine desc)
    assert(r(1L)._2.contains(1) && r(1L)._3.isEmpty)
    assert(r(3L)._3.contains(1) && r(3L)._2.isEmpty)
    assert(r(2L)._2.contains(2) && r(2L)._3.contains(2))
    // fused score: doc 2 (1/62 + 1/62) beats both single-arm rank-1s
    assert(r(2L)._4 > r(1L)._4 && r(2L)._4 > r(3L)._4)
    val expected2 = BigDecimal(1.0 / 62 + 1.0 / 62)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r(2L)._4 - expected2) < 1e-9)
    val expected1 = BigDecimal(1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r(1L)._4 - expected1) < 1e-9)
    // docs in neither top-depth list don't appear
    assert(!r.contains(4L))
  }

  test("depth bounds each arm independently") {
    val r = HybridRetrieval.rrfFuse(docs, "doc_id", "text",
        Seq("spark"), vecs, "vec_id", "embedding",
        queryId = 0L, depth = 1, k = 60)
      .as[(Long, Option[Int], Option[Int], Double)].collect()
    assert(r.count(_._2.isDefined) === 1)
    assert(r.count(_._3.isDefined) === 1)
  }
}
