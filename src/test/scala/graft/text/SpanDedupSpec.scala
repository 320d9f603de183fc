package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),     // shares 5-gram w/ 2
    (2L, "alpha beta gamma delta epsilon eta"),      // shares 5-gram w/ 1
    (3L, "one two three four five six seven"),       // unique
    (4L, "tiny doc"),                                // < n tokens
    (5L, "tiny doc"),                                // whole-doc gram dup of 4
    (6L, "   ")                                      // blank
  ).toDF("doc_id", "text")

  test("cross-doc duplicated grams counted; short docs collapse to whole-doc gram") {
    val r = SpanDedup.dupSpanReport(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[Double])].collect()
    val byId = r.map(x => x._1 -> x).toMap
    // docs 1/2: 6 tokens → 2 distinct 5-grams each; exactly one
    // ("alpha beta gamma delta epsilon") shared
    assert(byId(1L)._2 === 2L && byId(1L)._3 === 1L)
    assert(byId(1L)._4.contains(0.5))
    assert(byId(2L)._3 === 1L)
    // unique doc: zero duplicated grams
    assert(byId(3L)._3 === 0L && byId(3L)._4.contains(0.0))
    // short twins: one whole-doc gram each, duplicated across docs
    assert(byId(4L)._2 === 1L && byId(4L)._3 === 1L)
    assert(byId(5L)._4.contains(1.0))
    // blank doc preserved as (0, 0, null)
    assert(byId(6L)._2 === 0L && byId(6L)._4.isEmpty)
    assert(r.length === 6)
  }

  test("wordGrams emits every window joined by single spaces") {
    val g = Seq("a  b c d").toDF("t")
      .select(SpanDedup.wordGrams(col("t"), 3).as("g"))
      .as[Seq[String]].head()
    assert(g === Seq("a b c", "b c d"))
  }

  test("dropDuplicated removes above-threshold docs, keeps blanks") {
    val kept = SpanDedup.dropDuplicated(docs, "doc_id", "text",
      n = 5, maxDupFrac = 0.6)
      .select("doc_id").as[Long].collect().toSet
    // 4 and 5 at dup_frac 1.0 drop; 1/2 at 0.5 stay; blank 6 stays
    assert(kept === Set(1L, 2L, 3L, 6L))
  }
}
