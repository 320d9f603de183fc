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

  test("removeDuplicateSpans keeps the canonical occurrence, excises the rest") {
    val r = SpanDedup.removeDuplicateSpans(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .as[(Long, Long, String)].collect()
    val byId = r.map(x => x._1 -> x).toMap
    // doc 1 is the canonical holder of the shared 5-gram → untouched
    assert(byId(1L)._3 === "alpha beta gamma delta epsilon zeta")
    // doc 2's copy of "alpha beta gamma delta epsilon" is excised; its
    // second gram ("beta...eta") is unique but tokens 1-5 are covered
    // by the removed occurrence, leaving only the final token
    assert(byId(2L)._3 === "eta" && byId(2L)._2 === 1L)
    // unique doc untouched
    assert(byId(3L)._3 === "one two three four five six seven")
    // whole-doc gram: doc 4 canonical, doc 5's only occurrence removed
    assert(byId(4L)._3 === "tiny doc")
    assert(byId(5L)._2 === 0L && byId(5L)._3 === "")
    // blank in → (0, "") out, row preserved
    assert(byId(6L)._2 === 0L && byId(6L)._3 === "")
    assert(r.length === 6)
  }

  test("removeDuplicateSpans excises within-doc repeats too, keep-first") {
    val d = Seq((1L, "x y z x y z tail")).toDF("doc_id", "text")
    val r = SpanDedup.removeDuplicateSpans(d, "doc_id", "text", n = 3)
      .as[(Long, Long, String)].head()
    // occurrences of "x y z" at pos 1 (canonical) and pos 4; pos-4
    // occurrence covers tokens 4-6 → they go; "tail" survives
    assert(r._3 === "x y z tail" && r._2 === 4L)
  }

  test("dropDuplicated removes above-threshold docs, keeps blanks") {
    val kept = SpanDedup.dropDuplicated(docs, "doc_id", "text",
      n = 5, maxDupFrac = 0.6)
      .select("doc_id").as[Long].collect().toSet
    // 4 and 5 at dup_frac 1.0 drop; 1/2 at 0.5 stay; blank 6 stays
    assert(kept === Set(1L, 2L, 3L, 6L))
  }
}
