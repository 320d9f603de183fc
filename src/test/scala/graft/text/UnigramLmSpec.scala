package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked model and per-doc mean NLL; blank docs preserved") {
    val docs = Seq(
      (1L, "a a b"),
      (2L, "b"),
      (3L, "   ")) // blank: zero tokens
      .toDF("doc_id", "text")

    val m = UnigramLm.model(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // 4 tokens total: a ×2, b ×2 → p = 0.5 each
    assert(m === Seq(("a", 2L, 0.5), ("b", 2L, 0.5)))

    val got = UnigramLm.meanNll(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(10, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // every token has p = 0.5 → mean NLL = ln 2 for both non-blank
    // docs; the blank doc comes back as (0, null), not dropped
    assert(got === Seq(
      (1L, 3L, Some(ln2)), (2L, 1L, Some(ln2)), (3L, 0L, None)))
  }

  test("cross-corpus scoring: rare tokens score high, OOV excluded from the mean") {
    val corpus = Seq(
      (1L, "the the the the the the the the the rare"))
      .toDF("doc_id", "text")
    val lm = UnigramLm.model(corpus, "text")
    val probe = Seq(
      (10L, "the the"),   // common tokens only
      (11L, "rare"),      // rare token
      (12L, "oov oov the")) // 2 OOV + 1 known
      .toDF("doc_id", "text")
    val got = UnigramLm.meanNll(probe, "doc_id", "text", lm)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // p(the) = 0.9, p(rare) = 0.1
    def r6(x: Double) = BigDecimal(x)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) === ((10L, 2L, r6(-math.log(0.9)))))
    assert(got(1) === ((11L, 1L, r6(-math.log(0.1)))))
    // OOV tokens drop from the join: n_tokens counts SCORED tokens
    assert(got(2) === ((12L, 1L, r6(-math.log(0.9)))))
  }

  test("bigram NLL: hand-checked add-k estimate, short docs preserved") {
    // corpus bigrams: "a b" ×2, "b a" ×1  (docs: "a b a b", "b")
    // prefix counts: a· = 2, b· = 1; V = 2; k = 0.5
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "b"),        // 1 token → 0 bigrams, preserved as (0, null)
      (3L, "  "))       // blank → 0 bigrams
      .toDF("doc_id", "text")
    val got = UnigramLm.bigramMeanNll(docs, "doc_id", "text", k = 0.5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    val pAB = (2.0 + 0.5) / (2.0 + 0.5 * 2)   // P(b|a) = 2.5/3
    val pBA = (1.0 + 0.5) / (1.0 + 0.5 * 2)   // P(a|b) = 1.5/2
    def d10(x: Double) = BigDecimal(x)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val expect = ((d10(-math.log(pAB)) * 2 + d10(-math.log(pBA))) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq((1L, 3L, Some(expect)), (2L, 0L, None), (3L, 0L, None)))
  }

  test("bigram NLL flags scrambled word order that unigram NLL cannot see") {
    val natural = "the quick brown fox jumps over the lazy dog again and again"
    val scrambled = "again the over dog quick and lazy the jumps fox brown again"
    val base = (1 to 20).map(i => (i.toLong, natural))
    val docs = (base :+ (100L, scrambled)).toDF("doc_id", "text")
    val uni = UnigramLm.meanNll(docs, "doc_id", "text")
      .select("doc_id", "mean_nll").as[(Long, Double)].collect().toMap
    val bi = UnigramLm.bigramMeanNll(docs, "doc_id", "text")
      .select("doc_id", "mean_nll").as[(Long, Double)].collect().toMap
    // identical token multiset → identical unigram score
    assert(uni(100L) == uni(1L))
    // broken transitions → strictly higher bigram NLL
    assert(bi(100L) > bi(1L) + 0.5)
  }
}
