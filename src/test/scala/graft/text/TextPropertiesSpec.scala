package graft.text

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Algebraic invariants of the text/dedup expression layer, each
  * checked over a generated case batch in ONE distributed evaluation
  * (per-case Spark jobs would dominate the suite's runtime).
  */
class TextPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
  private def sentence(n: Int): String =
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("property: fingerprint is invariant to case, extra whitespace, punctuation") {
    val cases = (1 to 40).map { _ =>
      val base = sentence(3 + rnd.nextInt(12))
      val mutated = base.split(" ").map { w =>
        val cased = if (rnd.nextBoolean()) w.toUpperCase else w
        val punct = if (rnd.nextBoolean()) cased + "," else cased
        punct
      }.mkString(if (rnd.nextBoolean()) "  " else " ")
      (base, mutated)
    }.toDF("a", "b")
    val diffs = cases.filter(
      TextAnalysis.fingerprint(col("a")) =!= TextAnalysis.fingerprint(col("b")))
    assert(diffs.count() === 0, diffs.collect().mkString("\n"))
  }

  test("property: simhash is invariant under word permutation") {
    val cases = (1 to 40).map { _ =>
      val words = Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
      (words.mkString(" "), rnd.shuffle(words).mkString(" "))
    }.toDF("a", "b")
    val diffs = cases.filter(
      Dedup.simHash(col("a")) =!= Dedup.simHash(col("b")))
    assert(diffs.count() === 0)
  }

  test("property: jaccard is symmetric, bounded, and 1 on self") {
    val cases = (1 to 40).map { _ =>
      (sentence(3 + rnd.nextInt(10)), sentence(3 + rnd.nextInt(10)))
    }.toDF("ta", "tb")
      .select(
        TextAnalysis.wordShingles(col("ta"), 2).as("a"),
        TextAnalysis.wordShingles(col("tb"), 2).as("b"))
    val bad = cases.filter(
      Dedup.jaccard(col("a"), col("b")) =!= Dedup.jaccard(col("b"), col("a")) ||
        Dedup.jaccard(col("a"), col("b")) < 0.0 ||
        Dedup.jaccard(col("a"), col("b")) > 1.0 ||
        Dedup.jaccard(col("a"), col("a")) =!= 1.0)
    assert(bad.count() === 0)
  }

  test("property: quality score stays in [0,1] on adversarial inputs") {
    val inputs = Seq("", " ", "a", "!!!!!!!!", "the " * 500,
      "x" * 2000, "\t\n  ", "a b c d e f g h",
      (1 to 100).map(_ => "!@#$%").mkString(" ")) ++
      (1 to 30).map(_ => sentence(1 + rnd.nextInt(30)))
    val df = inputs.toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
    val bad = df.filter(col("q") < 0.0 || col("q") > 1.0 || col("q").isNull)
    assert(bad.count() === 0, bad.collect().mkString(","))
  }
}
