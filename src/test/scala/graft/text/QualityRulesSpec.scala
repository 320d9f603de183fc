package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C4/Gopher-style quality rules on planted documents: each rule is
  * exercised by a document built to trip exactly it.
  */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private val prose = ("the quick brown fox jumps over a lazy dog and " +
    "keeps running through the field with great joy every single day ") * 5 // 100 words

  private def stats(docs: Seq[(Long, String)]) =
    QualityRules.qualityStats(docs.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap

  test("clean prose passes every gate") {
    val s = stats(Seq((1L, prose)))(1L)
    assert(s.getAs[Boolean]("keep"))
    assert(s.getAs[Long]("n_words") === 105)
    assert(s.getAs[Double]("dup_line_frac") === 0.0)
  }

  test("duplicate lines are measured and gated") {
    val dupDoc = (Seq.fill(8)("the same line of text repeated here again") ++
      Seq("one unique line closes the document")).mkString("\n")
    val s = stats(Seq((1L, dupDoc)))(1L)
    // 9 lines, 2 distinct -> 7/9 repeat occurrences
    assert(math.abs(s.getAs[Double]("dup_line_frac") - 7.0 / 9.0) < 1e-9)
    assert(s.getAs[Double]("dup_line_char_frac") > 0.5)
    assert(!s.getAs[Boolean]("keep"))
  }

  test("hot bigram repetition is caught by the top-bigram fraction") {
    val spam = Seq.fill(60)("buy now").mkString(" ")
    val s = stats(Seq((1L, spam)))(1L)
    assert(s.getAs[Double]("top_bigram_char_frac") > 0.5)
    assert(!s.getAs[Boolean]("keep"))
  }

  test("symbol soup, bullets and ellipses trip their gates") {
    val symbols = prose + " " + Seq.fill(15)("###").mkString(" ")
    val bullets = (1 to 10).map(i => s"- bullet item number $i").mkString("\n")
    val dots = (1 to 10).map(i => s"line $i trails off...").mkString("\n")
    val m = stats(Seq((1L, symbols), (2L, bullets), (3L, dots)))
    assert(m(1L).getAs[Double]("symbol_ratio") > 0.1 && !m(1L).getAs[Boolean]("keep"))
    assert(m(2L).getAs[Double]("bullet_line_frac") === 1.0)
    assert(m(3L).getAs[Double]("ellipsis_line_frac") === 1.0)
  }

  test("non-alphabetic junk fails the alpha-word gate") {
    val nums = Seq.tabulate(80)(i => s"${i}00${i}").mkString(" ")
    val s = stats(Seq((1L, nums)))(1L)
    assert(s.getAs[Double]("alpha_word_frac") === 0.0)
    assert(!s.getAs[Boolean]("keep"))
  }

  test("degenerate inputs: empty and single-word docs") {
    val m = stats(Seq((1L, ""), (2L, "   "), (3L, "word")))
    Seq(1L, 2L).foreach { id =>
      assert(m(id).getAs[Long]("n_words") === 0)
      assert(m(id).getAs[Double]("top_bigram_char_frac") === 0.0)
      assert(!m(id).getAs[Boolean]("keep"))
    }
    assert(m(3L).getAs[Long]("n_words") === 1)
    assert(m(3L).getAs[Double]("top_bigram_char_frac") === 0.0)
  }

  test("word-count bounds gate short and absurdly long docs") {
    val short = "the quick brown fox jumps over a lazy dog and keeps " +
      "running through the field with great joy every single day" // 21 words
    val s = stats(Seq((1L, short)))(1L)
    assert(!s.getAs[Boolean]("keep"))
    // same doc passes with a loosened floor
    val loose = QualityRules.qualityStats(
      Seq((1L, short)).toDF("id", "text"), "id", "text", minWords = 10)
      .collect()(0)
    assert(loose.getAs[Boolean]("keep"))
  }

  test("dup n-gram char fraction: looped phrase detected, clean prose near zero") {
    val loop = Seq.fill(20)("we offer the best deal in town").mkString(" ")
    val df = Seq((1L, loop), (2L, prose), (3L, "one two")).toDF("id", "text")
    val m = QualityRules.dupNgramCharFraction(df, "id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) > 0.9)            // every 3-gram repeats ~20x
    assert(m(2L) > 0.7)            // prose fixture is itself a 5x loop
    assert(!m.contains(3L))        // < 3 words -> no row (caller coalesces)
    val one = Seq((9L, "alpha beta gamma delta")).toDF("id", "text")
    assert(QualityRules.dupNgramCharFraction(one, "id", "text", 3)
      .collect().head.getDouble(1) === 0.0) // all grams unique
  }

  test("repetition stats stay expression-only; bigram stat is the one shuffle") {
    val df = Seq((1L, prose)).toDF("id", "text")
    val plan = QualityRules.qualityStats(df, "id", "text")
      .queryExecution.executedPlan.toString
    // per-row features must not introduce a shuffle of the input rows:
    // the only exchanges allowed are the (id,bigram) count + per-id max
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 3, s"unexpected shuffle count in:\n$plan")
  }
}
