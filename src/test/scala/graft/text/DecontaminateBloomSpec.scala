package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateBloomSpec extends SparkSpec {
  import spark.implicits._

  private val evalDocs = Seq(
    (1L, "the held out benchmark question about distributed query engines"),
    (2L, "a second eval prompt concerning parquet column pruning rules"))
  private val trainDocs = Seq(
    (10L, "training text with the held out benchmark question about distributed systems inside"), // shares 3-grams
    (11L, "completely unrelated prose describing alpine meadows in spring sunshine"),
    (12L, "more clean text on cooking techniques for slow roasted vegetables and herbs"),
    (13L, "discussion concerning parquet column pruning rules and their planner effects")) // shares 3-grams

  test("bloom predicate never misses what the exact predicate flags; fp bounded") {
    val eval = evalDocs.toDF("doc_id", "text")
    val train = trainDocs.toDF("doc_id", "text")
    val exact = Decontaminate.contaminationPredicate(eval, "text", 3)
    val bloom = Decontaminate.contaminationPredicateBloom(eval, "text", 3,
      expectedGrams = 1000)
    val rows = train.select($"doc_id", exact.as("e"), bloom.as("b"))
      .as[(Long, Boolean, Boolean)].collect()
    // one-sided: b must be true wherever e is true
    assert(rows.forall { case (_, e, b) => !e || b },
      s"bloom missed a true contamination: ${rows.mkString(",")}")
    // exact verdicts on this fixture
    val exactSet = rows.filter(_._2).map(_._1).toSet
    assert(exactSet === Set(10L, 13L))
    // at fpp=0.001 on 4 docs, false positives are overwhelmingly unlikely
    assert(rows.filter(_._3).map(_._1).toSet === exactSet)
  }
}
