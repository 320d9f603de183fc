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

  test("auto predicate routes small eval sets to the exact form") {
    val eval = evalDocs.toDF("doc_id", "text")
    val train = trainDocs.toDF("doc_id", "text")
    val auto = Decontaminate.contaminationPredicateAuto(eval, "text", 3)
    // exact-form fingerprint: a scala UDF node, not bloom_might_contain
    val autoExpr = org.apache.spark.sql.graft.ColumnBridge.expression(auto)
    assert(autoExpr.toString.contains("UserDefinedFunction"),
      s"small eval set should take the exact path: " +
        autoExpr.toString.take(200))
    val got = train.select($"doc_id", auto.as("c"))
      .as[(Long, Boolean)].collect().filter(_._2).map(_._1).toSet
    assert(got === Set(10L, 13L))
  }

  test("auto predicate routes a large eval set to bloom; verdicts identical minus bounded fp") {
    // synthetic eval whose distinct 2-gram count exceeds the budget:
    // 60k docs of hash words → >100k distinct grams, budget 50k
    val eval = spark.range(60000).select(col("id").as("doc_id"),
      concat_ws(" ", md5(col("id").cast("string")),
        md5((col("id") + 1000000).cast("string")),
        md5((col("id") + 2000000).cast("string"))).as("text"))
    // train: half contaminated (copies of eval rows), half clean
    val dirty = eval.filter(col("doc_id") < 200)
      .select((col("doc_id") + 500000).as("doc_id"), col("text"))
    val clean = spark.range(200).select((col("id") + 900000).as("doc_id"),
      concat_ws(" ", lit("clean"), md5((col("id") + 7000000).cast("string")),
        md5((col("id") + 8000000).cast("string"))).as("text"))
    val train = dirty.union(clean)
    val auto = Decontaminate.contaminationPredicateAuto(eval, "text", 2,
      maxExactGrams = 50000L)
    val autoExpr = org.apache.spark.sql.graft.ColumnBridge.expression(auto)
    assert(autoExpr.toString.toLowerCase.contains("bloom_might_contain"),
      s"large eval set should take the bloom path: " +
        autoExpr.toString.take(200))
    val rows = train.select(col("doc_id"), auto.as("c"))
      .as[(Long, Boolean)].collect()
    // no false negatives: every contaminated row flagged
    assert(rows.filter(_._1 < 900000).forall(_._2),
      "bloom path missed a true contamination")
    // false positives bounded: at fpp=0.001, 200 clean docs × ~2
    // grams each ⇒ expected fp ≪ 1; allow a generous 5
    val fps = rows.filter(r => r._1 >= 900000 && r._2)
    assert(fps.length <= 5, s"too many false positives: ${fps.length}")
  }
}
