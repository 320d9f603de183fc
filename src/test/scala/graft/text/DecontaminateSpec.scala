package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val eval = Seq(
    (100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")

  private val train = Seq(
    (1L, "a quick brown fox appeared at dawn"), // shares "quick brown fox"
    (2L, "completely unrelated sentence about databases and shuffles"),
    (3L, "over the lazy dog it went"), // shares "over the lazy" + "the lazy dog"
    (4L, "short text")).toDF("doc_id", "text")

  test("contaminationReport flags overlapping docs and reports zero for clean ones") {
    val rows = Decontaminate.contaminationReport(train, eval, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(rows === Seq(
      (1L, 1L, true),   // "quick brown fox"
      (2L, 0L, false),
      (3L, 2L, true),   // "over the lazy", "the lazy dog"
      (4L, 0L, false))) // shorter than n → whole-text gram, no match
  }

  test("removeContaminated keeps exactly the clean docs") {
    val kept = Decontaminate.removeContaminated(train, eval, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(2L, 4L))
  }

  test("eval gram set rides a broadcast — no shuffle on the corpus scan side") {
    val plan = Decontaminate.contaminationReport(train, eval, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan)
  }
}
