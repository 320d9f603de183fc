package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LargeInToSemiJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.conf.set("spark.graft.rewriteLargeIn", "true")
    try f finally spark.conf.set("spark.graft.rewriteLargeIn", "false")
  }

  test("large IN list rewrites to LEFT SEMI join with identical results") {
    // file-backed: a LocalRelation source constant-folds the whole query
    val dir = java.nio.file.Files.createTempDirectory("lin").toString
    (1L to 2000L).map(i => (i, s"p$i")).toDF("id", "payload")
      .write.parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t")
    val bigSet: Seq[Long] = (1L to 500L).map(_ * 3)
    def q = df.filter(col("id").isin(bigSet: _*))

    val plain = q.collect().map(_.getLong(0)).sorted
    val (rewritten, plan) = withRule {
      (q.collect().map(_.getLong(0)).sorted,
        q.queryExecution.optimizedPlan.toString)
    }
    assert(plan.contains("LeftSemi"), plan.take(500))
    assert(rewritten === plain)
  }

  test("small IN lists and disabled flag stay as filters") {
    val df = (1L to 100L).map(i => (i, i * 2)).toDF("id", "v")
    def small = df.filter(col("id").isin(1L, 2L, 3L))
    withRule {
      assert(!small.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    }
    // disabled (default): large list stays a filter
    val big = df.filter(col("id").isin((1L to 200L): _*))
    assert(!big.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
  }
}
