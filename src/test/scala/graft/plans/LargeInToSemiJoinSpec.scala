package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[LargeInToSemiJoin]] ships DEFAULT-ON above its 8192-value
  * threshold (InProbe measurement: InSet's boxed hash probe loses to
  * a broadcast semi join past the ≈2k-10k crossover and keeps losing
  * as the list grows). These pins hold the shipped behavior: big
  * lists rewrite with identical results, sub-threshold lists and the
  * kill switch leave Spark's native InSet path untouched.
  */
class LargeInToSemiJoinSpec extends SparkSpec {
  import spark.implicits._

  // file-backed: a LocalRelation source constant-folds the whole query
  private lazy val fileDf = {
    val dir = java.nio.file.Files.createTempDirectory("lin").toString
    (1L to 40000L).map(i => (i, s"p$i")).toDF("id", "payload")
      .write.parquet(s"$dir/t")
    spark.read.parquet(s"$dir/t")
  }

  test("above-threshold IN rewrites to LEFT SEMI by default, same results") {
    val df = fileDf
    val bigSet: Seq[Long] = (1L to 9000L).map(_ * 3)
    def q = df.filter(col("id").isin(bigSet: _*))

    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(500))
    val rewritten = q.collect().map(_.getLong(0)).sorted
    val plain = {
      spark.conf.set("spark.graft.rewriteLargeIn", "false")
      try q.collect().map(_.getLong(0)).sorted
      finally spark.conf.unset("spark.graft.rewriteLargeIn")
    }
    assert(rewritten === plain)
    assert(rewritten.length === 9000)
  }

  test("sub-threshold lists stay as filters (InSet wins below crossover)") {
    def small = fileDf.filter(col("id").isin((1L to 500L): _*))
    assert(!small.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
  }

  test("kill switch restores the native path; threshold is tunable") {
    def big = fileDf.filter(col("id").isin((1L to 9000L): _*))
    spark.conf.set("spark.graft.rewriteLargeIn", "false")
    try assert(!big.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    finally spark.conf.unset("spark.graft.rewriteLargeIn")
    // lowered threshold pulls smaller lists into the rewrite
    spark.conf.set("spark.graft.rewriteLargeIn.threshold", "64")
    try {
      def mid = fileDf.filter(col("id").isin((1L to 200L): _*))
      assert(mid.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    } finally spark.conf.unset("spark.graft.rewriteLargeIn.threshold")
  }
}
