package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two-tier skew story stated as assertions: AQE's runtime
  * skew-join split handles ordinary hot keys (this spec pins that the
  * final adaptive plan actually marks the join `skew=true` — config
  * that silently doesn't engage is the failure mode), and
  * [[ScaleJoins.saltedJoin]] covers the pathological single-key case
  * AQE can't subdivide further (ScaleJoinsSpec proves its equality to
  * the plain join).
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed sort-merge join partition (skew=true in final plan)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // keep the planner from coalescing everything into one partition
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB") {
      // one hot key carrying ~97% of rows + a long cold tail
      val big = spark.range(0, 300000).select(
        when($"id" % 100 =!= 0, lit(0L)).otherwise($"id" % 64).as("k"),
        $"id".as("payload"))
      val small = spark.range(0, 64).select($"id".as("k"), ($"id" * 10).as("dim"))
      val joined = big.join(small, "k")
      // execute THIS dataset's plan (count() builds a separate query
      // execution, leaving this one unexecuted / isFinalPlan=false)
      assert(joined.queryExecution.toRdd.count() === 300000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join; final plan:\n$finalPlan")
    }
  }

  test("skew diagnosis feeds mitigation: the hot key found by keySkewReport is the planted one") {
    val df = spark.range(0, 50000).select(
      when($"id" % 20 =!= 0, lit("hot")).otherwise(concat(lit("c"), $"id" % 97))
        .as("k"))
    val report = graft.ops.EngineOps.keySkewReport(df, "k", topN = 3).collect()
    assert(report.head.getAs[String]("key") === "hot")
    assert(report.head.getAs[Double]("pct_share") > 90.0)
  }
}
