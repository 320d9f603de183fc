package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EngineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("query history records executed actions in a bounded buffer") {
    val h = EngineOps.installHistory(spark, capacity = 5)
    (1 to 8).foreach { i =>
      Seq(i).toDF("x").filter($"x" > 0).count()
    }
    // listener delivery is async — poll until the bus drains
    val deadline = System.currentTimeMillis() + 10000
    while (h.history.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    val hist = h.history
    assert(hist.nonEmpty && hist.size <= 5)
    assert(hist.forall(_.succeeded))
    spark.listenerManager.unregister(h)
  }

  test("planSummary detects pushed filters, codegen, broadcast") {
    val dir = java.nio.file.Files.createTempDirectory("ops").toString
    (1 to 100).map(i => (i.toLong, s"n$i")).toDF("id", "name")
      .write.parquet(s"$dir/t")
    val t = spark.read.parquet(s"$dir/t")
    val filtered = t.filter($"id" > 50).select("id")
    val sum1 = EngineOps.planSummary(filtered)
    assert(sum1.hasPushedFilters, EngineOps.explain(filtered))
    assert(sum1.wholeStageCodegen)

    val joined = t.join(broadcast(t.limit(10)), Seq("id"))
    assert(EngineOps.planSummary(joined).hasBroadcastJoin)
  }

  test("planSummaryNoAqe sees codegen in exchange-bearing plans") {
    val dir = java.nio.file.Files.createTempDirectory("ops2").toString
    (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "g")
      .write.parquet(s"$dir/t")
    def agg = spark.read.parquet(s"$dir/t").groupBy("g").count()
    // under AQE the pre-execution plan shows no codegen stages...
    assert(!EngineOps.planSummary(agg).wholeStageCodegen)
    // ...the no-AQE introspection does
    val s = EngineOps.planSummaryNoAqe(spark, agg)
    assert(s.wholeStageCodegen && s.exchangeCount >= 1)
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true") // restored
  }

  test("explain returns a formatted plan") {
    val plan = EngineOps.explain(Seq(1).toDF("x").filter($"x" > 0))
    assert(plan.contains("Physical Plan"))
  }

  test("recommendShufflePartitions scales with estimated size, floors at 1") {
    val df = (1 to 10000).map(i => (i.toLong, s"payload_$i")).toDF("id", "s")
    val generous = EngineOps.recommendShufflePartitions(df, 1L << 30)
    val tight = EngineOps.recommendShufflePartitions(df, 1024L)
    assert(generous === 1)
    assert(tight > generous)
    intercept[IllegalArgumentException] {
      EngineOps.recommendShufflePartitions(df, 0L)
    }
  }

  test("keySkewReport surfaces hot keys and the table skew factor") {
    // 90 rows of key 1, 10 spread over 2..11 → mean 100/11, max 90
    val df = ((1 to 90).map(_ => 1L) ++ (2L to 11L)).toDF("k")
    val rows = EngineOps.keySkewReport(df, "k", topN = 3).collect()
    assert(rows.length === 3)
    assert(rows.head.getAs[Long]("key") === 1L)
    assert(rows.head.getAs[Long]("n") === 90L)
    assert(rows.head.getAs[Double]("pct_share") === 90.0)
    // skew = max/mean = 90 / (100/11) = 9.9
    assert(math.abs(rows.head.getAs[Double]("skew_factor") - 9.9) < 1e-9)
    // uniform table → skew factor 1.0
    val uni = (1L to 100L).map(i => i % 10).toDF("k")
    val u = EngineOps.keySkewReport(uni, "k", topN = 1).collect().head
    assert(u.getAs[Double]("skew_factor") === 1.0)
  }

  test("join cardinality estimate tracks the true join size on planted overlap") {
    // left keys 0..9999 ×2 rows each; right keys 5000..14999 ×3 rows each
    // overlap 5000 keys -> true join rows = 5000 × 2 × 3 = 30000
    val left = spark.range(0, 20000).select(($"id" % 10000).as("lk"))
    val right = spark.range(0, 30000).select((($"id" % 10000) + 5000).as("rk"))
    val est = EngineOps.estimateJoinCardinality(left, right, "lk", "rk")
      .collect().head
    assert(est.getAs[Long]("rows_l") === 20000L)
    val overlap = est.getAs[Long]("est_overlap_keys")
    assert(math.abs(overlap - 5000L) <= 500, s"overlap est $overlap")
    val joinEst = est.getAs[Long]("est_join_rows_uniform")
    val trueRows = left.join(right, $"lk" === $"rk").count()
    assert(trueRows === 30000L)
    assert(math.abs(joinEst - trueRows) <= 0.15 * trueRows,
      s"join size est $joinEst vs true $trueRows")
  }

  test("compaction advisor flags fragmented tables; compact clears the advice") {
    import graft.store.Warehouse
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_ca").toString)
    wh.createTable("frag", Seq((1L, "x")).toDF("id", "v").schema)
    // 12 tiny appends -> 12+ files for a few KB of data
    (1 to 12).foreach(i => wh.append("frag", Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val advice = EngineOps.compactionAdvice(wh, slackFiles = 4)
    assert(advice.map(_.table) === Seq("frag"))
    assert(advice.head.recommendedFiles === 1)
    wh.compact("frag", targetFiles = 1)
    assert(EngineOps.compactionAdvice(wh, slackFiles = 4).isEmpty)
    assert(wh.read("frag").count() === 12)
  }

  test("observed metrics ride the action: null counts with no extra job") {
    val df = Seq(("a", Some(1.0)), ("b", None), ("c", Some(3.0)),
      ("d", None)).toDF("k", "v")
    val (obs, listener) = EngineOps.observed(df, "load_quality", Map(
      "n_rows" -> count(lit(1)),
      "n_null_v" -> count(when($"v".isNull, 1)),
      "v_min" -> min($"v")))
    // ONE action; the metrics are computed inside it
    assert(obs.count() === 4)
    val m = listener.awaitMetrics().get // polls async delivery + unregisters
    assert(m.getAs[Long]("n_rows") === 4L)
    assert(m.getAs[Long]("n_null_v") === 2L)
    assert(m.getAs[Double]("v_min") === 1.0)
  }
}
