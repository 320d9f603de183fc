package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Row] =
    df.agg(call_function("space_saving_topk", col("key"), lit(k)).as("s"))
      .select(explode(col("s")).as("e"))
      .select("e.key", "e.est", "e.err")
      .collect().toSeq

  test("exact when distinct keys fit the summary (no eviction, zero error)") {
    val df = (Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c"))
      .toDF("key").repartition(8)
    val got = summarize(df, 8)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === Seq(("a", 30L, 0L), ("b", 20L, 0L), ("c", 10L, 0L)))
  }

  test("bounds hold for heavy hitters under eviction churn, any partitioning") {
    // 5000 hot + 2000 distinct singletons, k=16: heavy churn, but
    // hot's frequency ≫ N/k so it must stay tracked with valid bounds
    val rows = Seq.fill(5000)("hot") ++ (1 to 2000).map(i => s"cold_$i")
    for (parts <- Seq(1, 4, 32)) {
      val df = rows.toDF("key").repartition(parts)
      val s = summarize(df, 16)
      assert(s.size === 16)
      val hot = s.find(_.getString(0) == "hot")
      assert(hot.isDefined, s"hot lost at parts=$parts")
      val (est, err) = (hot.get.getLong(1), hot.get.getLong(2))
      assert(est >= 5000L, s"upper bound broken: $est at parts=$parts")
      assert(est - err <= 5000L, s"lower bound broken: $est-$err at parts=$parts")
      // every counter's upper bound is ≥ its lower bound and ≥ 1
      s.foreach(r => assert(r.getLong(1) >= r.getLong(2) && r.getLong(1) >= 1))
    }
  }

  test("bigint keys work and nulls are ignored") {
    val df = (Seq.fill(50)(Some(7L)) ++ Seq.fill(5)(Some(9L)) :+ None)
      .toDF("key")
    val got = summarize(df, 4).map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Seq((7L, 50L), (9L, 5L)))
  }
}
