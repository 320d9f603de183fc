package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[BottomKSample]]: min-k under union is a set operation, so the
  * sample is identical under any partitioning; it equals the window
  * top-k selection; and nulls/overflow edges behave.
  */
class BottomKSampleSpec extends SparkSpec {
  import spark.implicits._

  private def base = spark.range(1000).select(
    col("id"), ((col("id") * 2654435761L) % 4294967296L).as("p"),
    (col("id") % 313).cast("double").as("v"))

  private def sample(parts: Int): Seq[Row] =
    base.repartition(parts)
      .agg(call_function("bottom_k_sample", col("v"), col("p"), lit(32))
        .as("s"))
      .select(explode(col("s"))).select("col.pri", "col.v").collect().toSeq

  test("sample is partition-invariant (1, 7, 32 partitions identical)") {
    val one = sample(1)
    assert(one.size === 32)
    assert(sample(7) === one)
    assert(sample(32) === one)
  }

  test("equals the window/order-by selection rule") {
    val expected = base.orderBy(col("p"), col("v")).limit(32)
      .select(col("p").as("pri"), col("v"))
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getDouble(1)))
    assert(sample(4) === expected)
  }

  test("nulls are skipped; fewer rows than k returns them all, sorted") {
    val df = Seq((Some(1.0), 5L), (None, 1L), (Some(2.0), 3L))
      .toDF("v", "p")
    val got = df.agg(call_function("bottom_k_sample", col("v"), col("p"),
      lit(32)).as("s")).select(explode(col("s")))
      .select("col.pri", "col.v").as[(Long, Double)].collect().toSeq
    assert(got === Seq((3L, 2.0), (5L, 1.0)))
  }

  test("grouped: each group samples independently at k") {
    val got = base.withColumn("g", pmod(col("id"), lit(3)))
      .groupBy("g")
      .agg(call_function("bottom_k_sample", col("v"), col("p"), lit(8))
        .as("s"))
      .select(col("g"), size(col("s")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got === Map(0L -> 8, 1L -> 8, 2L -> 8))
  }
}
