package graft.profile

import graft.SparkSpec
import graft.store.Warehouse
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class SketchRollupSpec extends SparkSpec {
  import spark.implicits._

  // 10 days × overlapping user populations: day d sees users [d*50, d*50+400)
  private def events(days: Range): Seq[(Timestamp, Long)] =
    days.flatMap { d =>
      (d * 50 until d * 50 + 400).map { u =>
        (Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"), u.toLong)
      }
    }

  test("range estimate from unioned day sketches tracks the exact distinct count") {
    val df = events(0 until 10).toDF("ts", "user_id")
    val daily = SketchRollup.dailySketches(df, "ts", "user_id")
    assert(daily.count() === 10)
    // days 3..7 (2024-01-04 .. 2024-01-08): users [150, 750) → 600 exact
    val est = SketchRollup.estimateRange(daily, "2024-01-04", "2024-01-08")
      .as[Long].head()
    val exact = df.filter(to_date($"ts").between("2024-01-04", "2024-01-08"))
      .select(countDistinct($"user_id")).as[Long].head()
    assert(exact === 600L)
    assert(math.abs(est - exact) <= 0.05 * exact,
      s"estimate $est vs exact $exact")
  }

  // at this size every sketch stays in coupon (exact) mode, so the
  // union is bit-equivalent to the one-shot sketch; above the sparse
  // threshold the estimates may differ within the register error bound
  // (q_sketch_rollup carries that bounded form)
  test("union of day sketches ≡ one sketch of all days (coupon-mode exact)") {
    val df = events(0 until 6).toDF("ts", "user_id")
    val viaUnion = SketchRollup.estimateRange(
      SketchRollup.dailySketches(df, "ts", "user_id"),
      "2024-01-01", "2024-01-06").as[Long].head()
    val direct = df.agg(call_function("hll_sketch_estimate",
        call_function("hll_sketch_agg", $"user_id", lit(12))))
      .as[Long].head()
    assert(viaUnion === direct)
  }

  test("incremental updateDaily ≡ one-shot build, history never rescanned") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_skr").toString)
    val b1 = events(0 until 4).toDF("ts", "user_id")
    // batch 2 overlaps day 3 (late data) and adds days 4-5
    val b2 = events(3 until 6).toDF("ts", "user_id")
    SketchRollup.updateDaily(wh, "daily_users", b1, "ts", "user_id")
    SketchRollup.updateDaily(wh, "daily_users", b2, "ts", "user_id")
    assert(wh.read("daily_users").count() === 6)
    val incremental = SketchRollup.estimateRange(
      wh.read("daily_users"), "2024-01-01", "2024-01-06").as[Long].head()
    val oneShot = SketchRollup.estimateRange(
      SketchRollup.dailySketches(b1.union(b2), "ts", "user_id"),
      "2024-01-01", "2024-01-06").as[Long].head()
    // hll_union is register-wise max → merging late data converges to
    // exactly the one-shot sketch, duplicates and all
    assert(incremental === oneShot)
  }
}
