package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[ChunkedWindows.lag1]] must equal the plain per-key window lag on
  * every row — including across chunk boundaries, with many chunks,
  * few keys, null source values, and single-row keys.
  */
class ChunkedWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def refLag(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("k").orderBy(col("o"), col("id"))
    df.withColumn("pv", lag(col("v"), 1).over(w))
      .withColumn("po", lag(col("o"), 1).over(w))
  }

  test("chunked lag ≡ per-key window lag, boundaries included") {
    val rnd = new scala.util.Random(20260815L)
    // 3 keys × 2000 rows: with 32 shuffle partitions each key spans
    // MANY chunks, so every stitch path is exercised
    val rows = (0 until 6000).map { i =>
      (i.toLong, s"k${i % 3}", rnd.nextInt(100000).toLong,
        rnd.nextDouble())
    }
    val df = rows.toDF("id", "k", "o", "v")
    val got = ChunkedWindows.lag1(df, Seq("k"), Seq("o", "id"),
        Map("v" -> "pv", "o" -> "po"))
      .select("id", "pv", "po")
    val want = refLag(df).select("id", "pv", "po")
    val joined = got.as("g").join(want.as("w"), Seq("id"))
    assert(joined.count() === 6000L)
    val bad = joined.filter(
      not(col("g.pv") <=> col("w.pv")) || not(col("g.po") <=> col("w.po")))
    assert(bad.count() === 0L,
      "chunked lag diverged:\n" + bad.limit(5).collect().mkString("\n"))
  }

  test("null source values lag through; single-row keys get null") {
    val df = Seq(
      (1L, "a", 1L, Option(1.0)),
      (2L, "a", 2L, None: Option[Double]), // null value must lag to id 3
      (3L, "a", 3L, Option(3.0)),
      (4L, "b", 1L, Option(9.0))           // lone row: pv null
    ).toDF("id", "k", "o", "v")
    val got = ChunkedWindows.lag1(df, Seq("k"), Seq("o", "id"),
        Map("v" -> "pv"))
      .select("id", "pv").as[(Long, Option[Double])].collect().toMap
    assert(got(1L) === None)
    assert(got(2L) === Some(1.0))
    assert(got(3L) === None) // predecessor's value IS null
    assert(got(4L) === None)
  }

  test("plan is balanced: window exchange hashes on the chunk id, not the raw key") {
    val df = (0 until 1000).map(i =>
      (i.toLong, s"k${i % 2}", i.toLong, i.toDouble)).toDF("id", "k", "o", "v")
    val plan = graft.ops.EngineOps.explain(
      ChunkedWindows.lag1(df, Seq("k"), Seq("o", "id"), Map("v" -> "pv")),
      "formatted")
    // the CORPUS-sized window exchange (the streamed side of the
    // bridge join — first exchange in plan order) must include __pid
    // in its hash key: hashing on the raw key alone is exactly the
    // 5-task skew this helper exists to kill. Raw-key hashes are
    // legal only in the boundary branch, which is P×|keys| rows and
    // sits under the BroadcastExchange.
    val hashKeys = raw"hashpartitioning\(([^)]*)\)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(hashKeys.nonEmpty, "expected a window exchange:\n" +
      plan.take(2000))
    assert(hashKeys.head.contains("__pid"),
      s"corpus window exchange missing __pid chunk key: $hashKeys\n" +
        plan.take(2000))
  }
}
