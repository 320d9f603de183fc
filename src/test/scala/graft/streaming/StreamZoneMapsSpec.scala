package graft.streaming

import graft.SparkSpec
import graft.store.ZoneMaps
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Live zone-map maintenance: after each streamed wave the manifest
  * covers every landed file (equal to a from-scratch build), pruned
  * reads stay exact, and an unmanifested straggler file is still read
  * by the conservative live scan.
  */
class StreamZoneMapsSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch refresh covers all files; pruned reads exact across waves") {
    val in = Files.createTempDirectory("szm_in").toString
    val data = Files.createTempDirectory("szm").toString + "/t"
    val ckpt = Files.createTempDirectory("szm_ckpt").toString

    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamZoneMaps.maintainedAppend(
        StreamIngest.readFileStream(spark, in, schema),
        data, Seq("a"), ckpt).awaitTermination()
    }
    (0 until 1000).map(i => (i.toLong, (i % 100).toLong)).toDF("id", "a")
      .coalesce(2).write.mode("append").parquet(in)
    drain()
    (1000 until 1600).map(i => (i.toLong, (200 + i % 50).toLong))
      .toDF("id", "a").coalesce(2).write.mode("append").parquet(in)
    drain()

    val m = spark.read.parquet(StreamZoneMaps.manifestPath(data))
    val scratch = ZoneMaps.buildManifest(spark, data, Seq("a"))
    assert(m.agg(sum("n_rows")).head.getLong(0) === 1600L)
    assert(m.count() === scratch.count())

    val full = spark.read.parquet(data)
      .filter(col("a") >= 200 && col("a") <= 220)
      .select("id").as[Long].collect().toSet
    val pruned = StreamZoneMaps.prunedScanLive(spark, data, "a", 200L, 220L)
      .select("id").as[Long].collect().toSet
    assert(pruned === full)
    assert(ZoneMaps.pruneFiles(m, "a", 200L, 220L).size < m.count())
  }

  test("an unmanifested straggler file is still read (conservative completion)") {
    val in = Files.createTempDirectory("szm_in2").toString
    val data = Files.createTempDirectory("szm2").toString + "/t"
    val ckpt = Files.createTempDirectory("szm_ckpt2").toString
    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      StreamZoneMaps.maintainedAppend(
        StreamIngest.readFileStream(spark, in, schema),
        data, Seq("a"), ckpt).awaitTermination()
    }
    (0 until 100).map(i => (i.toLong, 1L)).toDF("id", "a")
      .coalesce(1).write.mode("append").parquet(in)
    drain()
    // simulate a crash window: data landed, manifest never refreshed
    (100 until 200).map(i => (i.toLong, 999L)).toDF("id", "a")
      .coalesce(1).write.mode("append").parquet(data)
    val live = StreamZoneMaps.prunedScanLive(spark, data, "a", 999L, 999L)
      .select("id").as[Long].collect().toSet
    assert(live === (100L until 200L).toSet)
    // ROW COUNTS, not sets: a manifested file also treated as
    // unmanifested (URI-form mismatch) would be read twice and
    // duplicate rows — a Set compare cannot see that
    val all = StreamZoneMaps.prunedScanLive(spark, data, "a",
      Long.MinValue, Long.MaxValue)
    assert(all.count() === 200L, "a file was read twice or dropped")
  }

  test("a missing manifest degrades to a full scan, not an error") {
    // covers both "maintainer never ran" and the instant between the
    // swap's rename-aside and rename-in
    val data = Files.createTempDirectory("szm3").toString + "/t"
    (0 until 50).map(i => (i.toLong, (i % 5).toLong)).toDF("id", "a")
      .coalesce(1).write.parquet(data)
    val got = StreamZoneMaps.prunedScanLive(spark, data, "a", 2L, 2L)
      .select("id").as[Long].collect().toSet
    assert(got === (0L until 50L).filter(_ % 5 == 2).toSet)
  }
}
