package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloom_might_contain has no false negatives (string and long keys)") {
    val keys = (1 to 500).map(i => s"key_$i")
    val bf = keys.toDF("k").stat.bloomFilter("k", 500, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val hits = keys.toDF("k")
      .filter(call_function("bloom_might_contain", lit(bos.toByteArray), $"k"))
      .count()
    assert(hits === 500) // every inserted key probes true

    val lbf = (1L to 500L).toDF("k").stat.bloomFilter("k", 500, 0.01)
    val lbos = new java.io.ByteArrayOutputStream()
    lbf.writeTo(lbos)
    val lhits = (1L to 500L).toDF("k")
      .filter(call_function("bloom_might_contain", lit(lbos.toByteArray), $"k"))
      .count()
    assert(lhits === 500)
  }

  test("bloomPrunedAntiJoin ≡ plain anti-join on overlapping random data") {
    val rnd = new Random(7)
    val small = (1 to 300).map(_ => rnd.nextInt(1000).toLong).distinct
      .toDF("k").withColumn("payload", $"k" * 10)
    val big = (1 to 2000).map(_ => rnd.nextInt(1500).toLong).distinct
      .toDF("k")
    val expected = small.join(big, Seq("k"), "left_anti")
      .as[(Long, Long)].collect().toSet
    val got = ScaleJoins.bloomPrunedAntiJoin(small, big, Seq("k"), 300)
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("pruning drops nearly all of a disjoint big side") {
    val small = (1L to 100L).toDF("k")
    val big = (1000000L to 1050000L).toDF("k")
    val kept = ScaleJoins.bloomPruned(small, big, Seq("k"), 100).count()
    // fpp 1% on 50k disjoint keys → ~500 expected; allow generous slack
    assert(kept < 2500, s"bloom kept $kept of 50001 disjoint keys")
  }

  test("composite keys fold to one hash probe, result still exact") {
    val small = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "tag")
    val big = Seq((1L, "a"), (2L, "x"), (9L, "b"))
      .toDF("id", "tag")
    val got = ScaleJoins.bloomPrunedAntiJoin(
        small, big, Seq("id", "tag"), 3)
      .as[(Long, String)].collect().toSet
    assert(got === Set((2L, "b"), (3L, "c"))) // only (1,a) exists in big
  }

  test("timestamp single key takes the hashed path and stays exact") {
    val ts = (h: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val small = Seq(ts(1), ts(2), ts(3)).toDF("t")
    val big = Seq(ts(2), ts(9)).toDF("t")
    val got = ScaleJoins.bloomPrunedAntiJoin(small, big, Seq("t"), 3)
      .as[java.sql.Timestamp].collect().toSet
    assert(got === Set(ts(1), ts(3)))
  }
}
