package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequencePackingSpec extends SparkSpec {
  import spark.implicits._

  test("packContiguous assigns concat-and-chunk bins and offsets") {
    // shard X stream: tokens 100,300,200,50 → starts at 0,100,400,600
    // budget 256 → bins 0,0,1,2; offsets 0,100,144,88
    val df = Seq(
      (1L, "X", 100L), (2L, "X", 300L), (3L, "X", 200L), (4L, "X", 50L),
      (10L, "Y", 600L), (11L, "Y", 10L) // second shard packs independently
    ).toDF("id", "shard", "tok")
    val packed = SequencePacking.packContiguous(df, "id", "tok", "shard", 256L)
      .orderBy("id")
      .select("id", "bin", "bin_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(packed === Seq(
      (1L, 0L, 0L), (2L, 0L, 100L), (3L, 1L, 144L), (4L, 2L, 88L),
      (10L, 0L, 0L), (11L, 2L, 88L)))
  }

  test("binManifest counts docs and tokens started per bin") {
    val df = Seq(
      (1L, "X", 100L), (2L, "X", 100L), (3L, "X", 300L)).toDF("id", "shard", "tok")
    val packed = SequencePacking.packContiguous(df, "id", "tok", "shard", 256L)
    val m = SequencePacking.binManifest(packed, "shard", "tok")
      .orderBy("bin")
      .select("bin", "n_docs", "tokens_started")
      .as[(Long, Long, Long)].collect().toSeq
    assert(m === Seq((0L, 3L, 500L))) // all three docs START in bin 0
  }

  test("hashShard is deterministic and in range") {
    val df = (1 to 100).map(_.toLong).toDF("id")
      .withColumn("s", SequencePacking.hashShard(col("id"), 8))
    val shards = df.select("s").as[Long].collect()
    assert(shards.forall(s => s >= 0 && s < 8))
    val again = df.select("s").as[Long].collect()
    assert(shards.toSeq === again.toSeq)
  }

  test("balancedShards: contiguous id spans, weight balance, layout independence") {
    // skewed weights: ids 1..200, weight = 1 + (id % 13) * 7
    val rows = (1L to 200L).map(i => (i, 1L + (i % 13) * 7))
    val df = rows.toDF("id", "w")
    val n = 5
    val got = SequencePacking.balancedShards(df, "id", "w", n)
      .select("id", "w", "shard").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    // shards are monotone in id order (contiguous spans) and in range
    assert(got.map(_._3).forall(s => s >= 0 && s < n))
    got.sliding(2).foreach { case Array(a, b) => assert(a._3 <= b._3) }
    // every shard's weight within one max row weight of the ideal cut
    val total = rows.map(_._2).sum
    val maxW = rows.map(_._2).max
    val byShard = got.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    byShard.foreach { case (_, w) =>
      assert(math.abs(w - total.toDouble / n) <= maxW + total.toDouble / n / 10,
        s"shard weight $w far from ideal ${total / n}")
    }
    // the assignment is a pure function of the data, not its layout
    val repart = SequencePacking.balancedShards(df.repartition(7), "id", "w", n)
      .select("id", "shard").as[(Long, Long)].collect().sortBy(_._1)
    assert(repart.map(_._2).toSeq === got.map(_._3).toSeq)
    // zero-weight tail can't fall off the end of the shard range
    val withZero = (rows :+ (999L, 0L)).toDF("id", "w")
    val last = SequencePacking.balancedShards(withZero, "id", "w", n)
      .filter($"id" === 999L).select("shard").as[Long].head()
    assert(last === n - 1)
  }
}
