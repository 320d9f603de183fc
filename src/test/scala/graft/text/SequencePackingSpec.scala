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
}
