package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, max: Int, overlap: Int) =
    Chunker.chunkByTokens(Seq((1L, text)).toDF("id", "text"),
        "id", "text", max, overlap)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text", "n_tokens")
      .as[(Int, String, Int)].collect().toSeq

  test("exact reconstruction: stride tokens advance, overlap repeats") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val cs = chunks(text, max = 4, overlap = 1) // stride 3
    assert(cs.map(_._2) === Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(cs.map(_._3) === Seq(4, 4, 4))
  }

  test("short doc is one chunk; final partial chunk keeps the tail") {
    assert(chunks("a b c", 10, 2) === Seq((0, "a b c", 3)))
    val cs = chunks((1 to 7).map(i => s"t$i").mkString(" "), 4, 0)
    assert(cs === Seq((0, "t1 t2 t3 t4", 4), (1, "t5 t6 t7", 3)))
  }

  test("every token appears; consecutive chunks share exactly `overlap` tokens") {
    val text = (1 to 100).map(i => s"x$i").mkString(" ")
    val cs = chunks(text, max = 16, overlap = 4)
    val all = cs.flatMap(_._2.split(" "))
    assert(all.distinct.size === 100) // nothing lost
    cs.sliding(2).foreach { case Seq((_, a, _), (_, b, _)) =>
      val tail = a.split(" ").takeRight(4).toSeq
      assert(b.split(" ").take(4).toSeq === tail)
    case _ => ()
    }
  }

  test("blank doc yields one empty chunk (documents never vanish)") {
    assert(chunks("", 8, 2) === Seq((0, "", 0)))
  }

  test("deterministic split: stable buckets, ~80/10/10, disjoint and exhaustive") {
    import graft.profile.Sampling
    val ids = spark.range(0, 10000).toDF("id")
    val s1 = Sampling.deterministicSplit(ids, "id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = s1.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(math.abs(counts("train") - 8000L) < 400)
    assert(math.abs(counts("val") - 1000L) < 200)
    assert(math.abs(counts("test") - 1000L) < 200)
    // repartitioning does not move any row between splits
    val s2 = Sampling.deterministicSplit(ids.repartition(13), "id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(s1.except(s2).count() === 0 && s2.except(s1).count() === 0)
    // buckets uncorrelated with id striping (id % 100 would alias)
    val strided = Sampling.deterministicSplit(
      spark.range(0, 10000).select(($"id" * 100).as("id")), "id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(strided.keySet === Set("train", "val", "test"))
    assert(math.abs(strided("train") - 8000L) < 500,
      s"strided ids collapsed: $strided")
  }
}
