package graft.store

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits round-robin, col 0 most significant") {
    // a=0b11, b=0b01 with 2 bits → positions: a0→1, a1→3, b0→0, b1→2
    // = 0b1011 = 11
    val r = Seq((3L, 1L)).toDF("a", "b")
      .select(ZOrder.zValue(Seq($"a", $"b"), 2).as("z"))
      .as[Long].head()
    assert(r === 11L)
    // identity on a single column
    val one = Seq(5L).toDF("a")
      .select(ZOrder.zValue(Seq($"a"), 8).as("z")).as[Long].head()
    assert(one === 5L)
  }

  test("z-ordered layout tightens per-file bounds in BOTH dimensions and skips files") {
    val n = 20000
    val df = (0 until n).map { i =>
      // two decorrelated uniform dims (multiplicative hashing)
      ((i * 2654435761L) % 10000, (i * 40503L) % 10000)
    }.toDF("a", "b")
    val nFiles = 16

    val zDir = Files.createTempDirectory("zord").toString + "/t"
    ZOrder.writeZOrdered(df, zDir, Seq("a", "b"), nFiles)
    val plainDir = Files.createTempDirectory("plain").toString + "/t"
    df.repartition(nFiles).write.parquet(plainDir)

    def fileBounds(dir: String): Seq[(Long, Long, Long, Long)] =
      spark.read.parquet(dir).inputFiles.toSeq.map { f =>
        spark.read.parquet(f)
          .agg(min($"a"), max($"a"), min($"b"), max($"b"))
          .as[(Long, Long, Long, Long)].head()
      }
    def avgArea(bs: Seq[(Long, Long, Long, Long)]): Double =
      bs.map { case (alo, ahi, blo, bhi) =>
        ((ahi - alo).toDouble / 10000) * ((bhi - blo).toDouble / 10000)
      }.sum / bs.size

    val zB = fileBounds(zDir)
    val pB = fileBounds(plainDir)
    assert(zB.size === nFiles)
    // hash-scattered files span ~the full square (area ≈ 1); z-ordered
    // files cover a fraction of it in both dims at once
    assert(avgArea(zB) < 0.3, s"z avg area ${avgArea(zB)}")
    assert(avgArea(zB) < avgArea(pB) / 2,
      s"z ${avgArea(zB)} vs plain ${avgArea(pB)}")
    // the data-skipping payoff: a point-ish predicate on EITHER column
    // intersects few z-files (footer pruning), but every plain file
    def candidates(bs: Seq[(Long, Long, Long, Long)],
        aRange: Option[(Long, Long)], bRange: Option[(Long, Long)]): Int =
      bs.count { case (alo, ahi, blo, bhi) =>
        aRange.forall { case (lo, hi) => ahi >= lo && alo <= hi } &&
          bRange.forall { case (lo, hi) => bhi >= lo && blo <= hi }
      }
    assert(candidates(pB, Some((100L, 200L)), None) === nFiles)
    assert(candidates(zB, Some((100L, 200L)), None) <= nFiles / 2)
    assert(candidates(zB, None, Some((100L, 200L))) <= nFiles / 2)
  }
}
