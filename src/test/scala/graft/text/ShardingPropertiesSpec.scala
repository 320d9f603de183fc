package graft.text

import graft.SparkSpec

/** Randomized invariants for [[SequencePacking.balancedShards]]: for
  * arbitrary weight distributions (uniform, heavy-tailed, lots of
  * zeros) the assignment must stay a contiguous monotone cut that any
  * engine computing the same exclusive-prefix-sum arithmetic would
  * reproduce — checked against a sequential reference fold.
  */
class ShardingPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  private def referenceShards(rows: Seq[(Long, Long)], n: Int): Map[Long, Long] = {
    val total = rows.map(_._2).sum
    var cum = 0L
    rows.sortBy(_._1).map { case (id, w) =>
      val shard = math.min((cum * n) / total, (n - 1).toLong)
      cum += w
      id -> shard
    }.toMap
  }

  test("property: distributed shards ≡ sequential prefix-sum fold across weight regimes") {
    val regimes: Seq[Int => Long] = Seq(
      _ => 1L + rnd.nextInt(10),                 // near-uniform
      _ => if (rnd.nextInt(20) == 0) 5000L else 1L, // heavy-tailed spikes
      _ => rnd.nextInt(3).toLong                  // many zero weights
    )
    for ((gen, ri) <- regimes.zipWithIndex; n <- Seq(1, 3, 8)) {
      val rows = (1L to 500L).map(i => (i, gen(i.toInt)))
      if (rows.map(_._2).sum > 0) {
        val expected = referenceShards(rows, n)
        val got = SequencePacking
          .balancedShards(rows.toDF("id", "w"), "id", "w", n,
            numPartitions = 1 + rnd.nextInt(16))
          .select("id", "shard").as[(Long, Long)].collect().toMap
        assert(got === expected, s"regime $ri, n=$n")
      }
    }
  }
}
