package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized exactness invariant for [[Dedup.setSimJoinPrefix]]:
  * over corpora drawn from a small shared vocabulary (maximal overlap
  * pressure — worst case for filter correctness, since near-threshold
  * pairs abound) the prefix-filtered join must equal the brute-force
  * all-pairs join at every threshold and shingle size. Guards the
  * prefix-length, size, and positional filters' boundary arithmetic
  * (the ⌈τ·len⌉ edges where an off-by-one silently drops true pairs).
  */
class PrefixJoinPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "lam", "mu")

  private def randomCorpus(nDocs: Int): Seq[(Long, String)] =
    (1L to nDocs.toLong).map { id =>
      val len = 3 + rnd.nextInt(13)
      id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }

  test("property: prefix join ≡ brute force on overlap-dense random corpora") {
    for (trial <- 1 to 2) {
      val df = randomCorpus(30).toDF("id", "text").cache()
      for (tau <- Seq(0.25, 0.5, 0.85); n <- Seq(1, 2)) {
        def collect(d: org.apache.spark.sql.DataFrame) =
          d.select($"id_a", $"id_b", round($"jaccard", 9).as("j"))
            .as[(Long, Long, Double)].collect().toSet
        val got = collect(
          Dedup.setSimJoinPrefix(df, "id", "text", n, tau))
        val want = collect(
          Dedup.ngramJaccardPairs(df, "id", "text", n, tau))
        assert(got === want, s"trial=$trial tau=$tau n=$n")
        if (tau == 0.25 && n == 1)
          assert(want.nonEmpty, "expected overlap-dense corpus to produce pairs")
      }
      df.unpersist()
    }
  }
}
