package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dedup.setSimJoinPrefix]] — exactness contract: the prefix-filtered
  * join must produce the IDENTICAL pair set (and Jaccard values) as the
  * brute-force all-pairs join, at every threshold, on planted dups,
  * real smoke docs, and a skew-stressed corpus where one token appears
  * in every document.
  */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame,
      n: Int, tau: Double, prefix: Boolean) = {
    val run = if (prefix) Dedup.setSimJoinPrefix(df, "id", "text", n, tau)
      else Dedup.ngramJaccardPairs(df, "id", "text", n, tau)
    run.select($"id_a", $"id_b", round($"jaccard", 9).as("j"))
      .as[(Long, Long, Double)].collect().toSet
  }

  private def parity(docs: Seq[(Long, String)], n: Int, tau: Double): Unit = {
    val df = docs.toDF("id", "text")
    val got = pairs(df, n, tau, prefix = true)
    val want = pairs(df, n, tau, prefix = false)
    assert(got === want, s"divergence at n=$n tau=$tau")
  }

  test("planted near-dups: prefix join ≡ brute force across thresholds") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "the quick brown fox leaps over the lazy dog",
      4L -> "an entirely different sentence about spark engines",
      5L -> "an entirely different sentence about spark clusters",
      6L -> "the quick brown fox jumps over the lazy dog") // exact dup of 1
    Seq(0.2, 0.5, 0.8, 1.0).foreach(tau => parity(docs, 2, tau))
  }

  test("skew stress: a token present in EVERY doc cannot explode candidates") {
    // every doc shares 'common'; rare-first prefixes must exclude it
    val docs = (0L until 40L).map(i =>
      i -> s"common w${i % 7} x${i % 11} y${i % 13} z$i tail${i % 3}")
    Seq(0.3, 0.6).foreach(tau => parity(docs, 1, tau))
  }

  test("real smoke docs at unigram and bigram shingles") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id".as("id"), $"text")
    Seq((2, 0.3), (1, 0.7)).foreach { case (n, tau) =>
      val got = pairs(df, n, tau, prefix = true)
      val want = pairs(df, n, tau, prefix = false)
      assert(got === want, s"divergence at n=$n tau=$tau")
      if (n == 2) assert(got.nonEmpty, "expected planted near-dups")
    }
  }

  private def naiveTopK(df: org.apache.spark.sql.DataFrame, n: Int,
      tau: Double, k: Int): Set[(Long, Long, Double, Int)] = {
    import org.apache.spark.sql.expressions.Window
    val p = Dedup.ngramJaccardPairs(df, "id", "text", n, tau)
    val sym = p.select($"id_a".as("id"), $"id_b".as("peer"), $"jaccard")
      .unionByName(p.select($"id_b".as("id"), $"id_a".as("peer"), $"jaccard"))
    sym.withColumn("rank", row_number().over(
        Window.partitionBy($"id").orderBy($"jaccard".desc, $"peer")))
      .filter($"rank" <= k)
      .select($"id", $"peer", round($"jaccard", 9), $"rank")
      .as[(Long, Long, Double, Int)].collect().toSet
  }

  test("class-collapsed top-k ≡ naive ranked all-pairs — incl. clone-heavy replicas") {
    // 6 clones of doc A, 4 of doc B (near-dup of A), singletons:
    // within-class ranking, cross-class tie-breaks, and classes at
    // rank boundaries all exercised
    val base = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "an entirely different sentence about spark engines",
      "yet another unrelated piece of text entirely")
    val docs = (Seq.tabulate(6)(i => (10L + i) -> base(0)) ++
      Seq.tabulate(4)(i => (30L + i) -> base(1)) ++
      Seq(50L -> base(2), 60L -> base(3), 70L -> base(2)))
    val df = docs.toDF("id", "text")
    for (k <- Seq(1, 3, 5); tau <- Seq(0.2, 0.5)) {
      val got = Dedup.setSimTopKPrefix(df, "id", "text", 2, tau, k)
        .select($"id", $"peer", round($"jaccard", 9), $"rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(got === naiveTopK(df, 2, tau, k), s"k=$k tau=$tau")
    }
  }

  test("class-collapsed top-k ≡ naive on real smoke docs") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id".as("id"), $"text")
    val got = Dedup.setSimTopKPrefix(df, "id", "text", 2, 0.3, 3)
      .select($"id", $"peer", round($"jaccard", 9), $"rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === naiveTopK(df, 2, 0.3, 3))
    assert(got.nonEmpty)
  }

  test("candidate-volume pre-flight refuses a clone-group-quadratic corpus fast") {
    // 40 near-identical variants (distinct sets — the salted-replica
    // shape): Σ prefdf² ≈ prefixlen · 40² per group. With the cap
    // lowered the join must REFUSE with the diagnosis instead of
    // materializing the quadratic candidate set; raising the cap (or
    // the default) lets the exact join proceed.
    val docs = (0L until 40L).map(i =>
      i -> s"the quick brown fox jumps over the lazy dog variant$i")
    val df = docs.toDF("id", "text")
    spark.conf.set("spark.graft.setsim.maxCandidates", "100")
    try {
      val e = intercept[IllegalStateException] {
        Dedup.setSimJoinPrefix(df, "id", "text", 2, 0.3).count()
      }
      assert(e.getMessage.contains("maxCandidates") &&
        e.getMessage.contains("LSH"))
      ()
    } finally spark.conf.unset("spark.graft.setsim.maxCandidates")
    // default cap: same corpus is far below a billion candidates
    assert(Dedup.setSimJoinPrefix(df, "id", "text", 2, 0.3).count() > 0)
    // EXACT-copy clones never trip it through the top-k face: the
    // class collapse removes them before the prefix join
    val clones = (0L until 40L).map(i => i -> "all copies identical text here")
    spark.conf.set("spark.graft.setsim.maxCandidates", "100")
    try
      assert(Dedup.setSimTopKPrefix(clones.toDF("id", "text"),
        "id", "text", 2, 0.3, 3).count() === 40 * 3)
    finally spark.conf.unset("spark.graft.setsim.maxCandidates")
  }

  test("tau = 1.0 keeps only identical shingle sets") {
    val docs = Seq(
      1L -> "alpha beta gamma", 2L -> "alpha beta gamma",
      3L -> "alpha beta delta")
    val got = pairs(docs.toDF("id", "text"), 1, 1.0, prefix = true)
    assert(got === Set((1L, 2L, 1.0)))
  }
}
