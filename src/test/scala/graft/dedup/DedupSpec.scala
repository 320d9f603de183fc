package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-duplicate corpus: docs 1/2 are near-identical (one word
  * changed), doc 3 is an exact rewording with shared 5-grams, docs
  * 10+ are unrelated. Near-dup detectors must find (1,2) and must NOT
  * pair unrelated docs at tight thresholds.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while the sun sets slowly behind the old wooden barn near the river"
  private def corpus = Seq(
    (1L, base),
    (2L, base.replace("lazy", "sleepy")), // near-dup of 1
    (3L, "completely different content about spark query engines and distributed columnar execution at massive scale"),
    (4L, "yet another unrelated document discussing weather patterns rainfall statistics and seasonal temperature variation"),
    (5L, base) // exact dup of 1
  ).toDF("id", "text")

  test("exactTextDedup collapses exact duplicates, keeps first id") {
    val out = Dedup.exactTextDedup(corpus, "text", "id")
    val ids = out.select("id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 3L, 4L)) // 5 collapsed into 1
  }

  test("ngramJaccardPairs finds planted near-dups and exact dups") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "id", "text", 5, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 5L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minHashNearDupPairs recalls planted near-dups via LSH banding") {
    val pairs = Dedup.minHashNearDupPairs(corpus, "id", "text",
      shingleSize = 5, k = 32, bands = 16, threshold = 0.5)
    val found = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 5L))) // identical sig, always banded together
    assert(found.contains((1L, 2L))) // high-jaccard near-dup
    assert(!found.exists(p => p._1 == 3L || p._2 == 3L))
    // verified jaccard on the exact pair must be 1.0
    val j15 = pairs.filter($"id_a" === 1 && $"id_b" === 5)
      .select("jaccard").as[Double].head()
    assert(j15 === 1.0)
  }

  test("simHash: identical text -> distance 0; near-dup -> small; unrelated -> large") {
    val sigs = corpus.select($"id", Dedup.simHash($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(5L))
    val near = java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))
    val far = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 12)
  }

  test("simHashNearDupPairs bands by pigeonhole and filters by distance") {
    val pairs = Dedup.simHashNearDupPairs(corpus, "id", "text", maxDistance = 12)
      .select("id_a", "id_b", "distance")
      .as[(Long, Long, Int)].collect()
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((1L, 5L)))
    assert(pairs.find(p => p._1 == 1L && p._2 == 5L).get._3 === 0)
    assert(pairSet.contains((1L, 2L)))
  }

  test("simHash hot-chunk cap keeps candidates sub-quadratic, preserves cold-bucket recall") {
    // 100 near-identical short docs: every chunk bucket is hot (size
    // ~100), so uncapped banding would emit ~100²/2 × 4 candidates.
    val hot = (1L to 100L).map(i => (i, "spam spam spam lorem ipsum boilerplate footer"))
    val planted = Seq(
      (1001L, base),
      (1002L, base.replace("lazy", "sleepy")))
    val df = (hot ++ planted).toDF("id", "text")
    val pairs = Dedup.simHashNearDupPairs(df, "id", "text",
      maxDistance = 12, maxBucketSize = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the cold-bucket planted pair survives the cap
    assert(pairs.contains((1001L, 1002L)))
    // hot buckets are dropped, not exploded: nothing near quadratic
    assert(pairs.size < 100, s"candidate pairs not capped: ${pairs.size}")
    // planted recall unchanged with the cap at its default
    val dflt = Dedup.simHashNearDupPairs(corpus, "id", "text", maxDistance = 12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dflt.contains((1L, 5L)) && dflt.contains((1L, 2L)))
  }

  test("maxDistance=0 is the exact-signature equi-join: full 64-bit key, cap-immune") {
    // 750 distinct token-set pairs (i and i+750 share a set; sets are
    // pairwise distinct across pairs). The pre-fix 64-bit chunk mask
    // wrapped to 0 under JVM shift-mod-64, folding ALL docs into one
    // bucket: over the cap -> every pair lost; under it -> quadratic.
    val docs = (0L until 1500L).map { i =>
      val s = i % 750
      (i, s"alpha$s beta$s gamma$s delta$s")
    }.toDF("id", "text")
    val pairs = Dedup.simHashNearDupPairs(docs, "id", "text",
        maxDistance = 0, maxBucketSize = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.size === 750, s"expected 750 signature-equal pairs, got ${pairs.size}")
    assert(pairs.contains((0L, 750L)) && pairs.contains((749L, 1499L)))
  }

  test("nearDupClusters + keepCanonical collapse transitive pair chains") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L))
      .toDF("id_a", "id_b")
    val clusters = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(clusters(1L) === 1L && clusters(2L) === 1L &&
      clusters(3L) === 1L && clusters(4L) === 1L)
    assert(clusters(10L) === 10L && clusters(11L) === 10L)
    assert(clusters(20L) === 20L && clusters(21L) === 20L)

    val docs = (1L to 25L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val kept = Dedup.keepCanonical(docs, "doc_id", Dedup.nearDupClusters(pairs))
      .select("doc_id").as[Long].collect().toSet
    // canonical 1/10/20 survive; 2,3,4,11,21 collapse; untouched docs pass
    assert(!kept.contains(2L) && !kept.contains(3L) && !kept.contains(4L) &&
      !kept.contains(11L) && !kept.contains(21L))
    assert(kept.contains(1L) && kept.contains(10L) && kept.contains(20L))
    assert(kept.contains(5L) && kept.size === 25 - 5)
  }

  test("incremental minhash pairs touch the new batch only, matching batch truth") {
    import graft.io.Tables
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter($"doc_id" < 40).select($"doc_id", $"text")
    val newb = corpus.filter($"doc_id" < 5)
      .select(($"doc_id" + 10000).as("doc_id"),
        concat($"text", lit(" xyzzy")).as("text"))
    val inc = Dedup.minHashNearDupPairsIncremental(
        newb, corpus, "doc_id", "text",
        shingleSize = 2, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every pair touches the new batch — corpus×corpus never pairs
    assert(inc.nonEmpty)
    assert(inc.forall { case (a, b) => a >= 10000 || b >= 10000 }, inc.toString)
    // parity: the full-batch operator on (corpus ∪ new), restricted to
    // pairs touching new, finds exactly the same set
    val full = Dedup.minHashNearDupPairs(corpus.unionByName(newb),
        "doc_id", "text", shingleSize = 2, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .filter(p => p._1 >= 10000 || p._2 >= 10000).toSet
    assert(inc === full, s"inc=$inc full=$full")
  }

  test("embeddingNearDupPairs finds cosine-close vectors") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f)), // close to 1
      (3L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal
      (4L, Array(0.0f, 0.0f, 0.0f))   // zero vector guard
    ).toDF("id", "vec")
    val pairs = Dedup.embeddingNearDupPairs(vecs, "id", "vec", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }
}
