package graft.sim

import graft.SparkSpec
import graft.store.Warehouse
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The ANN retrain/drift lifecycle: frozen centroids degrade recall
  * as the ingested distribution drifts, [[IvfIndex.staleness]] makes
  * that measurable BEFORE users notice, and [[IvfIndex.retrain]] /
  * [[IvfPqIndex.retrain]] restore recall through a crash-safe
  * snapshot-first rebuild.
  */
class IndexRetrainSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** id-deterministic cluster member: center ± small seeded noise. */
  private def member(rnd: scala.util.Random,
      center: Array[Double]): Seq[Double] =
    center.map(x => x + 0.05 * rnd.nextGaussian()).toSeq

  // build-time world: 4 tight clusters along +e0..+e3
  private def baseCorpus = {
    val rnd = new scala.util.Random(20260815L)
    val centers = (0 until 4).map { a =>
      val c = new Array[Double](dim); c(a) = 1.0; c
    }
    (0 until 240).map(i => (i.toLong, member(rnd, centers(i % 4))))
  }

  // drifted world: 2 clusters in the OPPOSITE half-space (−e0, −e1):
  // near-orthogonal to every stale centroid, so members scatter
  // across cells on noise alone — the classic recall-killing drift
  private def driftCorpus = {
    val rnd = new scala.util.Random(99L)
    val centers = (0 until 2).map { a =>
      val c = new Array[Double](dim); c(a) = -1.0; c
    }
    (0 until 120).map(i => (1000L + i, member(rnd, centers(i % 2))))
  }

  private def recallAt10(wh: Warehouse, name: String,
      corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, nProbe: Int): Double = {
    val got = IvfIndex.search(wh, name, queries, "id", "v",
      k = 10, nProbe = nProbe)
    val exact = Similarity.bruteForceTopK(corpus, queries, "id", "v", k = 10)
    val hits = got.select("query_id", "corpus_id")
      .join(exact.select(col("query_id"), col("corpus_id")),
        Seq("query_id", "corpus_id")).count()
    hits.toDouble / exact.count()
  }

  test("drifted appends degrade recall and trip staleness; retrain restores both") {
    val wh = new Warehouse(spark, Files.createTempDirectory("drift").toString)
    val base = baseCorpus.toDF("id", "v")
    val drift = driftCorpus.toDF("id", "v")
    val full = base.union(drift)
    IvfIndex.build(wh, "ann", base, "id", "v", k = 4, iters = 4)

    val fresh = IvfIndex.staleness(wh, "ann").head()
    assert(!fresh.getAs[Boolean]("stale"),
      s"index stale straight after build: $fresh")

    IvfIndex.append(wh, "ann", drift, "id", "v")
    val queries = drift.filter(col("id") < 1006)

    val before = recallAt10(wh, "ann", full, queries, nProbe = 2)
    val report = IvfIndex.staleness(wh, "ann").head()
    assert(report.getAs[Boolean]("stale"),
      s"drifted append did not trip staleness: $report")
    assert(report.getAs[Double]("dist_ratio") > 1.5,
      s"coarse distortion should have risen: $report")

    // retrain re-fits from the index's own vectors; k grows to cover
    // the drifted clusters the frozen structure never had cells for
    IvfIndex.retrain(wh, "ann", "id", "v", k = 6, iters = 4)
    val after = recallAt10(wh, "ann", full, queries, nProbe = 2)
    val healed = IvfIndex.staleness(wh, "ann").head()
    assert(!healed.getAs[Boolean]("stale"),
      s"retrain left the index stale: $healed")
    assert(after >= 0.9, s"post-retrain recall $after < 0.9 (was $before)")
    assert(after > before,
      s"retrain did not improve recall: $before -> $after")
    // all vectors survived the rebuild
    assert(wh.read("ann__cells").count() === full.count())
  }

  test("search serves the OLD index mid-retrain; append refuses; rerun resumes") {
    val wh = new Warehouse(spark, Files.createTempDirectory("driftc").toString)
    val base = baseCorpus.toDF("id", "v")
    IvfIndex.build(wh, "ann", base, "id", "v", k = 4, iters = 4)
    val q = base.limit(3)

    // simulate a crash mid-BUILD-ASIDE: committed snapshot pinned,
    // a partial next generation on disk, old index fully intact
    val src = base.select(col("id"), col("v"))
    wh.replaceTable("ann__retrain_src", src,
      Map(IvfIndex.CommittedMark -> "test"))
    val partial = base.limit(7)
    wh.createTable("ann__next__centroids", partial.schema,
      ifExists = "replace")
    wh.append("ann__next__centroids", partial)

    // serve-during-retrain: search answers from the OLD generation
    // with no error for the whole build phase
    assert(recallAt10(wh, "ann", base, q, nProbe = 4) >= 0.9)
    // append refuses for the whole retrain: post-snapshot vectors
    // would be silently dropped by the swap
    val e = intercept[IllegalArgumentException] {
      IvfIndex.append(wh, "ann", base.limit(1), "id", "v")
    }
    assert(e.getMessage.contains("retrain"))

    // recovery IS rerunning retrain: rebuilds aside from the pinned
    // snapshot (discarding the partial next generation), then swaps
    IvfIndex.retrain(wh, "ann", "id", "v", k = 6, iters = 4)
    assert(!wh.tableExists("ann__retrain_src"))
    assert(!wh.tableExists("ann__next__centroids"))
    assert(wh.read("ann__centroids").count() === 6L) // NEW generation
    assert(wh.read("ann__cells").count() === base.count())
    assert(recallAt10(wh, "ann", base, q, nProbe = 4) >= 0.9)
  }

  test("crash mid-SWAP: mixed generations refuse serving; rerun finishes the swap") {
    val wh = new Warehouse(spark, Files.createTempDirectory("drifts").toString)
    val base = baseCorpus.toDF("id", "v")
    IvfIndex.build(wh, "ann", base, "id", "v", k = 4, iters = 4)
    val q = base.limit(3)

    // a complete next generation, swap marker stamped, ONE tier
    // already promoted — exactly the state a crash between renames
    // leaves behind
    val src = base.select(col("id"), col("v"))
    wh.replaceTable("ann__retrain_src", src,
      Map(IvfIndex.CommittedMark -> "test"))
    IvfIndex.build(wh, "ann__next", base, "id", "v", k = 6, iters = 4)
    wh.writeTableFile("ann__retrain_src", IvfIndex.SwapReadyMark,
      IvfIndex.IvfTiers.mkString(","))
    wh.promoteTable("ann__next__centroids", "ann__centroids")

    // live tiers span two generations (6 centroids, 4-cell cells
    // tier) — serving must refuse loudly
    val e1 = intercept[IllegalArgumentException] {
      IvfIndex.search(wh, "ann", q, "id", "v", k = 5)
    }
    assert(e1.getMessage.contains("retrain"))
    val e2 = intercept[IllegalArgumentException] {
      IvfIndex.append(wh, "ann", base.limit(1), "id", "v")
    }
    assert(e2.getMessage.contains("retrain"))

    // rerun skips the build (swap already pending) and finishes the
    // remaining renames idempotently
    IvfIndex.retrain(wh, "ann", "id", "v", k = 6, iters = 4)
    assert(!wh.tableExists("ann__retrain_src"))
    assert(wh.read("ann__centroids").count() === 6L)
    assert(wh.read("ann__cells").select("centroid_id").distinct().count() <= 6L)
    assert(wh.read("ann__cells").count() === base.count())
    assert(recallAt10(wh, "ann", base, q, nProbe = 6) >= 0.9)
  }

  test("truncated swap marker cannot promote a tier subset: refuse, then recover") {
    // The marker lands atomically now (writeTableFile is tmp+rename),
    // but a LEGACY pre-atomic crash artifact — a truncated tier list —
    // must still never promote a subset, drop the snapshot+marker, and
    // serve a mixed-generation index with every guard cleared. The
    // contract: refuse loudly; rewriting the complete marker (what a
    // rerun of the correct retrain stamps) recovers.
    val wh = new Warehouse(spark, Files.createTempDirectory("drifttm").toString)
    val base = baseCorpus.toDF("id", "v")
    IvfIndex.build(wh, "ann", base, "id", "v", k = 4, iters = 4)
    val src = base.select(col("id"), col("v"))
    wh.replaceTable("ann__retrain_src", src,
      Map(IvfIndex.CommittedMark -> "test"))
    IvfIndex.build(wh, "ann__next", base, "id", "v", k = 6, iters = 4)
    // legacy crash artifact: only a PREFIX of the tier list landed
    wh.writeTableFile("ann__retrain_src", IvfIndex.SwapReadyMark,
      IvfIndex.IvfTiers.mkString(",").take(12))
    val e = intercept[IllegalArgumentException] {
      IvfIndex.retrain(wh, "ann", "id", "v", k = 6, iters = 4)
    }
    assert(e.getMessage.contains("refusing to finish a partial swap"),
      e.getMessage)
    // guards stay up: nothing was promoted, nothing dropped
    assert(wh.tableExists("ann__retrain_src"))
    assert(wh.tableExists("ann__next__centroids"))
    assert(wh.read("ann__centroids").count() === 4L)
    // a complete marker (what the correct retrain stamps) recovers
    wh.writeTableFile("ann__retrain_src", IvfIndex.SwapReadyMark,
      IvfIndex.IvfTiers.mkString(","))
    IvfIndex.retrain(wh, "ann", "id", "v", k = 6, iters = 4)
    assert(!wh.tableExists("ann__retrain_src"))
    assert(wh.read("ann__centroids").count() === 6L)
    IvfIndex.IvfTiers.foreach { t =>
      assert(!wh.tableExists("ann__next" + t),
        s"staged tier ann__next$t survived the rerun")
    }
    val q = base.limit(3)
    assert(recallAt10(wh, "ann", base, q, nProbe = 6) >= 0.9)
  }

  test("crashed IVF×PQ swap finished via IvfIndex.retrain promotes all FIVE recorded tiers") {
    // The marker is the authority on WHAT to promote: an operator who
    // follows the guard message with the base-type retrain must not
    // leave __books/__codes on the old generation.
    val wh = new Warehouse(spark, Files.createTempDirectory("driftxt").toString)
    val base = baseCorpus.toDF("id", "v")
    IvfPqIndex.build(wh, "ann", base, "id", "v",
      kCoarse = 4, m = 4, ksub = 16, iters = 4)
    // a complete next PQ generation with the swap marker stamped — the
    // state a crash right before the renames leaves behind
    val src = base.select(col("id"), col("v"))
    wh.replaceTable("ann__retrain_src", src,
      Map(IvfIndex.CommittedMark -> "test"))
    IvfPqIndex.build(wh, "ann__next", base, "id", "v",
      kCoarse = 6, m = 4, ksub = 16, iters = 4)
    val pqTiers = IvfIndex.IvfTiers ++ Seq("__books", "__codes")
    wh.writeTableFile("ann__retrain_src", IvfIndex.SwapReadyMark,
      pqTiers.mkString(","))
    // finish via the BASE type's retrain: recorded tiers win
    IvfIndex.retrain(wh, "ann", "id", "v", k = 6, iters = 4)
    assert(!wh.tableExists("ann__retrain_src"))
    assert(wh.read("ann__centroids").count() === 6L)
    // the PQ tiers crossed generations too (staged gone ⇔ promoted):
    // no mixed index
    pqTiers.foreach { t =>
      assert(!wh.tableExists("ann__next" + t),
        s"staged tier ann__next$t survived the cross-type rerun")
    }
  }

  test("comma-boundary truncated PQ marker refuses: staged tiers outvote the list") {
    // a legacy truncation that cut EXACTLY at a comma produces a
    // vocabulary-valid list that covers the base type's tiers — the
    // staged-but-unrecorded __next tables are the remaining evidence
    // and must refuse the promotion
    val wh = new Warehouse(spark, Files.createTempDirectory("driftcb").toString)
    val base = baseCorpus.toDF("id", "v")
    IvfPqIndex.build(wh, "ann", base, "id", "v",
      kCoarse = 4, m = 4, ksub = 16, iters = 4)
    val src = base.select(col("id"), col("v"))
    wh.replaceTable("ann__retrain_src", src,
      Map(IvfIndex.CommittedMark -> "test"))
    IvfPqIndex.build(wh, "ann__next", base, "id", "v",
      kCoarse = 6, m = 4, ksub = 16, iters = 4)
    // truncated at the comma right after the base tiers
    wh.writeTableFile("ann__retrain_src", IvfIndex.SwapReadyMark,
      IvfIndex.IvfTiers.mkString(","))
    val e = intercept[IllegalArgumentException] {
      IvfIndex.retrain(wh, "ann", "id", "v", k = 6, iters = 4)
    }
    assert(e.getMessage.contains("does not record"), e.getMessage)
    // nothing promoted, guards up
    assert(wh.read("ann__centroids").count() === 4L)
    assert(wh.tableExists("ann__next__books"))
    // the complete marker recovers, promoting all five
    val pqTiers = IvfIndex.IvfTiers ++ Seq("__books", "__codes")
    wh.writeTableFile("ann__retrain_src", IvfIndex.SwapReadyMark,
      pqTiers.mkString(","))
    IvfIndex.retrain(wh, "ann", "id", "v", k = 6, iters = 4)
    pqTiers.foreach(t => assert(!wh.tableExists("ann__next" + t)))
    assert(wh.read("ann__centroids").count() === 6L)
  }

  test("pre-marker crash: snapshot records the tier set; wrong-type resume refuses") {
    // an IVF×PQ retrain that crashes during BUILD ASIDE (snapshot
    // committed, no swap marker) resumed via IvfIndex.retrain would
    // build and swap only three tiers over a five-tier index — the
    // snapshot's recorded tier set must refuse the mismatched resume
    val wh = new Warehouse(spark, Files.createTempDirectory("driftpm").toString)
    val base = baseCorpus.toDF("id", "v")
    IvfPqIndex.build(wh, "ann", base, "id", "v",
      kCoarse = 4, m = 4, ksub = 16, iters = 4)
    val pqTiers = IvfIndex.IvfTiers ++ Seq("__books", "__codes")
    val src = base.select(col("id"), col("v"))
    wh.replaceTable("ann__retrain_src", src,
      Map(IvfIndex.CommittedMark ->
        s"at=0;tiers=${pqTiers.mkString(",")}"))
    val e = intercept[IllegalArgumentException] {
      IvfIndex.retrain(wh, "ann", "id", "v", k = 6, iters = 4)
    }
    assert(e.getMessage.contains("rerun the index type"), e.getMessage)
    // the matching type's retrain completes the lifecycle
    IvfPqIndex.retrain(wh, "ann", "id", "v",
      kCoarse = 6, m = 4, ksub = 16, iters = 4)
    assert(!wh.tableExists("ann__retrain_src"))
    assert(wh.read("ann__centroids").count() === 6L)
  }

  test("uncommitted (partial) snapshot is re-taken from cells, not trusted") {
    val wh = new Warehouse(spark, Files.createTempDirectory("driftu").toString)
    val base = baseCorpus.toDF("id", "v")
    IvfIndex.build(wh, "ann", base, "id", "v", k = 4, iters = 4)

    // legacy-style snapshot that crashed mid-append: 5 of 240 rows,
    // NO _committed sidecar — trusting it would silently shrink the
    // index to 5 vectors
    val partial = base.limit(5).select(col("id"), col("v"))
    wh.createTable("ann__retrain_src", partial.schema, ifExists = "replace")
    wh.append("ann__retrain_src", partial)

    IvfIndex.retrain(wh, "ann", "id", "v", k = 4, iters = 4)
    assert(wh.read("ann__cells").count() === base.count(),
      "retrain trusted a partial snapshot and lost vectors")
  }

  test("IVF×PQ retrain refits all four tables and restores recall") {
    val wh = new Warehouse(spark, Files.createTempDirectory("driftpq").toString)
    val base = baseCorpus.toDF("id", "v")
    val drift = driftCorpus.toDF("id", "v")
    val full = base.union(drift)
    IvfPqIndex.build(wh, "ann", base, "id", "v",
      kCoarse = 4, m = 4, ksub = 16, iters = 4)
    IvfPqIndex.append(wh, "ann", drift, "id", "v")
    assert(IvfPqIndex.staleness(wh, "ann").head().getAs[Boolean]("stale"))

    val oldBooks = wh.read("ann__books").collect().toSet
    IvfPqIndex.retrain(wh, "ann", "id", "v",
      kCoarse = 6, m = 4, ksub = 16, iters = 4)
    assert(!IvfPqIndex.staleness(wh, "ann").head().getAs[Boolean]("stale"))
    // books were re-fit on the drift-inclusive corpus, not carried over
    assert(wh.read("ann__books").collect().toSet !== oldBooks)
    // both tiers cover every vector exactly once
    assert(wh.read("ann__cells").count() === full.count())
    assert(wh.read("ann__codes").select("id").distinct().count()
      === full.count())

    val queries = drift.filter(col("id") < 1006)
    val got = IvfPqIndex.search(wh, "ann", queries, "id", "v",
      k = 10, nProbe = 3, rerank = 100)
    val exact = Similarity.bruteForceTopK(full, queries, "id", "v", k = 10)
    val hits = got.select("query_id", "corpus_id")
      .join(exact.select(col("query_id"), col("corpus_id")),
        Seq("query_id", "corpus_id")).count()
    assert(hits.toDouble / exact.count() >= 0.9)
  }
}
