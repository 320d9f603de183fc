package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.store.Warehouse
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._
  import Curation.CurationConfig

  private val prose = "the cat sat on the mat and it was a fine day for all of them"

  // planted: 1 good, 2 = exact dup of 1, 3 = junk (fails quality),
  // 4 = contaminated vs eval, 5 = good with PII
  private val docs = Seq(
    (1L, prose, "en"),
    (2L, prose, "en"),
    (3L, "@@ ## !! %% ^^", "en"),
    (4L, "the quick brown fox jumps over the lazy dog " + prose, "en"),
    (5L, s"contact bob@example.com about this. $prose", "en")
  ).toDF("doc_id", "text", "lang")

  private val eval = Seq(
    (100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")

  private val cfg = CurationConfig(
    evalSet = Some(eval), decontaminateN = 5, packBinTokens = 32L)

  test("curate applies every stage: redact, quality, dedup, decontaminate, pack") {
    val out = Curation.curate(docs, cfg).orderBy("doc_id")
      .select("doc_id", "n_tokens", "bin", "bin_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // survivors: 1 (keep-first of the dup pair) and 5 (PII redacted →
    // still high quality); 3 junk, 4 contaminated, 2 dup — all gone.
    assert(out.map(_._1) === Seq(1L, 5L))
    // packing is contiguous within the shard: doc 1 (16 tokens) opens
    // bin 0; doc 5 redacts the email to a single [EMAIL] token →
    // 20 tokens, packed right after doc 1 (cum 16 → bin 0, offset 16)
    assert(out === Seq((1L, 16L, 0L, 0L), (5L, 20L, 0L, 16L)))
  }

  test("curationReport shows the funnel monotonically") {
    val report = Curation.curationReport(docs, cfg)
    assert(report.map(_._1) ===
      Seq("input", "quality", "dedup", "decontaminate", "mixture"))
    assert(report.head._2 === 5L)
    // each stage only removes rows
    assert(report.map(_._2) === report.map(_._2).sorted.reverse)
    assert(report.last._2 === 2L)
  }

  test("curateToWarehouse lands a keyed, replaceable table") {
    val wh = new Warehouse(spark,
      Files.createTempDirectory("curate_wh").toString)
    val n = Curation.curateToWarehouse(docs, cfg, wh, "curated")
    assert(n === 2L)
    assert(wh.readMeta("curated").exists(_.uniqueKeys === Seq("doc_id")))
    // re-curation rebuilds, not appends
    assert(Curation.curateToWarehouse(docs, cfg, wh, "curated") === 2L)
  }
}
