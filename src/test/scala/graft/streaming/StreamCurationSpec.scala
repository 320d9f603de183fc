package graft.streaming

import graft.SparkSpec
import graft.pipeline.Curation.CurationConfig
import graft.text.Decontaminate
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StreamCurationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // good prose: stopword-rich, no punctuation → quality ≈ 0.8
  private val prose1 = "the cat and the dog are in the house with a mouse " +
    "and it is warm that day for all of us on the hill"
  private val prose2 = "a bird was on the roof and the wind is soft with " +
    "rain that falls to the ground for hours in the night"
  // contains the eval shingle "alpha beta gamma" (n=3)
  private val dirty = "the quick alpha beta gamma fox is happy and it was " +
    "a fine day in the sun with the friends of the town"
  private val junk = "@@@@ #### $$$$" // punct-only → quality ≈ 0.25

  private val evalSet = Seq((1L, "alpha beta gamma delta")).toDF("eid", "text")

  private def cfg = CurationConfig(evalSet = Some(evalSet), decontaminateN = 3)

  test("curateStream = batch redact->quality->dedup->decontaminate on one batch") {
    val in = Files.createTempDirectory("cur_in").toString
    Seq(
      (1L, prose1, "en", ts("2024-01-01 00:00:00")),
      (2L, prose1, "en", ts("2024-01-01 00:01:00")), // exact dup of 1
      (3L, junk, "en", ts("2024-01-01 00:02:00")),   // quality reject
      (4L, dirty, "en", ts("2024-01-01 00:03:00")),  // eval-contaminated
      (5L, prose2, "en", ts("2024-01-01 00:04:00"))  // clean survivor
    ).toDF("doc_id", "text", "lang", "ts").coalesce(1)
      .write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = StreamIngest.readFileStream(spark, in, schema)
    val rows = StreamIngest.runToMemory(spark,
      StreamCuration.curateStream(stream, cfg, "ts"), "curate_t")

    assert(rows.map(_.getAs[Long]("doc_id")).toSet.subsetOf(Set(1L, 2L, 5L)))
    assert(rows.length === 2) // one of {1,2} (dedup is first-processed) + 5
    assert(rows.map(_.getAs[String]("text")).toSet === Set(prose1, prose2))
    // n_tokens carried through, positive
    assert(rows.forall(_.getAs[Long]("n_tokens") > 0))
  }

  test("contaminationPredicate verdicts ≡ batch contaminationReport") {
    val train = Seq(
      (1L, prose1), (2L, dirty), (3L, prose2),
      (4L, "alpha beta gamma"), // exactly one eval shingle
      (5L, "beta gamma alpha")  // same words, wrong order → clean
    ).toDF("doc_id", "text")

    val viaPredicate = train
      .select($"doc_id",
        Decontaminate.contaminationPredicate(evalSet, "text", 3)
          .as("contaminated"))
      .as[(Long, Boolean)].collect().toMap
    val viaReport = Decontaminate
      .contaminationReport(train, evalSet, "doc_id", "text", 3)
      .select($"doc_id", $"contaminated")
      .as[(Long, Boolean)].collect().toMap

    assert(viaPredicate === viaReport)
    assert(viaPredicate === Map(1L -> false, 2L -> true, 3L -> false,
      4L -> true, 5L -> false))
  }

  test("streaming dedup state persists across checkpointed restarts") {
    val in = Files.createTempDirectory("cur2_in").toString
    val ckpt = Files.createTempDirectory("cur2_ckpt").toString
    val out = Files.createTempDirectory("cur2_out").toString
    def run(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = StreamIngest.readFileStream(spark, in, schema)
      StreamIngest.ingestAvailableNow(
        StreamCuration.curateStream(stream, cfg, "ts"), out, ckpt)
    }
    Seq((1L, prose1, "en", ts("2024-01-01 00:00:00")))
      .toDF("doc_id", "text", "lang", "ts").coalesce(1)
      .write.mode("append").parquet(in)
    run()
    // second run: a duplicate of doc 1 inside the watermark horizon is
    // dropped by the RECOVERED dedup state, the fresh doc lands
    Seq(
      (6L, prose1, "en", ts("2024-01-01 00:10:00")),
      (7L, prose2, "en", ts("2024-01-01 00:11:00"))
    ).toDF("doc_id", "text", "lang", "ts").coalesce(1)
      .write.mode("append").parquet(in)
    run()
    val ids = spark.read.parquet(out).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(ids === Set(1L, 7L))
  }
}
