package graft.plans

import graft.SparkSpec
import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** The native expressions must agree with their composed-builtin
  * twins where the semantics are defined to be identical, and must
  * execute inside codegen.
  */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c", "singletoken", "repeated repeated repeated words words")

  test("simhash64 native == composed for identical token hashes") {
    val df = texts.toDF("t")
    val both = df.select(
      Dedup.simHashColumn(spark, $"t").as("native"),
      Dedup.simHash($"t").as("composed"))
      .as[(Long, Long)].collect()
    both.foreach { case (n, c) => assert(n === c) }
  }

  test("ngram_hashes cardinality == string-shingle cardinality") {
    val df = texts.toDF("t")
    val sizes = df.select(
      size(Dedup.shingleHashes(spark, $"t", 3)).as("native_n"),
      size(TextAnalysis.wordShingles($"t", 3)).as("string_n"))
      .as[(Int, Int)].collect()
    sizes.foreach { case (n, s) => assert(n === s) }
  }

  test("minhash_slots: identical inputs -> identical signature; supersets only lower minima") {
    val df = Seq(
      (1L, Seq(10L, 20L, 30L)),
      (2L, Seq(10L, 20L, 30L)),
      (3L, Seq(10L, 20L, 30L, 40L, 50L))
    ).toDF("id", "hashes")
    val sigs = df.select($"id",
      call_function("minhash_slots", $"hashes", lit(8)).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) === sigs(2L))
    // superset's minima can only be <= the subset's, slotwise
    sigs(3L).zip(sigs(1L)).foreach { case (sup, sub) => assert(sup <= sub) }
  }

  test("native expressions stay inside whole-stage codegen") {
    // needs a real file scan: LocalTableScan never codegens
    val dir = java.nio.file.Files.createTempDirectory("ne").toString
    texts.toDF("t").write.parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t")
      .select(Dedup.simHashColumn(spark, $"t").as("s"))
    val plan = graft.ops.EngineOps.explain(df, "codegen")
    assert(plan.contains("Found 1 WholeStageCodegen subtree"), plan.take(400))
  }

  test("generated code COMPILES — no silent interpreted fallback (fallback disabled)") {
    // A subtree existing is not enough: janino can reject the
    // generated source at runtime (e.g. a bare loop variable shadowing
    // an enclosing generated local — the pre-round-6 simhash64 bug)
    // and Spark silently degrades the stage to interpreted. With
    // fallback off, that degradation becomes a hard failure here.
    val dir = java.nio.file.Files.createTempDirectory("ne2").toString
    texts.toDF("t").write.parquet(s"$dir/t")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.read.parquet(s"$dir/t")
        .select(Dedup.simHashColumn(spark, $"t").as("sig"),
          Dedup.shingleHashes(spark, $"t", 3).as("grams"))
      assert(df.collect().length === texts.length)
      // the full banding composition q_dedup_simhash runs
      val pairs = Dedup.simHashNearDupPairs(
        (texts ++ texts).zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "doc_id", "text", maxDistance = 3)
      assert(pairs.count() >= texts.length) // each duplicated text pairs
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
