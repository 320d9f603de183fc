package graft.io

import graft.SparkSpec
import graft.ops.EngineOps
import org.apache.spark.sql.functions._

/** Scan-shape guards for the parquet read path — the properties a
  * 100 TB scan lives or dies by must hold through the ns→µs rebuild
  * wrapper (a withColumn that accidentally blocked pushdown or pruning
  * would silently 100× the IO).
  */
class TablesSpec extends SparkSpec {

  test("events read keeps filter pushdown + column pruning through the ns rebuild") {
    val df = Tables.table(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_type") === "purchase")
      .select("event_id", "event_type")
    val plan = EngineOps.explain(df, "formatted")
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"),
      plan)
    // ReadSchema must not include untouched wide columns like props
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props"), readSchema)
  }

  test("suffix dispatch reads ORC (built-in columnar alternative)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orc").toString + "/t.orc"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.orc(dir)
    val back = Tables.read(spark, dir)
    assert(back.count() === 2)
    assert(back.schema.fieldNames.toSeq === Seq("id", "s"))
  }

  test("ns->us rebuild is exact integral division (truncation, never rounding)") {
    // 2026-epoch ns where double division rounds up 1µs: n/1000.0
    // rounds to a different long than n div 1000 for n ≡ 999 (mod 1000)
    // at 1.7e18 magnitudes (double ulp = 256ns)
    val dir = java.nio.file.Files.createTempDirectory("nsvals").toString
    import spark.implicits._
    val ns = Seq(1767225600123456999L, 1767225600123456001L, 1767225600123456500L)
    // write via a nanos-annotated parquet: simplest is to verify the
    // expression graft uses directly against exact integer truncation
    val out = ns.toDF("n")
      .select(expr("`n` div 1000").as("us"))
      .as[Long].collect().toSeq
    assert(out === ns.map(_ / 1000L))
    assert(out.distinct.size === 1) // all truncate to the same µs
    new java.io.File(dir).delete()
  }

  test("suffix dispatch reads compressed JSON-lines (.jsonl.gz — corpus interchange)") {
    val dir = java.nio.file.Files.createTempDirectory("jl").toString
    val f = new java.io.File(dir, "docs.jsonl.gz")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(f))
    out.write(
      """{"doc_id": 1, "text": "hello world"}
        |{"doc_id": 2, "text": "second line"}
        |""".stripMargin.getBytes("UTF-8"))
    out.close()
    val df = Tables.read(spark, f.getAbsolutePath)
    assert(df.count() === 2)
    assert(df.columns.toSet === Set("doc_id", "text"))
    // uncompressed .jsonl dispatches identically
    val f2 = new java.io.File(dir, "docs.jsonl")
    java.nio.file.Files.writeString(f2.toPath, """{"doc_id": 3}""" + "\n")
    assert(Tables.read(spark, f2.getAbsolutePath).count() === 1)
    // unknown suffixes still fail loudly
    intercept[RuntimeException] {
      Tables.read(spark, s"$dir/docs.xyz")
    }
  }
}
