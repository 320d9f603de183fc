package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class WriteAuditSpec extends SparkSpec {
  import spark.implicits._

  private def wh = new Warehouse(spark,
    Files.createTempDirectory("graft_wap").toString)

  test("all checks green: staged data publishes atomically, schema sidecar lands") {
    val w = wh
    val failed = w.writeAudited("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      Map("nonempty" -> (count(lit(1)) > 0),
        "no_null_ids" -> (count(when($"id".isNull, 1)) === 0)))
    assert(failed.isEmpty)
    assert(w.read("t").count() === 2)
    assert(w.readSchema("t").isDefined)
    assert(w.listTables() === Seq("t"))
  }

  test("red check: live table untouched, stage discarded") {
    val w = wh
    assert(w.writeAudited("t", Seq((1L, 10.0)).toDF("id", "v"),
      Map("nonempty" -> (count(lit(1)) > 0))).isEmpty)
    // bad batch: nulls in v trip the check
    val failed = w.writeAudited("t",
      Seq((2L, Some(1.0)), (3L, None)).toDF("id", "v"),
      Map("nonempty" -> (count(lit(1)) > 0),
        "no_null_v" -> (count(when($"v".isNull, 1)) === 0)))
    assert(failed === Seq("no_null_v"))
    // previous content intact, no transient dirs surface anywhere
    assert(w.read("t").as[(Long, Double)].collect().toSeq === Seq((1L, 10.0)))
    assert(w.listTables() === Seq("t"))
    assert(w.vacuum().isEmpty)
  }

  test("threshold-style checks: row-count floor blocks a truncated batch") {
    val w = wh
    assert(w.writeAudited("t", spark.range(0, 100).toDF("id"),
      Map("full" -> (count(lit(1)) >= 100))).isEmpty)
    val failed = w.writeAudited("t", spark.range(0, 3).toDF("id"),
      Map("full" -> (count(lit(1)) >= 100)))
    assert(failed === Seq("full"))
    assert(w.read("t").count() === 100)
  }
}
