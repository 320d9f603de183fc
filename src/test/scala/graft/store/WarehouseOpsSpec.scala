package graft.store

import graft.SparkSpec
import graft.io.Tables
import graft.pipeline.Coercions
import java.nio.file.Files

class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tableDefinition reports columns, keys, partitioning") {
    val wh = new Warehouse(spark, Files.createTempDirectory("wd").toString)
    wh.overwrite("t", Seq((1L, "a", 2.0)).toDF("id", "g", "v"),
      partitionBy = Seq("g"))
    wh.writeMeta("t", Seq("g"), Seq("id"))
    val d = wh.tableDefinition("t")
    assert(d.columns.map(_._1).toSet === Set("id", "g", "v"))
    assert(d.uniqueKeys === Seq("id") && d.partitionBy === Seq("g"))
  }

  test("exportAll dumps every table (backup analogue)") {
    val loc = Files.createTempDirectory("wb").toString
    val out = Files.createTempDirectory("wb_out").toString
    val wh = new Warehouse(spark, loc)
    wh.overwrite("a", Seq((1L)).toDF("id"))
    wh.overwrite("b", Seq((2L)).toDF("id"))
    assert(wh.exportAll(out) === Seq("a", "b"))
    assert(spark.read.parquet(s"$out/a").count() === 1)
  }

  test("conjunctive filter builds AND-chained pushdown predicates (P6)") {
    val ev = Tables.table(spark, "/root/testdata/sf0.001", "events")
    val got = Coercions.conjunctiveFilter(ev,
      Map("event_type" -> "purchase", "user_id" -> 7L)).count()
    val want = ev.filter($"event_type" === "purchase" && $"user_id" === 7L).count()
    assert(got === want)
  }

  test("describeParquet probes rows/columns without full scan (S7)") {
    val info = Tables.describeParquet(spark,
      "/root/testdata/sf0.001/events.parquet")
    assert(info.numRows === 1000 && info.numColumns === 6)
    assert(info.columns.contains("event_id"))
  }
}
