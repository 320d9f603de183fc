package graft.store

import graft.SparkSpec
import graft.ops.EngineOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partitioned-table surface (SURVEY §2.12 range-partition DDL +
  * §4 partition pruning): writes partitioned by a date column must be
  * pruned by Catalyst when filtered — the replacement for the
  * reference's Postgres RANGE partitions + attach/detach.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy write + filtered read prunes partitions in the plan") {
    val loc = Files.createTempDirectory("pp").toString
    val wh = new Warehouse(spark, loc)
    val df = (1 to 1000).map { i =>
      (i.toLong, f"2024-01-${i % 10 + 1}%02d", i * 1.0)
    }.toDF("id", "day", "v")
    wh.overwrite("events_p", df, partitionBy = Seq("day"))
    wh.writeMeta("events_p", Seq("day"), Seq("id"))

    val filtered = wh.read("events_p").filter($"day" === "2024-01-03")
    val plan = EngineOps.explain(filtered, "formatted")
    assert(plan.contains("PartitionFilters:"), plan)
    assert(raw"PartitionFilters: \[[^\]]".r.findFirstIn(plan).isDefined,
      "partition filter not pushed:\n" + plan)
    assert(filtered.count() === 100)

    // drop-partition analogue: delete the partition dir
    val target = new java.io.File(s"$loc/events_p/day=2024-01-03")
    assert(target.exists())
    target.listFiles().foreach(_.delete()); target.delete()
    assert(wh.read("events_p").filter($"day" === "2024-01-03").count() === 0)
  }

  test("appends respect recorded partitioning") {
    val wh = new Warehouse(spark, Files.createTempDirectory("pp2").toString)
    val df = Seq((1L, "a", 1.0)).toDF("id", "g", "v")
    wh.overwrite("t", df, partitionBy = Seq("g"))
    wh.writeMeta("t", Seq("g"), Nil)
    wh.append("t", Seq((2L, "b", 2.0)).toDF("id", "g", "v"))
    val files = wh.read("t").inputFiles
    assert(files.exists(_.contains("g=a")) && files.exists(_.contains("g=b")))
    assert(wh.read("t").count() === 2)
  }
}
