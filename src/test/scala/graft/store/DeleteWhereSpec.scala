package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.sql.Timestamp

class DeleteWhereSpec extends SparkSpec {
  import spark.implicits._

  test("unpartitioned delete: matching rows gone, count returned, zero-match no-op") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_dw").toString)
    wh.createTable("t", Seq((1L, "a")).toDF("id", "v").schema)
    wh.append("t", (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(wh.deleteWhere("t", col("id") % 2 === 0) === 5L)
    assert(wh.read("t").select("id").as[Long].collect().sorted
      === Array(1L, 3L, 5L, 7L, 9L))
    assert(wh.deleteWhere("t", col("id") === 999) === 0L)
    assert(wh.read("t").count() === 5)
  }

  test("NULL predicate rows survive: a targeted erase never takes unknown rows") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_dw3").toString)
    wh.createTable("t",
      Seq((1L, Option(1.0))).toDF("id", "v").schema)
    wh.append("t", Seq((1L, Some(2.0)), (2L, None), (3L, Some(2.0)),
      (4L, None)).toDF("id", "v"))
    // v === 2.0 is NULL for rows 2 and 4 — SQL DELETE keeps them
    assert(wh.deleteWhere("t", col("v") === 2.0) === 2L)
    assert(wh.read("t").select("id").as[Long].collect().sorted
      === Array(2L, 4L))
  }

  test("fully-deleted partition with special-char value is physically removed") {
    val dir = Files.createTempDirectory("graft_dw4").toString
    val wh = new Warehouse(spark, dir)
    wh.createTable("t", Seq((1L, "a")).toDF("id", "cat").schema,
      partitionBy = Seq("cat"))
    // values Spark escapes in partition dir names: space, '=', '%', ':'
    wh.append("t", Seq((1L, "a b=c%2"), (2L, "a b=c%2"), (3L, "plain"))
      .toDF("id", "cat"))
    assert(wh.deleteWhere("t", col("cat") === "a b=c%2") === 2L)
    assert(wh.read("t").select("id").as[Long].collect() === Array(3L))
    // the escaped dir itself must be gone — not just unreadable —
    // and exactly the untouched partition survives
    val dirs = Option(new java.io.File(s"$dir/t").listFiles())
      .map(_.filter(_.isDirectory).map(_.getName).toSeq).getOrElse(Nil)
    assert(dirs === Seq("cat=plain"),
      s"expected only the untouched partition dir, got: $dirs")
  }

  test("timestamp partition column: full-partition erase renders the dir Spark-style") {
    // java.sql.Timestamp.toString appends '.0' ('2024-01-01 10:00:00.0')
    // while the writer renders via Cast ('2024-01-01 10:00:00') — the
    // erase path must use the writer's rendering or it either fails
    // loudly (post-guard) or leaves the dir live (pre-guard)
    val dir = Files.createTempDirectory("graft_dw5").toString
    val wh = new Warehouse(spark, dir)
    wh.createTable("t",
      Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"))).toDF("id", "ts")
        .schema,
      partitionBy = Seq("ts"))
    wh.append("t", Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (3L, Timestamp.valueOf("2024-01-02 12:30:00"))).toDF("id", "ts"))
    assert(wh.deleteWhere("t",
      col("ts") === Timestamp.valueOf("2024-01-01 10:00:00")) === 2L)
    assert(wh.read("t").select("id").as[Long].collect() === Array(3L))
    val dirs = Option(new java.io.File(s"$dir/t").listFiles())
      .map(_.filter(_.isDirectory).map(_.getName).toSeq).getOrElse(Nil)
    assert(dirs.size === 1 && !dirs.head.contains("10%3A00"),
      s"fully-deleted timestamp partition dir survived: $dirs")
  }

  test("partitioned delete rewrites only affected days; fully-deleted day vanishes") {
    val dir = Files.createTempDirectory("graft_dw2").toString
    val wh = new Warehouse(spark, dir)
    def partFiles(date: String): Seq[String] = {
      val d = new java.io.File(s"$dir/t/p_date=$date")
      Option(d.listFiles()).map(_.map(_.getName)
        .filter(_.endsWith(".parquet")).sorted.toSeq).getOrElse(Nil)
    }
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("ts", TimestampType), StructField("v", DoubleType)))
    wh.createTable("t", schema, uniqueKeys = Seq("id"),
      partitionSource = Some("ts"))
    wh.append("t", Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (2L, Timestamp.valueOf("2024-01-01 11:00:00"), 2.0),
      (3L, Timestamp.valueOf("2024-01-02 10:00:00"), 3.0),
      (4L, Timestamp.valueOf("2024-01-03 10:00:00"), 4.0))
      .toDF("id", "ts", "v"))
    val untouched = partFiles("2024-01-03")
    assert(untouched.nonEmpty)
    // id=1 (partial day 1), id=3 (ALL of day 2)
    assert(wh.deleteWhere("t", col("id").isin(1L, 3L)) === 2L)
    assert(wh.read("t").select("id").as[Long].collect().sorted
      === Array(2L, 4L))
    // day 3 untouched byte-for-byte; day 1 rewritten; day 2 gone entirely
    assert(partFiles("2024-01-03") === untouched)
    assert(partFiles("2024-01-02").isEmpty)
    assert(!new java.io.File(s"$dir/t/p_date=2024-01-02").exists())
    // table remains readable and mergeable afterwards
    assert(wh.vacuum().isEmpty)
  }
}
