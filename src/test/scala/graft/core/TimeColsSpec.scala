package graft.core

import graft.SparkSpec
import graft.core.TimeCols.epochUs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import java.nio.file.Files

/** The NTZ-tolerance contract behind the round-5 testdata regression:
  * `epochUs` must accept BOTH timestamp flavors and agree with
  * `unix_micros` on the UTC session, and `Tables.readParquet` must
  * normalize naive-µs parquet annotations to `TimestampType`.
  */
class TimeColsSpec extends SparkSpec {
  import spark.implicits._

  test("epochUs on TimestampType ≡ unix_micros") {
    val df = Seq("2024-03-01 12:34:56.789012").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val (a, b) = df.select(epochUs($"ts"), unix_micros($"ts"))
      .as[(Long, Long)].head()
    assert(a === b)
  }

  test("epochUs accepts TIMESTAMP_NTZ and reads it as UTC wall-clock") {
    val df = Seq("2024-03-01 12:34:56.789012").toDF("s")
      .select(to_timestamp_ntz($"s").as("ts"))
    assert(df.schema.head.dataType === TimestampNTZType)
    // unix_micros($"ts") directly would throw DATATYPE_MISMATCH here
    val got = df.select(epochUs($"ts")).as[Long].head()
    val want = Seq("2024-03-01 12:34:56.789012").toDF("s")
      .select(unix_micros(to_timestamp($"s"))).as[Long].head()
    assert(got === want)
  }

  test("readParquet normalizes an NTZ-annotated file to TimestampType") {
    val dir = Files.createTempDirectory("ntz").toString + "/t.parquet"
    // TIMESTAMP_NTZ columns write with isAdjustedToUTC=false — the
    // same annotation the regenerated driver testdata carries
    Seq(("2024-03-01 12:34:56.789012", 1L)).toDF("s", "id")
      .select(to_timestamp_ntz($"s").as("ts"), $"id")
      .write.parquet(dir)
    val back = graft.io.Tables.readParquet(spark, dir)
    assert(back.schema("ts").dataType === TimestampType)
    val us = back.select(epochUs($"ts")).as[Long].head()
    val want = Seq("2024-03-01 12:34:56.789012").toDF("s")
      .select(unix_micros(to_timestamp($"s"))).as[Long].head()
    assert(us === want)
  }
}
