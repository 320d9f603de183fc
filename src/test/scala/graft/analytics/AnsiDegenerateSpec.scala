package graft.analytics

import graft.SparkSpec

/** Degenerate-input posture for the positional `element_at` readers
  * (the engine runs under ANSI mode, pinned in
  * [[graft.core.SparkEnv]], where an out-of-bounds positional read or
  * a missing map key THROWS): the catalog queries that read order
  * statistics / probed sketch entries / map keys by position must use
  * the `try_` variants so a corpus where the position does not exist
  * — a group with fewer sampled rows than the statistic's rank, a
  * sketch without the probed key, a user without the counted event
  * type — yields nulls/zeros, never a job kill. Each test runs the
  * REAL catalog query over a degenerate table.
  */
class AnsiDegenerateSpec extends SparkSpec {
  import spark.implicits._

  private def writeTable(dir: java.nio.file.Path, name: String,
      df: org.apache.spark.sql.DataFrame): Unit =
    df.coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve(name + ".parquet").toString)

  test("q_quantile_sample: a group with <48 rows reads null statistics") {
    val dir = java.nio.file.Files.createTempDirectory("ansi_degen_qs")
    // 5 lineitem rows in one group: the bottom-k sample holds 5
    // values, so positions 16/32/48 do not exist
    writeTable(dir, "lineitem", (1 to 5).map(i =>
        (i.toLong, i, 100.0 + i, "X")).toDF(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag"))
    val r = AggregateQueries.qQuantileSample
      .run(spark, dir.toString).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[String]("l_returnflag") === "X")
    assert(row.isNullAt(row.fieldIndex("p25")))
    assert(row.isNullAt(row.fieldIndex("p50")))
    assert(row.isNullAt(row.fieldIndex("p75")))
    assert(row.getAs[Int]("k") === 5)
  }

  test("q_heavy_hitters: a corpus without the probed key flags, no kill") {
    val dir = java.nio.file.Files.createTempDirectory("ansi_degen_hh")
    // all-odd orderkeys: the 'hot' key never occurs, the sketch's
    // filtered probe is an empty array
    writeTable(dir, "lineitem",
      Seq(1L, 3L, 5L, 7L).map(k => (k, 1, 1.0, "A")).toDF(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag"))
    val r = AggregateQueries.qHeavyHitters
      .run(spark, dir.toString).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("exact_hot") === 0L)
    assert(!row.getAs[Boolean]("in_summary"))
    // the bound columns read from the absent entry: null, not thrown
    assert(row.isNullAt(row.fieldIndex("upper_ok")))
    assert(row.isNullAt(row.fieldIndex("lower_ok")))
  }

  test("q_map_funcs: users without the counted event types count 0") {
    val dir = java.nio.file.Files.createTempDirectory("ansi_degen_mf")
    // only 'view' events: neither probed map key exists for any user
    writeTable(dir, "events",
      Seq((1L, 1L, "view"), (2L, 1L, "view"), (3L, 2L, "view"))
        .toDF("event_id", "user_id", "event_type"))
    val r = EventQueries.qMapFuncs.run(spark, dir.toString).collect()
    assert(r.length === 2)
    assert(r.forall(_.getAs[Long]("n_purchase") === 0L))
    assert(r.forall(_.getAs[Long]("n_click") === 0L))
    assert(r.forall(_.getAs[String]("types") === "view"))
  }
}
