package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsQuerySpec extends SparkSpec {
  import spark.implicits._

  private val rows =
    Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c")

  test("cms_query reads back exact counts when the sketch is wide enough") {
    // eps 0.01 → width 200 ≫ 3 distinct keys: collisions impossible to
    // matter, so any estimate ≠ truth means the probe hashed into the
    // wrong cells (builder/probe representation drift)
    val sk = rows.toDF("k")
      .agg(Cms.sketch($"k", 0.01, 0.99, 7).as("cms"))
    val got = sk.select(
      Cms.query($"cms", lit("a")).as("a"),
      Cms.query($"cms", lit("b")).as("b"),
      Cms.query($"cms", lit("c")).as("c"),
      Cms.query($"cms", lit("zzz")).as("absent"))
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((5L, 3L, 1L, 0L)))
  }

  test("sketch merges across partitions without changing estimates") {
    val sk = rows.toDF("k").repartition(8)
      .agg(Cms.sketch($"k", 0.01, 0.99, 7).as("cms"))
    val got = sk.select(Cms.query($"cms", lit("a")),
        Cms.query($"cms", lit("b")))
      .as[(Long, Long)].head()
    assert(got === ((5L, 3L)))
  }

  test("bigint keys probe via the addLong path") {
    val sk = Seq(10L, 10L, 10L, 77L).toDF("k")
      .agg(Cms.sketch($"k", 0.01, 0.99, 7).as("cms"))
    val got = sk.select(
      Cms.query($"cms", lit(10L)), Cms.query($"cms", lit(77L)),
      Cms.query($"cms", lit(999L)))
      .as[(Long, Long, Long)].head()
    assert(got === ((3L, 1L, 0L)))
  }

  test("SQL surface: cms_query registered by GraftExtensions") {
    rows.toDF("k").createOrReplaceTempView("cms_in")
    val got = spark.sql(
      """SELECT cms_query(cms, 'a') AS a FROM
        |  (SELECT count_min_sketch(k, 0.01d, 0.99d, 7) AS cms FROM cms_in)
        |""".stripMargin).as[Long].head()
    assert(got === 5L)
  }

  test("null sketch or key yields null") {
    val sk = rows.toDF("k").agg(Cms.sketch($"k", 0.01, 0.99, 7).as("cms"))
    val r = sk.select(
      Cms.query(lit(null).cast("binary"), lit("a")).as("ns"),
      Cms.query($"cms", lit(null).cast("string")).as("nk")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
