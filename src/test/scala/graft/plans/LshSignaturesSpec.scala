package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Pins `lsh_signatures` bit-for-bit against the composed-builtin
  * form it replaces inside [[graft.sim.Similarity.lshTopK]]: the same
  * (table, bucket) pairs per row — chained-xxhash64 plane components,
  * left-to-right double folds, sign bits — including the null-vector
  * / null-element / empty-vector rows (all-zero buckets, never null).
  */
class LshSignaturesSpec extends SparkSpec {
  import spark.implicits._

  private def composed(df: DataFrame, vecCol: String, nPlanes: Int,
      nTables: Int) = {
    val sigs = array((0 until nTables).map(t =>
      struct(lit(t).as("t"),
        graft.sim.Similarity.lshSignature(col(vecCol), nPlanes, t)
          .as("b"))): _*)
    df.select(col("id"), explode(sigs).as("tb"))
      .select(col("id"), col("tb.t"), col("tb.b"))
      .as[(Long, Int, Long)].collect().toSet
  }

  private def kernel(df: DataFrame, vecCol: String, nPlanes: Int,
      nTables: Int) =
    df.select(col("id"), explode(ColumnBridge.column(LshSignatures(
        ColumnBridge.expression(col(vecCol)), nPlanes, nTables))).as("tb"))
      .select(col("id"), col("tb.t"), col("tb.b"))
      .as[(Long, Int, Long)].collect().toSet

  test("matches the composed form on random float vectors") {
    val rnd = new scala.util.Random(5)
    val df = (0L until 400L).map(i =>
        (i, Array.fill(16)((rnd.nextFloat() * 2 - 1) * 3)))
      .toDF("id", "vec").repartition(5)
    val (c, k) = (composed(df, "vec", 4, 32), kernel(df, "vec", 4, 32))
    assert(c == k, s"${c diff k} vs ${k diff c}")
  }

  test("matches on double vectors, odd plane/table counts") {
    val rnd = new scala.util.Random(17)
    val df = (0L until 150L).map(i =>
        (i, Array.fill(7)(rnd.nextDouble() * 10 - 5)))
      .toDF("id", "vec")
    val (c, k) = (composed(df, "vec", 6, 5), kernel(df, "vec", 6, 5))
    assert(c == k, s"${c diff k} vs ${k diff c}")
  }

  test("null vector, null element, empty and zero vectors band to bucket 0") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array(cast(0.5 as double), cast(null as double), cast(2.0 as double))),
        |  (2L, cast(null as array<double>)),
        |  (3L, array(cast(0.0 as double), cast(0.0 as double))),
        |  (4L, cast(array() as array<double>)),
        |  (5L, array(cast(1.5 as double), cast(-0.5 as double)))
        |AS t(id, vec)""".stripMargin)
    val (c, k) = (composed(df, "vec", 4, 3), kernel(df, "vec", 4, 3))
    assert(c == k, s"${c diff k} vs ${k diff c}")
    // degenerate rows still band (bucket 0 per table), never vanish
    Seq(1L, 2L, 4L).foreach { id =>
      assert(k.count(_._1 == id) == 3, s"row $id must band on 3 tables")
      assert(k.filter(_._1 == id).forall(_._3 == 0L),
        s"row $id must carry all-zero buckets")
    }
  }

  test("codegen path (no fallback) agrees with interpreted eval") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rnd = new scala.util.Random(29)
      val df = (0L until 100L).map(i =>
          (i, Array.fill(8)(rnd.nextFloat() - 0.5f)))
        .toDF("id", "vec")
      val (c, k) = (composed(df, "vec", 4, 8), kernel(df, "vec", 4, 8))
      assert(c == k, s"${c diff k} vs ${k diff c}")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
