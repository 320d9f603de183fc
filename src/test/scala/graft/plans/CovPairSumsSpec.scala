package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Pins `cov_pair_sums` bit-for-bit against the pair-explode
  * formulation it replaces inside
  * [[graft.sim.Similarity.covarianceMatrix]]: identical (i, j) group
  * sets, identical decimal sums (hence identical double casts),
  * identical null semantics — per cell, over random, mixed-width,
  * null-bearing and empty inputs, at any partitioning.
  */
class CovPairSumsSpec extends SparkSpec {
  import spark.implicits._

  private def aggForm(df: DataFrame, vecCol: String) =
    df.agg(ColumnBridge.column(CovPairSums(
        ColumnBridge.expression(col(vecCol)))).as("__cells"))
      .select(explode(col("__cells")).as("__c"))
      .select(col("__c.i").as("i"), col("__c.j").as("j"),
        col("__c.sxy").cast("double").as("sxy"))
      .as[(Int, Int, Option[Double])].collect().toSet

  private def explodeForm(df: DataFrame, vecCol: String) =
    df.select(col(vecCol).as("__v"))
      .select(col("__v"), posexplode(col("__v")).as(Seq("__p", "__xf")))
      .select((col("__p") + 1).as("i"), col("__xf").cast("double").as("x"),
        posexplode(slice(col("__v"), col("__p") + 1,
          size(col("__v")) - col("__p"))).as(Seq("__q", "__yf")))
      .select(col("i"), (col("i") + col("__q")).as("j"),
        (col("x") * col("__yf").cast("double")).as("xy"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("xy").cast("decimal(30,12)")).cast("double").as("sxy"))
      .as[(Int, Int, Option[Double])].collect().toSet

  test("matches the pair-explode sums on random float vectors") {
    val rnd = new scala.util.Random(11)
    val df = (0L until 300L).map(i =>
        (i, Array.fill(12)((rnd.nextFloat() * 2 - 1) * 3)))
      .toDF("vec_id", "embedding").repartition(5)
    assert(aggForm(df, "embedding") == explodeForm(df, "embedding"))
  }

  test("matches on double vectors of mixed widths") {
    val rnd = new scala.util.Random(23)
    val df = (0L until 100L).map(i =>
        (i, Array.fill(4 + (i % 7).toInt)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding").repartition(3)
    val (a, e) = (aggForm(df, "embedding"), explodeForm(df, "embedding"))
    assert(a == e, s"${a diff e} vs ${e diff a}")
  }

  test("null elements, empty and null vectors, all-null cells") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(cast(1.5 as double), cast(null as double), cast(-0.25 as double))),
        |  (array(cast(null as double), cast(null as double))),
        |  (array(cast(0.5 as double))),
        |  (cast(null as array<double>)),
        |  (array(cast(0.0 as double), cast(2.0 as double), cast(null as double), cast(1.0 as double)))
        |AS t(embedding)""".stripMargin)
    val (a, e) = (aggForm(df, "embedding"), explodeForm(df, "embedding"))
    assert(a == e, s"${a diff e} vs ${e diff a}")
    // cell (2,2) gets terms only from null-bearing rows → null sum
    assert(a.exists { case (i, j, s) => i == 2 && j == 3 && s.isEmpty })
  }

  test("empty input emits no cells") {
    val df = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    assert(aggForm(df, "embedding").isEmpty)
  }

  test("covarianceMatrix end-to-end unchanged by the aggregate arm") {
    val rnd = new scala.util.Random(31)
    val df = (0L until 200L).map(i =>
        (i, Array.fill(10)((rnd.nextFloat() * 2 - 1))))
      .toDF("vec_id", "embedding")
    val got = graft.sim.Similarity
      .covarianceMatrix(df, "vec_id", "embedding")
      .select(col("i"), col("j"), col("cov"))
      .as[(Int, Int, Double)].collect().toSet
    // reference: means from the same plan, pair sums from the explode
    // form — the pre-round-15 formulation
    val n = df.count().toDouble
    val m = df.select(posexplode(col("embedding")).as(Seq("__p", "__xf")))
      .select((col("__p") + 1).as("i"), col("__xf").cast("double").as("x"))
      .groupBy("i")
      .agg(sum(col("x").cast("decimal(25,10)")).cast("double").as("sx"))
      .as[(Int, Double)].collect().toMap
    val expect = explodeForm(df, "embedding").map { case (i, j, s) =>
      (i, j, s.get / n - (m(i) / n) * (m(j) / n))
    }
    assert(got == expect, s"${got diff expect} vs ${expect diff got}")
  }
}
