package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out join strategies (SURVEY §4 / the 100 TB posture):
  * bucketed co-located joins (no shuffle at query time) and salted
  * joins for skewed keys.
  */
object ScaleJoins {

  /** Write a table bucketed by join keys — repeated joins on those
    * keys then read both sides pre-partitioned and skip the exchange
    * entirely (the bucketing trade: one shuffle at write time buys
    * zero shuffles on every subsequent join).
    */
  def saveBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys. With matching
    * bucket counts Catalyst plans a SortMergeJoin with NO Exchange on
    * either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)

  /** Salted equi-join for skewed keys: the big (skewed) side gets a
    * random salt in [0, saltFactor); the small side is exploded across
    * every salt value. The hot key's rows spread over `saltFactor`
    * reducers instead of one straggler. (AQE skew-join handles most
    * cases adaptively; explicit salting is for the pathological keys
    * AQE can't split, e.g. a single key larger than an executor.)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // The small side is replicated saltFactor times, so any join type
    // that emits UNMATCHED small-side rows (right/full outer) would
    // duplicate them once per salt — silently wrong results. Left
    // variants only ever emit small-side rows on a match.
    val allowed = Set("inner", "cross", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "leftanti", "left_anti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left join types only, got '$joinType' " +
        "(right/full outer would duplicate unmatched small-side rows " +
        s"$saltFactor times)")
    val saltedBig = big.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType).drop("__salt")
  }
}
