package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pareto skyline (Börzsönyi et al., ICDE'01): the points no other
  * point dominates — here the 2-D minimize-x / maximize-y form (e.g.
  * cheapest price vs largest size). The naive formulation is a
  * quadratic NOT EXISTS self-join; the engine's shape is the
  * grid-pruned two-phase one that survives scale:
  *
  *   1. one aggregation pass buckets x into a fixed-width grid and
  *      takes each bucket's max y (a ≤nBuckets-row table);
  *   2. the exclusive running max of those bucket maxima (window over
  *      the grid table, bounded by nBuckets, never by data) is
  *      broadcast back: any point whose y does not exceed the best y
  *      of a strictly-lower bucket is dominated by a strictly-cheaper
  *      point and is dropped in the scan — for continuous data this
  *      eliminates all but O(skyline + n/nBuckets) rows;
  *   3. the surviving candidate set (skyline points plus their
  *      in-bucket shadows) resolves exactly with a broadcast
  *      dominance anti-join — quadratic only on the pruned remnant.
  *
  * Dominance is the standard strict-somewhere rule: q dominates p iff
  * (q.x < p.x ∧ q.y ≥ p.y) ∨ (q.x ≤ p.x ∧ q.y > p.y); duplicate
  * (x, y) points never dominate each other, so skylines are computed
  * over the distinct point set.
  */
object Skyline {

  /** Skyline of distinct (`xCol`, `yCol`) points, minimizing x and
    * maximizing y. Output columns: (x, y) named after the inputs.
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
      nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val pts = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y")).na.drop().distinct()
    val bounds = pts.agg(min(col("x")).as("xmin"), max(col("x")).as("xmax"))
    val bucketed = pts.crossJoin(broadcast(bounds))
      .withColumn("__b",
        when(col("xmax") === col("xmin"), lit(0L))
          .otherwise(least(
            floor((col("x") - col("xmin")) / (col("xmax") - col("xmin"))
              * nBuckets).cast("long"), lit(nBuckets - 1L))))
      .drop("xmin", "xmax")
    // grid table: per-bucket best y, then the best y of any STRICTLY
    // lower bucket (exclusive running max over ≤ nBuckets rows)
    val gridW = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val grid = bucketed.groupBy(col("__b")).agg(max(col("y")).as("__bmax"))
      .withColumn("__lowbest", max(col("__bmax")).over(gridW))
      .select(col("__b"), col("__lowbest"))
    // a strictly-lower bucket implies strictly smaller x, so y <= that
    // bucket's best means strict dominance — safe to drop in the scan
    val cand = bucketed.join(broadcast(grid), Seq("__b"))
      .filter(col("__lowbest").isNull || col("y") > col("__lowbest"))
      .select(col("x"), col("y"))
    val q = cand.select(col("x").as("qx"), col("y").as("qy"))
    cand.join(broadcast(q),
        (col("qx") < col("x") && col("qy") >= col("y")) ||
          (col("qx") <= col("x") && col("qy") > col("y")),
        "left_anti")
      .select(col("x").as(xCol), col("y").as(yCol))
  }
}
