package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed selection (k-th smallest) by iterative histogram
  * refinement — the scale path for exact order statistics that
  * Spark's `percentile` aggregate does not have: `percentile`
  * materializes every value of the group in executor memory, and a
  * global sort ships the whole column through one range exchange. This
  * runs O(log_B(spread)) full aggregation passes (each a
  * map-side-combined histogram of B buckets), narrowing the candidate
  * set geometrically, and finishes with one bounded collect — at any
  * data size the driver sees B counters per pass plus a bounded
  * terminal set.
  *
  * Exactness under floating point: bucket membership is defined by
  * the SAME clamped floor expression that counts it — each refinement
  * appends that expression as a filter, so a row near a bucket edge
  * can never be counted into one bucket and then filtered into
  * another. Width shrinks ≥ B× per pass, so after ~7 passes (B = 256)
  * the interval is ulp-narrow; heavy duplicates then collapse to a
  * handful of DISTINCT values, resolved exactly from value-grouped
  * counts however many rows carry them.
  */
object Selection {

  /** The k-th smallest (1-based) value of non-null double column `c`.
    * `finishRows` bounds the terminal raw collect.
    */
  def kthSmallest(df: DataFrame, c: String, k: Long, buckets: Int = 256,
      finishRows: Int = 8192): Double = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val vals = df.select(col(c).cast("double").as("v")).na.drop()
    val head = vals.agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
      max(col("v")).as("hi")).head()
    val n = head.getLong(0)
    require(k <= n, s"k=$k beyond row count $n")
    var lo = head.getDouble(1)
    var hi = head.getDouble(2)
    var cur = vals
    var rank = k // target rank within cur
    var inRange = n
    var guard = 0
    def bucketOf(lo0: Double, w0: Double): Column =
      greatest(lit(0), least(lit(buckets - 1),
        floor((col("v") - lo0) / w0).cast("int")))
    while (lo < hi && inRange > finishRows && guard < 64 &&
        (hi - lo) / buckets > 0.0) {
      guard += 1
      val w = (hi - lo) / buckets
      val bcol = bucketOf(lo, w)
      val hist = cur.groupBy(bcol.as("b")).agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      var cum = 0L
      var b = 0
      while (b < buckets && cum + hist.getOrElse(b, 0L) < rank) {
        cum += hist.getOrElse(b, 0L)
        b += 1
      }
      rank -= cum
      inRange = hist.getOrElse(b, 0L)
      cur = cur.filter(bcol === b)
      // nominal bounds only steer the next pass's width — membership
      // stays with the counted floor expression above
      lo = if (b == 0) lo else lo + b * w
      hi = if (b == buckets - 1) hi else math.min(hi, lo + w)
    }
    if (inRange <= finishRows) {
      val tail = cur.orderBy("v").limit(finishRows)
        .collect().map(_.getDouble(0))
      tail((rank - 1).toInt)
    } else {
      // ulp-narrow interval with heavy duplicates: distinct values in
      // range are few even when row counts are huge
      val grouped = cur.groupBy("v").agg(count(lit(1)).as("cnt"))
        .orderBy("v").collect()
        .map(r => r.getDouble(0) -> r.getLong(1))
      var cum = 0L
      grouped.collectFirst {
        case (v, cnt) if { cum += cnt; cum >= rank } => v
      }.get
    }
  }
}
