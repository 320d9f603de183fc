package graft.transform

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Deterministic range-chunk ids WITHOUT materializing the corpus.
  *
  * The chunked-window family (lag / prefix-sum / row-number over
  * range-balanced chunks, [[ChunkedWindows]] and
  * [[graft.text.SequencePacking.balancedShards]]) needs every branch
  * of a plan to agree on which chunk a row belongs to. The round-9
  * form pinned `spark_partition_id()` after `repartitionByRange` with
  * an eager `localCheckpoint` — correct, but it copies the ENTIRE
  * input into executor block storage per call (a full fact-table copy
  * per time-series query at 100 TB) and truncates lineage, so one
  * lost executor fails the job instead of recomputing.
  *
  * This helper instead does what `repartitionByRange` does
  * internally — ONE small sampling job over just the sort columns
  * (weighted per-partition reservoirs, the RangePartitioner sketch
  * shape) — then picks the P−1 range bounds on the driver and
  * compiles them into a pure, deterministic lexicographic-comparison
  * expression: `chunk = #bounds strictly below the row's sort tuple`.
  * Every evaluation of the resulting column, in any branch, on any
  * retry, yields the identical id, so nothing needs pinning: no
  * exchange, no checkpoint, lineage intact. Bound quality only
  * affects BALANCE, never correctness — splitting a totally ordered
  * sequence never changes who precedes whom (the [[ChunkedWindows]]
  * exactness argument).
  *
  * Ordering semantics match Spark's ascending sort: nulls first, NaN
  * last, struct-lexicographic across the column list.
  */
object RangeChunks {

  /** `df` + integer column `dst` in [0, p): the row's range chunk
    * under bounds sampled once from `df.select(sortCols)`. Chunk ids
    * are non-decreasing in the lexicographic order of `sortCols`, and
    * rows with equal sort tuples always share a chunk. Triggers one
    * driver job (the bound sketch) at call time.
    */
  def withChunkId(df: DataFrame, sortCols: Seq[String], p: Int,
      dst: String, seed: Long = 0x5eedL): DataFrame = {
    require(p >= 1, s"chunk count must be >= 1, got $p")
    val bounds = sampleBounds(df, sortCols, p, seed)
    df.withColumn(dst, chunkIdExpr(sortCols.map(col), bounds))
  }

  /** The chunk-id expression for pre-sampled bounds: count of bound
    * tuples strictly below the row's tuple. Pure projection — p−1
    * codegen'd comparison chains, no exchange.
    */
  def chunkIdExpr(cols: Seq[Column], bounds: Seq[Row]): Column =
    if (bounds.isEmpty) lit(0)
    else bounds.map(b => when(tupleGt(cols, b), 1).otherwise(0))
      .reduce(_ + _)

  /** Lexicographic `cols > bound`, null-first / NaN-last per Spark's
    * ascending sort. A row with a null where the bound is non-null is
    * NOT greater (nulls sort first); a non-null row beats a null
    * bound value.
    */
  private def tupleGt(cols: Seq[Column], bound: Row): Column = {
    def gtCol(c: Column, v: Any): Column =
      if (v == null) c.isNotNull else c > lit(v)
    def eqCol(c: Column, v: Any): Column =
      if (v == null) c.isNull else c <=> lit(v)
    cols.indices.map { i =>
      (0 until i).map(j => eqCol(cols(j), bound.get(j)))
        .foldLeft(gtCol(cols(i), bound.get(i)))(_ && _)
    }.reduce(_ || _)
  }

  /** Up to p−1 strictly-increasing bound tuples from one pass over
    * the projected sort columns: per-partition reservoirs (200 rows)
    * weighted by partition size, merged into weighted quantiles on
    * the driver — the RangePartitioner sketch, over Rows. Collects
    * O(partitions × 200) rows of just the sort columns.
    */
  def sampleBounds(df: DataFrame, sortCols: Seq[String], p: Int,
      seed: Long): Seq[Row] = {
    if (p <= 1) return Nil
    val perPart = 200
    val proj = df.select(sortCols.map(col): _*)
    val sketch: Array[(Long, Array[Row])] =
      proj.rdd.mapPartitionsWithIndex { (idx, it) =>
        val rng = new java.util.Random(seed ^ (idx * 0x9E3779B97F4A7C15L))
        val buf = new Array[Row](perPart)
        var n = 0L
        while (it.hasNext) {
          val r = it.next()
          if (n < perPart) buf(n.toInt) = r
          else {
            val j = (rng.nextDouble() * (n + 1)).toLong
            if (j < perPart) buf(j.toInt) = r
          }
          n += 1
        }
        Iterator.single((n, buf.take(math.min(n, perPart.toLong).toInt)))
      }.collect()
    val weighted = sketch.flatMap { case (n, rows) =>
      if (rows.isEmpty) Array.empty[(Row, Double)]
      else rows.map(r => (r, n.toDouble / rows.length))
    }
    if (weighted.isEmpty) return Nil
    val ord = rowOrdering
    val sorted = weighted.sortWith((a, b) => ord.compare(a._1, b._1) < 0)
    val total = weighted.iterator.map(_._2).sum
    val step = total / p
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var cum = 0.0
    var target = step
    for ((r, w) <- sorted if out.size < p - 1) {
      cum += w
      if (cum >= target) {
        if (out.isEmpty || ord.compare(out.last, r) != 0) out += r
        while (target <= cum) target += step
      }
    }
    out.toSeq
  }

  /** Driver-side row ordering matching Spark ascending sort: nulls
    * first; `Comparable` otherwise (Double/Float compareTo puts NaN
    * last, like Spark).
    */
  private val rowOrdering: Ordering[Row] = new Ordering[Row] {
    def compare(x: Row, y: Row): Int = {
      var i = 0
      while (i < x.length) {
        val c = cmpAny(x.get(i), y.get(i))
        if (c != 0) return c
        i += 1
      }
      0
    }
  }

  private def cmpAny(a: Any, b: Any): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else a match {
      case x: java.lang.Comparable[_] =>
        x.asInstanceOf[java.lang.Comparable[Any]].compareTo(b)
      case _ => throw new IllegalArgumentException(
        s"range-chunk sort column holds non-orderable value " +
          s"class ${a.getClass.getName}; use atomic orderable columns")
    }
}
