package graft.transform

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.plans.{ChunkBoundsKernel, RangeChunkId}

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
  * compiles them into [[graft.plans.RangeChunkId]], a pure
  * deterministic projection that BINARY-SEARCHES the sorted bounds:
  * `chunk = #bounds strictly below the row's sort tuple`, O(log P)
  * tuple comparisons per row (the round-10 form summed P−1
  * comparison chains per row — O(P), measured 3.3× the bare window
  * cost at 10× scale). Every evaluation of the resulting column, in
  * any branch, on any retry, yields the identical id, so nothing
  * needs pinning: no exchange, no checkpoint, lineage intact. Bound
  * quality only affects BALANCE, never correctness — splitting a
  * totally ordered sequence never changes who precedes whom (the
  * [[ChunkedWindows]] exactness argument).
  *
  * Ordering semantics match Spark's ascending sort: nulls first, NaN
  * last, `-0.0 == 0.0`, struct-lexicographic across the column list.
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

  /** The chunk-id expression for pre-sampled bounds: a
    * [[graft.plans.RangeChunkId]] binary search over the sorted bound
    * tuples. Pure projection, O(log P) per row, no exchange.
    */
  def chunkIdExpr(cols: Seq[Column], bounds: Seq[Row]): Column =
    if (bounds.isEmpty) lit(0)
    else ColumnBridge.column(
      RangeChunkId(cols.map(ColumnBridge.expression), bounds))

  /** One sampling pass over the projected sort columns: per-partition
    * reservoirs of `perPart` rows plus the partition's true row
    * count — the RangePartitioner sketch, over Rows. Collects
    * O(partitions × perPart) rows of just the sort columns.
    */
  def sampleSketch(df: DataFrame, sortCols: Seq[String],
      seed: Long, perPart: Int = 200): Array[(Long, Array[Row])] = {
    val proj = df.select(sortCols.map(col): _*)
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
  }

  /** Up to p−1 strictly-increasing bound tuples from a
    * [[sampleSketch]]: reservoir rows weighted by partition size,
    * merged into weighted quantiles on the driver.
    */
  def boundsFromSketch(sketch: Array[(Long, Array[Row])],
      p: Int): Seq[Row] = {
    if (p <= 1) return Nil
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

  /** [[sampleSketch]] + [[boundsFromSketch]] in one call — the
    * single driver job behind [[withChunkId]].
    */
  def sampleBounds(df: DataFrame, sortCols: Seq[String], p: Int,
      seed: Long): Seq[Row] =
    if (p <= 1) Nil
    else boundsFromSketch(sampleSketch(df, sortCols, seed), p)

  /** Driver-side row ordering matching Spark ascending sort — the
    * same null-first / NaN-last / `-0.0 == 0.0` comparison
    * [[graft.plans.ChunkBoundsKernel]] applies per row, so the bound
    * dedup here and the binary search there agree exactly.
    */
  private val rowOrdering: Ordering[Row] = new Ordering[Row] {
    def compare(x: Row, y: Row): Int = {
      var i = 0
      while (i < x.length) {
        val c = ChunkBoundsKernel.cmpAny(x.get(i), y.get(i))
        if (c != 0) return c
        i += 1
      }
      0
    }
  }
}
