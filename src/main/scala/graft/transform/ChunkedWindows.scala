package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof adjacency windows: `lag(1)` over (key, order) computed
  * on RANGE-BALANCED chunks instead of one hash partition per key.
  *
  * `Window.partitionBy(key)` ships every row of a key to ONE task —
  * with a low-cardinality key (q_twa's five event types) that is a
  * five-way sort of the whole corpus on a 32-core box, and the 2M-row
  * per-task sorts breathe with spill/GC pressure (the round-8 sweep
  * measured q_twa swinging 9.6×–14× run to run at 100× for exactly
  * this reason; at 100 TB a single key would be one executor thread
  * sorting terabytes). Adjacency, however, never needed per-key
  * gathering: cut the corpus into range chunks over (key, order) so
  * each chunk holds a CONTIGUOUS ordered run, take the local lag
  * inside every chunk, and stitch the P×|keys| chunk boundaries with
  * one tiny window — the [[graft.text.SequencePacking.balancedShards]]
  * distributed-prefix-sum shape, applied to lag.
  *
  * Chunk ids come from [[RangeChunks.withChunkId]]: bounds sampled
  * ONCE (a small driver job over just the sort columns) and compiled
  * into a deterministic projection — every plan branch and every task
  * retry computes the identical id, so nothing is materialized. The
  * round-9 form pinned `spark_partition_id` with an eager
  * whole-corpus `localCheckpoint`; at 100 TB that was a full
  * fact-table copy into block storage per query and a lineage
  * truncation (one lost executor = failed job). Now: no checkpoint,
  * no extra exchange, lineage intact.
  *
  * Exactness: a key's rows occupy a contiguous chunk-id interval
  * (chunk ids are monotone in (key, order)), so "previous chunk (in
  * id order) that contains the key" IS the chunk holding the
  * predecessor row; any placement of the sampled range bounds yields
  * the identical lagged values because splitting a totally ordered
  * sequence never changes who precedes whom. Order columns must
  * totally order rows within a key (pass a unique tiebreaker);
  * lagged source columns may be null (first-row detection uses
  * row_number, not null-ness).
  */
object ChunkedWindows {

  private def chunkCount(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** `df` + one lagged column per (src → dst) in `lagCols`, equal to
    * `lag(src, 1) over (partition by keyCols order by orderCols)`.
    * One (chunk, key)-hashed window exchange over the corpus; the
    * only cross-chunk work is a P×|keys|-row boundary table built by
    * a map-side-combined `max_by` aggregation, rolled with a small
    * window and broadcast back.
    */
  def lag1(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      lagCols: Map[String, String]): DataFrame = {
    require(lagCols.nonEmpty, "no lag columns requested")
    val chunked = RangeChunks.withChunkId(df, keyCols ++ orderCols,
      chunkCount(df), "__pid")
    val w = Window.partitionBy(("__pid" +: keyCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
    // full-frame twin of `w`: per-group LAST values, computed in the
    // SAME sorted pass
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)

    // ONE windowed frame carries everything: the local lags, the
    // row_number, and each group's LAST source values (the value the
    // NEXT chunk of the same key needs). The boundary branch below is
    // a FILTER of this same frame, so its exchange is canonically
    // identical to the streamed side's and Spark's exchange reuse
    // serves both from one scan + one shuffle — the round-9 eager
    // checkpoint gave branch sharing by materialization; this gives
    // it by plan identity, with lineage intact.
    val withLocal = lagCols.keys.foldLeft(
        chunked.withColumn("__rn1", row_number().over(w))) {
      case (d, src) =>
        d.withColumn(s"__ll_$src", lag(col(src), 1).over(w))
          .withColumn(s"__last_$src", last(col(src)).over(wFull))
    }
    // P×|keys| rows after the filter — broadcastable; rolled with one
    // tiny per-key window into "previous chunk's last value"
    val bw = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__pid"))
    val bridge = withLocal.filter(col("__rn1") === 1)
      .select((keyCols :+ "__pid").map(col) ++ lagCols.keys.toSeq.map(s =>
        lag(col(s"__last_$s"), 1).over(bw).as(s"__br_$s")): _*)
    val joined = withLocal
      .drop(lagCols.keys.toSeq.map(s => s"__last_$s"): _*)
      .join(broadcast(bridge), keyCols :+ "__pid", "left")
    lagCols.foldLeft(joined) { case (d, (src, dst)) =>
      d.withColumn(dst,
        when(col("__rn1") === 1, col(s"__br_$src"))
          .otherwise(col(s"__ll_$src")))
    }.drop(("__pid" :: "__rn1" ::
      lagCols.keys.toList.flatMap(s => List(s"__br_$s", s"__ll_$s"))): _*)
  }

  /** Per-key GLOBAL row number without per-key gathering: local
    * row_number inside range-balanced chunks + per-(chunk, key) counts
    * rolled into exclusive offsets (a P×|keys|-row window) — the
    * [[graft.text.SequencePacking.balancedShards]] idiom, exposed.
    * `dst` is 1-based and equals `row_number() over (partition by
    * keyCols order by orderCols)` exactly (order columns must totally
    * order rows within a key).
    */
  def globalRowNumber(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], dst: String): DataFrame = {
    val chunked = RangeChunks.withChunkId(df, keyCols ++ orderCols,
      chunkCount(df), "__pid")
    val w = Window.partitionBy(("__pid" +: keyCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
    // per-group count rides the SAME sorted pass (full-frame twin of
    // `w`); the offsets branch filters this frame, so exchange reuse
    // serves both branches from one scan + one shuffle
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val local = chunked
      .withColumn("__lrn", row_number().over(w))
      .withColumn("__pc", count(lit(1)).over(wFull))
    val offW = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.filter(col("__lrn") === 1)
      .withColumn("__off", coalesce(sum(col("__pc")).over(offW), lit(0L)))
      .select((keyCols :+ "__pid").map(col) :+ col("__off"): _*)
    local.drop("__pc").join(broadcast(offsets), keyCols :+ "__pid")
      .withColumn(dst, col("__lrn").cast("long") + col("__off"))
      .drop("__pid", "__lrn", "__off")
  }

  /** `lag(src, k)` for EVERY k in 1..maxLag over (key, order), as
    * columns `{dstPrefix}1..{dstPrefix}maxLag` — the K-truncated-
    * recursion shape (EWMA smoothing, ACF lag products) without the
    * per-key window gather. Route: [[globalRowNumber]] pins each
    * row's per-key position; every row then PROVIDES its value to its
    * next `maxLag` positions (one explode → K·N slim rows), collapsed
    * by (key, target position) — each (target, k) slot has exactly
    * one provider, so `max(when(k))` is identity — and equi-joined
    * back on the position. Every exchange hashes on (key, position):
    * balanced at any key cardinality. Values are the identical
    * column values a window lag would carry; no arithmetic happens
    * here, so downstream math is untouched.
    */
  def lagsUpTo(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      srcCol: String, maxLag: Int, dstPrefix: String): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val rn = globalRowNumber(df, keyCols, orderCols, "__grn")
    val prov = rn
      .select(keyCols.map(col) ++ Seq(col("__grn"), col(srcCol)): _*)
      .select(keyCols.map(col) ++ Seq(
        explode(sequence(col("__grn") + 1, col("__grn") + maxLag))
          .as("__tgt"),
        col("__grn"), col(srcCol)): _*)
      .withColumn("__k", (col("__tgt") - col("__grn")).cast("int"))
    val lagTab = prov
      .groupBy((keyCols :+ "__tgt").map(col): _*)
      .agg(
        max(when(col("__k") === 1, col(srcCol))).as(s"${dstPrefix}1"),
        (2 to maxLag).map(k =>
          max(when(col("__k") === k, col(srcCol))).as(s"$dstPrefix$k")): _*)
      .withColumnRenamed("__tgt", "__grn")
    rn.join(lagTab, keyCols :+ "__grn", "left").drop("__grn")
  }

  /** Exact running sum of a DECIMAL column per key (`sum(src) over
    * (partition by key order by orderCols rows unbounded preceding)`)
    * on range-balanced chunks: local cumsum per chunk + per-(chunk,
    * key) totals rolled into exclusive offsets (P×|keys| rows,
    * broadcast back). Decimal addition is associative, so chunked
    * accumulation is bit-identical to the sequential window — which
    * is exactly why callers must feed DECIMAL, not IEEE doubles
    * (enforced). `dst` is cast back to the plain window-sum type so
    * the helper is a drop-in replacement.
    */
  def runningSum(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], srcCol: String, dst: String): DataFrame = {
    require(df.schema(srcCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.DecimalType],
      s"runningSum needs an exact DECIMAL source column; " +
        s"'$srcCol' is ${df.schema(srcCol).dataType.simpleString} " +
        "(an IEEE double cumsum is association-order-dependent)")
    val chunked = RangeChunks.withChunkId(df, keyCols ++ orderCols,
      chunkCount(df), "__pid")
    val wBase = Window.partitionBy(("__pid" +: keyCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val w = wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // group totals ride the SAME sorted pass (full-frame twin); the
    // offsets branch filters this frame → exchange reuse, one scan.
    // Decimal addition is associative, so the full-frame sum is
    // bit-identical to the last row's running sum.
    val wFull = wBase.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val local = chunked
      .withColumn("__lcum", sum(col(srcCol)).over(w))
      .withColumn("__rn1", row_number().over(wBase))
      .withColumn("__pt", sum(col(srcCol)).over(wFull))
    val sumType = local.schema("__lcum").dataType.simpleString
    val offW = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.filter(col("__rn1") === 1)
      .withColumn("__boff", sum(col("__pt")).over(offW))
      .select((keyCols :+ "__pid").map(col) :+ col("__boff"): _*)
    local.drop("__rn1", "__pt").join(broadcast(offsets), keyCols :+ "__pid")
      .withColumn(dst,
        (col("__lcum") + coalesce(col("__boff"), lit(0))).cast(sumType))
      .drop("__pid", "__lcum", "__boff")
  }
}
