package graft.transform

import org.apache.spark.sql.{DataFrame, Row}
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
  * Chunk ids come from [[RangeChunks]]: bounds sampled ONCE (a small
  * driver job over just the sort columns) and compiled into a
  * deterministic O(log P) binary-search projection
  * ([[graft.plans.RangeChunkId]]) — every plan branch and every task
  * retry computes the identical id, so nothing is materialized: no
  * checkpoint, lineage intact. The cross-chunk boundary tables are
  * map-side-combined AGGREGATES of the chunked input (`max_by` /
  * `count` / `sum` per (chunk, key)), NOT filters of the windowed
  * frame: a filtered-window bridge looks shareable but column pruning
  * de-canonicalizes the branches and Spark plans TWO corpus window
  * exchanges (the round-10 regression, measured 2–3.6× at 10×). With
  * aggregate bridges the corpus is shuffled and window-sorted exactly
  * once; the bridge pays one extra SCAN whose partial aggregation
  * ships only P×|keys| rows per mapper.
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
  *
  * Cardinality contract: the bridge/offset tables are P×|keys| rows,
  * collected to the driver for broadcast — these helpers exist for
  * LOW-cardinality keys (event types, sensor classes; ≲ thousands).
  * [[chunkBounds]] enforces it loudly: if the bound sketch alone
  * observes more than `spark.graft.chunkedWindows.maxSampledKeys`
  * (default 4096) distinct key tuples, the call fails with guidance
  * instead of silently OOMing the driver. High-cardinality keys don't
  * need these helpers at all — a plain per-key window is already
  * balanced there.
  */
object ChunkedWindows {

  private def chunkCount(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** Sample the range-chunk bounds for (keyCols ++ orderCols) ONCE —
    * reusable across every helper in one query build (each helper
    * otherwise pays its own driver sketch job) — and enforce the
    * low-cardinality key contract: more than
    * `spark.graft.chunkedWindows.maxSampledKeys` (default 4096)
    * distinct key tuples OBSERVED IN THE SKETCH is a loud failure,
    * because the P×|keys| boundary broadcast would grow past what the
    * driver should hold. The check is sound (sampled keys ⊆ real
    * keys) and free — it reuses the sketch rows the bounds need
    * anyway.
    */
  def chunkBounds(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], p: Int = 0,
      seed: Long = 0x5eedL): Seq[Row] = {
    val pp = if (p > 0) p else chunkCount(df)
    val sketch = RangeChunks.sampleSketch(df, keyCols ++ orderCols, seed)
    val maxKeys = df.sparkSession.conf
      .getOption("spark.graft.chunkedWindows.maxSampledKeys")
      .map(_.toInt).getOrElse(4096)
    if (keyCols.nonEmpty) {
      val k = keyCols.length
      val seen = scala.collection.mutable.HashSet.empty[Seq[Any]]
      val it = sketch.iterator.flatMap(_._2)
      var over = false
      while (it.hasNext && !over) {
        seen += Seq.tabulate(k)(it.next().get)
        if (seen.size > maxKeys) over = true
      }
      if (over) throw new IllegalStateException(
        s"ChunkedWindows: the bound sketch alone observed > $maxKeys " +
          s"distinct key tuples over (${keyCols.mkString(", ")}) — the " +
          "P×|keys| boundary broadcast would not be driver-safe. These " +
          "helpers are for LOW-cardinality keys (a plain per-key window " +
          "is already balanced at high cardinality); raise " +
          "spark.graft.chunkedWindows.maxSampledKeys only if the " +
          "driver can hold shufflePartitions × keys boundary rows.")
    }
    // NON-NULL order contract, enforced loudly where it is free: the
    // helpers' chunk-boundary bridge (`max_by` over the order tuple)
    // and the window sort must agree on "last row of a chunk", and a
    // NULL order value breaks that agreement (doc on [[lag1]]). The
    // sketch rows already carry the order columns — a sampled NULL is
    // proof of a real NULL, so fail with guidance instead of silently
    // diverging. (Sound, not complete: un-sampled NULLs still pass;
    // the documented requirement stands.)
    {
      val k = keyCols.length
      val badCol = sketch.iterator.flatMap(_._2)
        .flatMap(r => orderCols.indices.find(j => r.isNullAt(k + j)))
        .nextOption()
      badCol.foreach { j =>
        throw new IllegalArgumentException(
          s"ChunkedWindows: order column '${orderCols(j)}' contains " +
            "NULLs (observed in the bounds sketch). These helpers " +
            "require NON-NULL order columns that totally order rows " +
            "within a key — a NULL order value can hand the next chunk " +
            "a different bridge value than a plain window would. " +
            "Filter the NULLs out or coalesce the order column first.")
      }
    }
    RangeChunks.boundsFromSketch(sketch, pp)
  }

  private def withChunk(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], bounds: Option[Seq[Row]]): DataFrame = {
    val bs = bounds.getOrElse(chunkBounds(df, keyCols, orderCols))
    df.withColumn("__pid",
      RangeChunks.chunkIdExpr((keyCols ++ orderCols).map(col), bs))
  }

  /** `df` + one lagged column per (src → dst) in `lagCols`, equal to
    * `lag(src, 1) over (partition by keyCols order by orderCols)`.
    * One (chunk, key)-hashed window exchange over the corpus; the
    * only cross-chunk work is a P×|keys|-row boundary table built by
    * a map-side-combined `max_by` aggregation, rolled with a small
    * window and broadcast back. Pass pre-sampled `bounds` (from
    * [[chunkBounds]]) to share one sketch job across chained helpers.
    *
    * REQUIREMENT (shared by every helper here, stated once): the
    * order columns must be NON-NULL and totally order rows within a
    * key. The bridge's `max_by` over the order tuple must agree with
    * the window sort about which row is "last in the chunk" — a NULL
    * order value (which the window sorts first but `max_by`'s struct
    * ordering also ranks lowest only field-by-field) or an order tie
    * (both pick arbitrarily, possibly differently) can hand the next
    * chunk a different bridge value than a plain window would.
    */
  def lag1(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      lagCols: Map[String, String],
      bounds: Option[Seq[Row]] = None): DataFrame = {
    require(lagCols.nonEmpty, "no lag columns requested")
    val chunked = withChunk(df, keyCols, orderCols, bounds)
    val w = Window.partitionBy(("__pid" +: keyCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)

    // last row of every (chunk, key): the value the NEXT chunk of the
    // same key needs for its first row. P×|keys| rows — broadcastable.
    // max_by over the order tuple is a hash aggregate with map-side
    // partial combine: only P×|keys| rows per mapper reach the wire
    // (a second corpus-wide window here was the round-9 form; a
    // filter of the windowed frame was the round-10 regression).
    val ordStruct = struct(orderCols.map(col): _*)
    val valStruct = struct(lagCols.keys.toSeq.map(col): _*)
    val lasts = chunked
      .groupBy(("__pid" +: keyCols).map(col): _*)
      .agg(max_by(valStruct, ordStruct).as("__lv"))
      .select((keyCols :+ "__pid").map(col) ++
        lagCols.keys.toSeq.map(s =>
          col("__lv").getField(s).as(s"__last_$s")): _*)
    val bw = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__pid"))
    val bridge = lasts.select(
      (keyCols :+ "__pid").map(col) ++ lagCols.keys.toSeq.map(s =>
        lag(col(s"__last_$s"), 1).over(bw).as(s"__br_$s")): _*)

    // all window expressions share one spec → ONE Window node over the
    // (__pid, key)-hashed exchange; hashing on __pid keeps the groups
    // chunk-sized no matter how few keys exist
    val withLocal = lagCols.keys.foldLeft(
        chunked.withColumn("__rn1", row_number().over(w))) {
      case (d, src) =>
        d.withColumn(s"__ll_$src", lag(col(src), 1).over(w))
    }
    val joined = withLocal.join(broadcast(bridge), keyCols :+ "__pid", "left")
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
      orderCols: Seq[String], dst: String,
      bounds: Option[Seq[Row]] = None): DataFrame = {
    val chunked = withChunk(df, keyCols, orderCols, bounds)
    val w = Window.partitionBy(("__pid" +: keyCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val local = chunked.withColumn("__lrn", row_number().over(w))
    val offW = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // map-side-combined count per (chunk, key) — the corpus is
    // shuffled once (the window above); this branch only scans
    val offsets = chunked.groupBy(("__pid" +: keyCols).map(col): _*)
      .agg(count(lit(1)).as("__pc"))
      .withColumn("__off", coalesce(sum(col("__pc")).over(offW), lit(0L)))
      .select((keyCols :+ "__pid").map(col) :+ col("__off"): _*)
    local.join(broadcast(offsets), keyCols :+ "__pid")
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
      srcCol: String, maxLag: Int, dstPrefix: String,
      bounds: Option[Seq[Row]] = None): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val bs = bounds.getOrElse(chunkBounds(df, keyCols, orderCols))
    val rn = globalRowNumber(df, keyCols, orderCols, "__grn", Some(bs))
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
      orderCols: Seq[String], srcCol: String, dst: String,
      bounds: Option[Seq[Row]] = None): DataFrame = {
    require(df.schema(srcCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.DecimalType],
      s"runningSum needs an exact DECIMAL source column; " +
        s"'$srcCol' is ${df.schema(srcCol).dataType.simpleString} " +
        "(an IEEE double cumsum is association-order-dependent)")
    val chunked = withChunk(df, keyCols, orderCols, bounds)
    val w = Window.partitionBy(("__pid" +: keyCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = chunked.withColumn("__lcum", sum(col(srcCol)).over(w))
    val sumType = local.schema("__lcum").dataType.simpleString
    val offW = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // map-side-combined decimal totals per (chunk, key); decimal
    // addition associates, so the aggregate total equals the window's
    val offsets = chunked.groupBy(("__pid" +: keyCols).map(col): _*)
      .agg(sum(col(srcCol)).as("__pt"))
      .withColumn("__boff", sum(col("__pt")).over(offW))
      .select((keyCols :+ "__pid").map(col) :+ col("__boff"): _*)
    local.join(broadcast(offsets), keyCols :+ "__pid")
      .withColumn(dst,
        (col("__lcum") + coalesce(col("__boff"), lit(0))).cast(sumType))
      .drop("__pid", "__lcum", "__boff")
  }
}
