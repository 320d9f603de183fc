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
  * gathering: range-partition the corpus by (key, order) so each
  * chunk holds a CONTIGUOUS ordered run, take the local lag inside
  * every chunk, and stitch the P×|keys| chunk boundaries with one
  * tiny window — the [[graft.text.SequencePacking.balancedShards]]
  * distributed-prefix-sum shape, applied to lag.
  *
  * Exactness: a key's rows occupy a contiguous partition interval
  * under range partitioning, so "previous chunk (in pid order) that
  * contains the key" IS the chunk holding the predecessor row; any
  * placement of the (sampled, run-varying) range boundaries yields
  * the identical lagged values because splitting a totally ordered
  * sequence never changes who precedes whom. Order columns must
  * totally order rows within a key (pass a unique tiebreaker);
  * lagged source columns may be null (first-row detection uses
  * row_number, not null-ness).
  */
object ChunkedWindows {

  /** `df` + one lagged column per (src → dst) in `lagCols`, equal to
    * `lag(src, 1) over (partition by keyCols order by orderCols)`.
    * One range exchange + balanced local sorts; the only cross-chunk
    * work is a P×|keys|-row boundary table rolled with a small window
    * and broadcast back.
    */
  def lag1(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      lagCols: Map[String, String]): DataFrame = {
    require(lagCols.nonEmpty, "no lag columns requested")
    val spark = df.sparkSession
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val rangeExprs = (keyCols ++ orderCols).map(col)
    // pin ONE concrete partitioning: spark_partition_id is only
    // meaningful relative to a single materialized exchange (two
    // evaluations of repartitionByRange may sample different bounds)
    val ranged = df.repartitionByRange(p, rangeExprs: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    val w = Window.partitionBy(("__pid" +: keyCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)

    // last row of every (chunk, key): the value the NEXT chunk of the
    // same key needs for its first row. P×|keys| rows — broadcastable.
    val lastW = Window.partitionBy(("__pid" +: keyCols).map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val lasts = ranged
      .withColumn("__lrn", row_number().over(lastW))
      .filter(col("__lrn") === 1)
      .select((keyCols :+ "__pid").map(col) ++
        lagCols.keys.toSeq.map(s => col(s).as(s"__last_$s")): _*)
    val bw = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__pid"))
    val bridge = lasts.select(
      (keyCols :+ "__pid").map(col) ++ lagCols.keys.toSeq.map(s =>
        lag(col(s"__last_$s"), 1).over(bw).as(s"__br_$s")): _*)

    // all window expressions share one spec → ONE Window node over the
    // (__pid, key)-hashed exchange; hashing on __pid keeps the groups
    // chunk-sized no matter how few keys exist
    val withLocal = lagCols.foldLeft(
        ranged.withColumn("__rn1", row_number().over(w))) {
      case (d, (src, _)) =>
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
}
