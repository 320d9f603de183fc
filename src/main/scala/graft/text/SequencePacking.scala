package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the concat-and-chunk step of a
  * training-data pipeline: documents are laid out contiguously in a
  * deterministic order and cut into fixed token-budget bins; each doc
  * is assigned the bin its first token lands in, plus its offset
  * within that bin. (Beyond the reference: the reference stops at
  * per-document stats; packing is what a 100 TB corpus needs next to
  * become training batches.)
  *
  * Layout semantics (offset packing): bin boundaries fall every
  * `budget` tokens of the concatenated shard stream, so a document may
  * straddle a boundary — exactly the concat-then-chunk behavior of
  * GPT-style pretraining loaders, and unlike first-fit it is a pure
  * prefix-sum, so it is SQL-expressible and embarrassingly parallel.
  *
  * Scale: ONE window shuffle keyed by `shardCol`; each shard packs
  * independently in its own task. Shard granularity is the caller's
  * lever — a natural key (lang, source) for oracle-friendly runs, or
  * `hashShard(idCol, n)` for uniform width at cluster scale. All
  * arithmetic is integral (`DIV`/`%`), exact at any corpus size —
  * cumulative token counts overflow a double's 2^53 mantissa long
  * before they overflow a long.
  */
object SequencePacking {

  /** A uniform synthetic shard key: pmod(xxhash64(id), n). */
  def hashShard(idCol: Column, nShards: Int): Column =
    pmod(xxhash64(idCol), lit(nShards.toLong))

  /** Assign each row a `bin` and `bin_offset` under `budget`-token
    * packing, packing independently within each shard in `orderCol`
    * order. Input columns pass through unchanged.
    */
  def packContiguous(df: DataFrame, orderCol: String, tokenCol: String,
      shardCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum",
        coalesce(sum(col(tokenCol).cast("long")).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum DIV $budget"))
      .withColumn("bin_offset", expr(s"__cum % $budget"))
      .drop("__cum")
  }

  /** Per-bin summary — the packed-batch manifest: how many docs start
    * in each bin and how many tokens they contribute. Bins other than a
    * shard's last hold ≥ budget tokens of stream (docs straddle).
    */
  def binManifest(packed: DataFrame, shardCol: String,
      tokenCol: String): DataFrame =
    packed.groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol).cast("long")).as("tokens_started"))

  /** Weight-balanced shard assignment — cut the `idCol`-ordered corpus
    * into `nShards` contiguous spans of near-equal total weight (each
    * shard's weight within one max-row-weight of total/n): the
    * dataloader-sharding step, where hash splits give equal COUNTS but
    * weight (tokens, bytes) is what bounds a training step.
    *
    * The exclusive prefix sum is computed DISTRIBUTED: chunk by id
    * range ([[graft.transform.RangeChunks.withChunkId]] — bounds
    * sampled once, compiled into a deterministic projection, so the
    * cumsum branch and the offsets branch agree on chunk membership
    * with NO whole-corpus materialization and lineage intact), one
    * chunk-local window, then per-chunk totals — a P-row table — roll
    * into broadcast offsets. No global single-partition window
    * anywhere, so the shape holds at 100 TB. All arithmetic is
    * integral (`DIV`), exact at any corpus size.
    *
    * Output: input columns + `shard` in [0, nShards).
    */
  def balancedShards(df: DataFrame, idCol: String, weightCol: String,
      nShards: Int, numPartitions: Int = 0): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val spark = df.sparkSession
    val p =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = graft.transform.RangeChunks
      .withChunkId(df, Seq(idCol), p, "__pid")
    val local = Window.partitionBy(col("__pid")).orderBy(col(idCol))
    val withCum = ranged.withColumn("__cum",
      sum(col(weightCol).cast("long")).over(local))
    // chunk totals come from a map-side-combined AGGREGATE of the
    // chunked input, not a filter of the windowed frame (a filtered
    // bridge looks shareable, but column pruning de-canonicalizes the
    // branches and the corpus gets shuffled + window-sorted twice —
    // the round-10 regression). P rows; the only single-partition
    // window runs over P rows, not the corpus; the grand total is the
    // sum of the SAME P chunk totals, not a third corpus pass.
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunkTotals = ranged.groupBy(col("__pid"))
      .agg(sum(col(weightCol).cast("long")).as("__psum"))
    val offsets = chunkTotals
      .withColumn("__off", coalesce(sum(col("__psum")).over(offW), lit(0L)))
      .select(col("__pid"), col("__off"),
        sum(col("__psum")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))
          .as("__total"))
    withCum.join(broadcast(offsets), Seq("__pid"))
      .withColumn("shard",
        least(expr(s"((__off + __cum - $weightCol) * $nShards) DIV __total"),
          lit(nShards - 1L)).cast("long"))
      .drop("__pid", "__cum", "__off", "__total")
  }
}
