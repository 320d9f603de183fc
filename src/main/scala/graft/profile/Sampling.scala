package graft.profile

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sampling strategies — the reference's first-class sampling subsystem
  * (`src/schema_generator/sampling_strategies.py`) re-expressed as
  * distributed plans.
  *
  * Reference caps (`sampling_strategies.py:13-19`): sample_size capped
  * at min(requested, 100_000, 0.5% of total); seed 42.
  *
  * Row-order caveat (SURVEY §7.4.3): pandas samples by file row
  * position; Spark has no implicit order, so strategies that need
  * order take an explicit `orderCol`. Bit-identical sample membership
  * vs the reference is NOT a goal (documented divergence) — the
  * strategies' contracts (size cap, first/last inclusion, stride,
  * per-stratum counts) are.
  */
object Sampling {

  val MaxRows = 100000
  val MaxRatio = 0.005
  val Seed = 42L

  /** `sampling_strategies.py:45-60` size cap. */
  def cappedSize(requested: Int, total: Long): Int =
    math.min(math.min(requested.toLong, MaxRows.toLong),
      math.max(1L, (total * MaxRatio).toLong)).toInt

  trait SamplingStrategy {
    def sample(df: DataFrame, size: Int): DataFrame
  }

  /** Random sample, seeded, always including the first and last row
    * by `orderCol` (`sampling_strategies.py:66-87`: indices 0 and n-1
    * are forced into the drawn set).
    */
  final class RandomStrategy(orderCol: String, seed: Long = Seed)
      extends SamplingStrategy {
    def sample(df: DataFrame, size: Int): DataFrame = {
      val total = df.count()
      val n = cappedSize(size, total)
      val frac = math.min(1.0, n.toDouble / math.max(total, 1L))
      val first = df.orderBy(col(orderCol).asc).limit(1)
      val last = df.orderBy(col(orderCol).desc).limit(1)
      df.sample(withReplacement = false, frac, seed)
        .unionByName(first).unionByName(last)
        .dropDuplicates(orderCol)
    }
  }

  /** Systematic sample: every ⌊total/size⌋-th row by `orderCol`
    * (`sampling_strategies.py:156-210`).
    *
    * Global row positions WITHOUT a global window (which would move the
    * whole table into one task): range-partition by the order column,
    * number rows within each partition in parallel, then add broadcast
    * per-partition offsets — two fully distributed passes. Range
    * boundaries are sampled deterministically, so the count pass and
    * the numbering pass see the same partitioning.
    */
  final class SystematicStrategy(orderCol: String) extends SamplingStrategy {
    def sample(df: DataFrame, size: Int): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val total = df.count()
      val n = cappedSize(size, total)
      val step = math.max(1L, total / math.max(n, 1))
      val ranged = df.repartitionByRange(col(orderCol))
        .withColumn("__pid", spark_partition_id())
      val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val offsets = counts.map(_._1)
        .zip(counts.scanLeft(0L)(_ + _._2).dropRight(1)).toSeq
      val offDf = offsets.toDF("__pid", "__off")
      val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      ranged
        .withColumn("__rn", row_number().over(w))
        .join(broadcast(offDf), Seq("__pid"))
        .filter((col("__rn") - 1 + col("__off")) % step === 0)
        .drop("__pid", "__rn", "__off")
    }
  }

  /** Stratified sample: fixed-n per stratum (`sampling_strategies.py:
    * 213-313`). Deterministic variant orders within stratum by
    * `orderCol`; sampled variant uses rand(seed). One shuffle on the
    * strata column.
    */
  final class StratifiedStrategy(strataCol: String, orderCol: String,
      deterministic: Boolean = true, seed: Long = Seed)
      extends SamplingStrategy {
    def sample(df: DataFrame, perStratum: Int): DataFrame = {
      val order = if (deterministic) col(orderCol) else rand(seed)
      val w = Window.partitionBy(col(strataCol)).orderBy(order)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= perStratum)
        .drop("__rn")
    }
  }

  /** Fraction-based stratified sampling via Spark's native sampleBy
    * (the scale path: no window, per-partition Bernoulli draws). */
  def sampleByFractions(df: DataFrame, strataCol: String,
      fractions: Map[Any, Double], seed: Long = Seed): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Exact per-group quotas for a weighted mixture totaling `total`:
    * floor(wᵢ·total) each, remainder seats by largest fractional part
    * (ties by group name) — the largest-remainder method, fully
    * deterministic on the driver from weights alone.
    */
  def mixtureQuotas(weights: Map[String, Double], total: Int): Map[String, Long] = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0))
    val wsum = weights.values.sum
    require(wsum > 0, "weights must not all be zero")
    val raw = weights.view.mapValues(w => w / wsum * total).toMap
    val base = raw.view.mapValues(r => math.floor(r).toLong).toMap
    val remainder = (total - base.values.sum).toInt
    val order = raw.toSeq
      .sortBy { case (g, r) => (-(r - math.floor(r)), g) }
      .map(_._1)
    val bumped = order.take(remainder).toSet
    base.map { case (g, q) => g -> (q + (if (bumped(g)) 1L else 0L)) }
  }

  /** Mixture sampling — curate a training set to target source/domain
    * proportions (beyond the reference; the data-mixture step every
    * large-corpus pipeline runs before training). Deterministic: the
    * first quotaᵢ rows of group i by `orderCol`. One window shuffle on
    * the group column; groups with fewer rows than their quota
    * contribute what they have (the caller can reweigh and rerun).
    */
  def mixtureSample(df: DataFrame, groupCol: String, orderCol: String,
      weights: Map[String, Double], total: Int): DataFrame = {
    val quotas = mixtureQuotas(weights, total)
    val quotaCol = quotas.foldLeft(lit(0L)) { case (acc, (g, q)) =>
      when(col(groupCol) === g, lit(q)).otherwise(acc)
    }
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.filter(col(groupCol).isin(quotas.keys.toSeq: _*))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quotaCol)
      .drop("__rn")
  }

  /** Multiplicative hash bucket in [0, 100) for a 64-bit id — the
    * basis of reproducible train/val/test splits: stable across runs,
    * engines and partitionings (unlike `rand()`), uncorrelated with id
    * ordering (unlike `id % 100`, which stripes any id-correlated
    * structure straight into the splits). Knuth's 2654435761
    * multiplier mod 2^32, computed in 16-bit limbs so every
    * intermediate fits a signed 64-bit int — ANSI mode (overflow
    * throws) and any engine with plain BIGINT arithmetic, e.g. the
    * DuckDB oracle, evaluate it bit-identically.
    */
  def hashBucket(id: Column): Column = hash32(id) % 100

  /** The full-resolution 32-bit multiplicative hash behind
    * [[hashBucket]] — value in [0, 2^32), same 16-bit-limb arithmetic,
    * same bit-identical-in-any-BIGINT-engine contract. */
  def hash32(id: Column): Column = {
    val m = 4294967296L // 2^32
    val c = 2654435761L
    val x = ((id % m) + m) % m // low 32 bits, non-negative
    val a = (x / 65536).cast("long") // high 16
    val b = x % 65536 // low 16
    (((a * c) % m) * 65536 + b * c) % m
  }

  /** Deterministic weighted sample without replacement (Efraimidis-
    * Spirakis A-ES): each row draws the reproducible uniform
    * u = (hash32(id)+0.5)/2^32 and the k rows with the largest
    * ln(u)/weight survive — inclusion probability proportional to
    * weight, no replacement, and the whole thing is one distributed
    * top-k (TakeOrderedAndProject: per-partition heaps, k rows to the
    * driver — no global sort, no rand(), repartition-stable). The
    * importance-weighted subsampling step that pairs with DSIR
    * weights at corpus scale. Non-positive weights are excluded.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, "sample size must be positive")
    val u = (hash32(col(idCol)) + lit(0.5)) / lit(4294967296.0)
    df.filter(col(weightCol) > 0)
      .withColumn("__wkey", log(u) / col(weightCol))
      .orderBy(col("__wkey").desc)
      .limit(k)
      .drop("__wkey")
  }

  /** Deterministic percentage split: `splits` are (name, percent)
    * pairs summing to 100; a row lands in the split whose cumulative
    * range contains its [[hashBucket]]. Pure per-row arithmetic — no
    * shuffle, no state, and re-running on a grown corpus never moves
    * an existing id between splits.
    */
  def deterministicSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) &&
      splits.map(_._2).sum == 100,
      s"split percents must be positive and sum to 100: $splits")
    val bucket = hashBucket(col(idCol))
    val cuts = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val assigned = splits.zip(cuts).reverse.foldLeft(lit(splits.last._1)) {
      case (acc, ((name, _), cut)) =>
        when(bucket < cut, lit(name)).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }
}
