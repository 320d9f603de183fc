package graft.profile

import org.apache.spark.sql.{DataFrame, Row}
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
    * (`sampling_strategies.py:156-210`). row_number is a single
    * window pass; at scale prefer a precomputed dense id column so the
    * global window doesn't single-task (documented in SURVEY O5).
    */
  final class SystematicStrategy(orderCol: String) extends SamplingStrategy {
    def sample(df: DataFrame, size: Int): DataFrame = {
      val total = df.count()
      val n = cappedSize(size, total)
      val step = math.max(1L, total / math.max(n, 1))
      val w = Window.orderBy(col(orderCol))
      df.withColumn("__rn", row_number().over(w))
        .filter((col("__rn") - 1) % step === 0)
        .drop("__rn")
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
}
