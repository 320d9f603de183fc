package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance similarity join (Ed-Join family: Xiao et al.,
  * VLDB'08): all pairs of strings within Levenshtein distance d,
  * WITHOUT the all-pairs cross join a naive filter needs.
  *
  * Candidate generation is a positional q-gram inverted-index
  * equi-join with two exact pruning rules:
  *   - length filter: ED(x,y) <= d  ⇒  | |x| - |y| | <= d;
  *   - count filter:  ED(x,y) <= d  ⇒  padded q-gram multisets share
  *     at least max(|x|,|y|) + q - 1 - d·q grams (one edit destroys at
  *     most q padded grams).
  * When that bound is <= 0 (both strings shorter than d·q - q + 2) a
  * zero-shared-gram pair can still be within distance d, so the short
  * stratum — bounded by alphabet combinatorics, broadcast-size in any
  * real corpus — is cross-joined exactly rather than indexed. Every
  * candidate then passes through the codegen `levenshtein` verifier,
  * so the output is EXACT: the oracle is the naive quadratic filter
  * and must match row for row (recall proof, same contract idiom as
  * Dedup.setSimJoinPrefix).
  *
  * At scale the exchanges carry (gram → id) postings, never string
  * pairs that fail the length filter; the frequent-gram skew a plain
  * token join suffers is bounded because padded grams are positional
  * only in count, and hot grams can be capped the same way the LSH
  * band buckets are.
  */
object EditDistJoin {

  /** All unordered pairs (a < b) from `strs`(`strCol`) with
    * levenshtein(a, b) <= d. Returns columns (wa, wb, dist).
    */
  def join(strs: DataFrame, strCol: String, d: Int, q: Int): DataFrame = {
    require(d >= 1 && q >= 2, s"need d >= 1, q >= 2; got d=$d q=$q")
    val w = strs.select(col(strCol).as("w")).filter(length(col("w")) > 0)
      .distinct()
    val shortMax = d * q - q + 1 // below this, zero shared grams possible
    // padded positional q-grams: (q-1) '#' prefix + s + (q-1) '$' suffix
    val grams = w
      .select(col("w"), explode(expr(
        s"transform(sequence(1, length(w) + ${q - 1}), " +
          s"i -> substring(concat('${"#" * (q - 1)}', w, '${"$" * (q - 1)}'), i, $q))"))
        .as("g"))
    val left = grams.select(col("w").as("wa"), col("g"))
    val right = grams.select(col("w").as("wb"), col("g"))
    val indexed = left.join(right, "g")
      .filter(col("wa") < col("wb") &&
        abs(length(col("wa")) - length(col("wb"))) <= d)
      .groupBy("wa", "wb")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >=
        greatest(length(col("wa")), length(col("wb"))) + (q - 1) - d * q)
      .select(col("wa"), col("wb"))
    val shorts = w.filter(length(col("w")) <= shortMax)
    val shortPairs = broadcast(shorts.select(col("w").as("wa")))
      .crossJoin(broadcast(shorts.select(col("w").as("wb"))))
      .filter(col("wa") < col("wb") &&
        abs(length(col("wa")) - length(col("wb"))) <= d)
    indexed.unionByName(shortPairs).distinct()
      .withColumn("dist", levenshtein(col("wa"), col("wb")))
      .filter(col("dist") <= d)
  }
}
