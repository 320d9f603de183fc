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
  * Scale shape: the gram exchanges carry (gram, id, length) POSTINGS
  * — never the strings themselves. Each string gets a stable surrogate
  * id (monotonically_increasing_id pinned by an eager localCheckpoint,
  * vocabulary-sized — the same stabilization Dedup's clustering uses),
  * candidates form as id pairs under the length + count filters, and
  * the strings re-enter ONLY at the final id-keyed lookup that feeds
  * the levenshtein verifier. A hot gram therefore costs id-pair
  * traffic, not string-pair traffic, and the exchange volume is
  * O(postings), independent of string length —
  * EditDistJoinSpec pins that no gram exchange ships a payload
  * string. Frequent-gram skew is bounded the same way the LSH band
  * buckets are (the gram alphabet is position-padded, and hot grams
  * can be capped if a corpus demands it).
  */
object EditDistJoin {

  /** All unordered pairs (a < b) from `strs`(`strCol`) with
    * levenshtein(a, b) <= d. Returns columns (wa, wb, dist).
    */
  def join(strs: DataFrame, strCol: String, d: Int, q: Int): DataFrame = {
    require(d >= 1 && q >= 2, s"need d >= 1, q >= 2; got d=$d q=$q")
    // stable ids: the id column must evaluate identically in every
    // branch that reuses this frame (candidate generation AND the
    // final string lookup) — localCheckpoint materializes the
    // assignment so recomputation can never renumber
    val ids = strs.select(col(strCol).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .select(monotonically_increasing_id().as("id"), col("w"),
        length(col("w")).as("len"))
      .localCheckpoint(eager = true)
    val shortMax = d * q - q + 1 // below this, zero shared grams possible
    // padded positional q-grams: (q-1) '#' prefix + s + (q-1) '$'
    // suffix; postings project (id, len, g) — the string never leaves
    // this projection
    val grams = ids
      .select(col("id"), col("len"), explode(expr(
        s"transform(sequence(1, length(w) + ${q - 1}), " +
          s"i -> substring(concat('${"#" * (q - 1)}', w, '${"$" * (q - 1)}'), i, $q))"))
        .as("g"))
    val left = grams.select(col("id").as("ia"), col("len").as("la"), col("g"))
    val right = grams.select(col("id").as("ib"), col("len").as("lb"), col("g"))
    val indexed = left.join(right, "g")
      .filter(col("ia") < col("ib") &&
        abs(col("la") - col("lb")) <= d)
      .groupBy("ia", "ib", "la", "lb")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >=
        greatest(col("la"), col("lb")) + (q - 1) - d * q)
      .select(col("ia"), col("ib"))
    val shortIds = ids.filter(col("len") <= shortMax)
      .select(col("id"), col("len"))
    val shortPairs = broadcast(shortIds.select(col("id").as("ia"),
        col("len").as("la")))
      .crossJoin(broadcast(shortIds.select(col("id").as("ib"),
        col("len").as("lb"))))
      .filter(col("ia") < col("ib") &&
        abs(col("la") - col("lb")) <= d)
      .select(col("ia"), col("ib"))
    // strings re-enter here, id-keyed, ONLY for the candidate pairs
    val cand = indexed.unionByName(shortPairs).distinct()
      .join(ids.select(col("id").as("ia"), col("w").as("sa")), "ia")
      .join(ids.select(col("id").as("ib"), col("w").as("sb")), "ib")
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= d)
    // present pairs in string order (ids are assignment order, not
    // lexical): distinct strings, so least/greatest never tie
    cand.select(least(col("sa"), col("sb")).as("wa"),
      greatest(col("sa"), col("sb")).as("wb"), col("dist"))
  }
}
