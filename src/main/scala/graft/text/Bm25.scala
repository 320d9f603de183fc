package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 retrieval scoring (Robertson & Spärck Jones probabilistic
  * ranking; the Lucene `ln(1 + (N-df+0.5)/(df+0.5))` IDF form that
  * keeps weights positive): the standard lexical relevance score a
  * data pipeline needs for query-anchored corpus slicing — "give me
  * the documents most relevant to this topic probe" — and the exact
  * companion to the dense [[graft.sim.Similarity]] retrievers.
  *
  * Scale posture: the query-term filter runs BEFORE the only shuffle,
  * so the tf aggregation moves O(matching tokens), not O(corpus
  * tokens); doc length rides the groupBy key (it is functionally
  * dependent on the doc id, computed map-side from the same row) so
  * no corpus-wide lengths join exists; df (≤ |Q| rows) and the 1-row
  * (N, avgdl) stats are broadcast. Net: one filtered token-keyed
  * exchange + one doc-keyed exchange, both O(matches).
  *
  * Determinism: per-term contributions are pure per-row double
  * arithmetic (bit-identical cross-engine), decimal-cast BEFORE the
  * per-doc sum so summation order cannot perturb the total; the mean
  * divides once in double at the end.
  */
object Bm25 {

  /** Raw per-document BM25 scores against `queryTerms` — every doc
    * sharing ≥ 1 term, unranked and unrounded. Output: (idCol,
    * matched_terms, __raw double). The building block [[topDocs]] and
    * [[HybridRetrieval]] rank from; raw doubles stay internal so
    * rounding can't perturb downstream rank order.
    */
  def scores(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val terms = queryTerms.distinct
    require(terms.nonEmpty, "BM25 needs at least one query term")
    // corpus stats over ALL docs (blank docs count toward N and pull
    // avgdl down): exact integral sums, ONE double divide — spelled
    // out (not avg()) so the oracle's accumulator can't diverge
    val stats = docs
      .agg(count(lit(1)).as("n"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("__tot"))
      .select(col("n"),
        (col("__tot").cast("double") / col("n").cast("double")).as("avgdl"))
    // doc length computed map-side and carried through the explode so
    // tf's groupBy key includes it — no separate lengths join
    val qtoks = docs.select(
        col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__dl"),
        explode(TextAnalysis.words(col(textCol))).as("token"))
      .filter(col("token").isin(terms: _*))
    val tf = qtoks.groupBy(col(idCol), col("__dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = qtoks.groupBy("token")
      .agg(countDistinct(idCol).as("df"))
    tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("n").cast("double") - col("df") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("__contrib",
        (col("__idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("__dl").cast("double") / col("avgdl"))))
          .cast("decimal(20,10)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("matched_terms"), sum(col("__contrib")).as("__s"))
      .select(col(idCol), col("matched_terms"),
        col("__s").cast("double").as("__raw"))
  }

  /** Per-document BM25 score against `queryTerms`, top `limit` docs
    * by score (ties broken by id). Output: (idCol, matched_terms,
    * bm25). Docs sharing no term with the query are not retrieved —
    * retrieval semantics, unlike the row-preserving scorers
    * ([[UnigramLm.meanNll]]).
    */
  def topDocs(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      limit: Int = 10): DataFrame =
    scores(docs, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("__raw").desc, col(idCol))
      .limit(limit)
      .select(col(idCol), col("matched_terms"),
        round(col("__raw"), 6).cast("double").as("bm25"))
}
