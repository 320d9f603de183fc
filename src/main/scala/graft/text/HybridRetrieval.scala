package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** Hybrid lexical+dense retrieval via Reciprocal Rank Fusion
  * (Cormack, Clarke & Büttcher 2009): fuse a BM25 ranking and a
  * cosine-ANN ranking of the same corpus into one list by
  * `rrf(d) = Σ_lists 1/(K + rank_list(d))`. RRF works on RANKS, not
  * scores, so the two retrievers' incomparable score scales never
  * need calibration — which is exactly why it is the standard first
  * fusion in RAG / retrieval pipelines.
  *
  * Scale posture: each arm is its own already-scalable retriever
  * ([[Bm25.scores]]: filtered keyed exchanges; brute-force or ANN
  * cosine: broadcast bounded query); both arms then truncate to the
  * top `depth` BEFORE fusing, so the fusion join moves ≤ 2·depth rows
  * regardless of corpus size. The per-arm rank windows sort only the
  * arm's candidate set, not the corpus.
  *
  * Determinism: ranks are integers (rank windows order by the raw
  * double score, ties by id — both engines compute the same doubles);
  * the fused score is a FIXED two-term double add (sparse term then
  * dense term), bit-identical cross-engine.
  */
object HybridRetrieval {

  /** RRF-fuse BM25 (`queryTerms`) and dense cosine (`queryVec` = the
    * `queryId` row of `vectors`) over a corpus where document ids and
    * vector ids share a domain. Output: one row per doc retrieved by
    * EITHER arm's top `depth`: (idCol, sparse_rank, dense_rank, rrf),
    * absent-arm ranks null, ordered by id.
    */
  def rrfFuse(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String],
      vectors: DataFrame, vecIdCol: String, vecCol: String,
      queryId: Long, depth: Int = 20, k: Int = 60): DataFrame = {
    require(depth > 0 && k > 0, "rrfFuse: depth and k must be positive")
    // TakeOrdered (per-partition top-k, no global sort) bounds the
    // candidate set to `depth` rows BEFORE the rank window, so the
    // single-task window sorts ≤ depth rows, never the corpus
    val sparse = Bm25.scores(docs, idCol, textCol, queryTerms)
      .orderBy(col("__raw").desc, col(idCol)).limit(depth)
      .withColumn("sparse_rank",
        row_number().over(Window.orderBy(col("__raw").desc, col(idCol))))
      .select(col(idCol).as("__id"), col("sparse_rank"))
    val dense = Similarity.bruteForceTopK(
        corpus = vectors,
        queries = vectors.filter(col(vecIdCol) === queryId),
        idCol = vecIdCol, vecCol = vecCol, k = depth)
      .select(col("corpus_id").as("__id"), col("rank").as("dense_rank"))
    sparse.join(dense, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol), col("sparse_rank"), col("dense_rank"),
        round(
          coalesce(lit(1.0) / (lit(k) + col("sparse_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(k) + col("dense_rank")), lit(0.0)),
          6).as("rrf"))
      .orderBy(idCol)
  }
}
