package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.sim.{IvfPqIndex, Pca, ProductQuantization, Similarity}

/** Similarity search over the embeddings table. The exact brute-force
  * path is oracle-verified (DuckDB list_dot_product on double-cast
  * vectors reproduces the sequential double accumulation bit-for-bit
  * before rounding); the LSH path is rows-only with recall asserted
  * against brute force in SimilaritySpec.
  */
object SimilarityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Exact top-5 cosine neighbors for query vectors 0/1/2. */
  val qSimTopK: QueryDef = QueryDef.sql(
    "q_sim_topk",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0, 1, 2)),
      |s AS (
      |  SELECT q.query_id, e.vec_id AS corpus_id,
      |    CASE WHEN sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)) = 0
      |      THEN 0.0
      |      ELSE list_dot_product(e.v, q.qv) /
      |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) END
      |      AS cosine
      |  FROM e CROSS JOIN q WHERE e.vec_id != q.query_id)
      |SELECT query_id, corpus_id, CAST(round(cosine, 6) AS DOUBLE) AS cosine, rank
      |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
      |        ORDER BY cosine DESC, corpus_id) AS rank FROM s)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin,
    doc = "exact brute-force cosine top-k (similarity search baseline)") { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(
        corpus = emb,
        queries = emb.filter(col("vec_id").isin(0, 1, 2)),
        idCol = "vec_id", vecCol = "embedding", k = 5)
      .select(col("query_id"), col("corpus_id"),
        round(col("cosine"), 6).cast("double").as("cosine"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Hyperplane-LSH ANN top-5, self-verifying: the LSH result is
    * compared in-plan against the brute-force truth and the per-query
    * recall contract (≥ 3 of the exact top-5 recovered) is emitted as
    * a hash-checked boolean — the oracle states the contract, the plan
    * proves it. Signatures themselves hash with xxhash64 (no DuckDB
    * twin), which is exactly why the check is recall-shaped.
    */
  val qSimLsh: QueryDef = QueryDef.sql(
    "q_sim_lsh",
    """SELECT vec_id AS query_id, 5 AS k, true AS recall_ok
      |FROM embeddings WHERE vec_id IN (0, 1, 2)
      |ORDER BY query_id""".stripMargin,
    doc = "LSH-bucketed approximate top-k w/ in-plan recall check (similarity scale path)") { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id").isin(0, 1, 2))
    // 32 tables (vs the operator default 16): at sf0.001 the corpus is
    // only 150 vectors, so per-query recall variance is highest there —
    // doubling the OR-amplification keeps every query above the bound
    // at every scale factor.
    val lsh = Similarity.lshTopK(
      corpus = emb, queries = queries,
      idCol = "vec_id", vecCol = "embedding", k = 5,
      nPlanes = 4, nTables = 32)
    val exact = Similarity.bruteForceTopK(
      corpus = emb, queries = queries,
      idCol = "vec_id", vecCol = "embedding", k = 5)
    val overlap = lsh.select(col("query_id"), col("corpus_id"))
      .join(exact.select(col("query_id"), col("corpus_id")),
        Seq("query_id", "corpus_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hit"))
    queries.select(col("vec_id").as("query_id"))
      .join(overlap, Seq("query_id"), "left")
      .select(col("query_id"), lit(5).as("k"),
        (coalesce(col("n_hit"), lit(0L)) >= 3).as("recall_ok"))
      .orderBy("query_id")
  }

  /** IVF ANN end-to-end (train → assign → probe-pruned search), self-
    * verifying like [[qSimLsh]]: per-query recall vs the in-plan
    * brute-force truth, emitted as a hash-checked contract boolean.
    * Centroids are trained in-plan (distributed Lloyd's, deterministic
    * lowest-id seeds) so the whole IVF lifecycle runs under the gate.
    */
  val qSimIvf: QueryDef = QueryDef.sql(
    "q_sim_ivf",
    """SELECT vec_id AS query_id, 5 AS k, true AS recall_ok
      |FROM embeddings WHERE vec_id IN (0, 1, 2)
      |ORDER BY query_id""".stripMargin,
    doc = "IVF ANN train/assign/search w/ in-plan recall check (similarity scale path)") { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id").isin(0, 1, 2))
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
      k = 8, iters = 3)
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding",
      cents, "centroid_id", "centroid_vec")
    val ivf = Similarity.ivfTopK(assigned, queries, "vec_id", "embedding",
      cents, "centroid_id", "centroid_vec", k = 5, nProbe = 3)
    val exact = Similarity.bruteForceTopK(
      corpus = emb, queries = queries,
      idCol = "vec_id", vecCol = "embedding", k = 5)
    val overlap = ivf.select(col("query_id"), col("corpus_id"))
      .join(exact.select(col("query_id"), col("corpus_id")),
        Seq("query_id", "corpus_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hit"))
    queries.select(col("vec_id").as("query_id"))
      .join(overlap, Seq("query_id"), "left")
      .select(col("query_id"), lit(5).as("k"),
        (coalesce(col("n_hit"), lit(0L)) >= 3).as("recall_ok"))
      .orderBy("query_id")
  }

  /** Int8 quantization contract over the whole corpus: reconstruction
    * error is provably ≤ scale/2 (round picks the nearest multiple) and
    * payloads stay in [−127, 127] — mathematical invariants, so the
    * oracle states them as constants; the plan proves them over every
    * vector via the native quantizer.
    */
  val qQuantize: QueryDef = QueryDef.sql(
    "q_quantize",
    """SELECT count(*) AS n, true AS err_ok, true AS range_ok
      |FROM embeddings""".stripMargin,
    doc = "int8 quantization w/ in-plan error-bound proof (embedding storage scale path)") { (s, dir) =>
    import graft.sim.Quantization
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        Quantization.quantize(col("embedding")).as("z"))
      .select(col("vec_id"), col("embedding"),
        col("z.scale").as("scale"), col("z.q").as("q"))
    e.select(
        Quantization.reconstructionError(col("embedding"), col("q"),
          col("scale")).as("err"),
        col("scale"),
        coalesce(array_max(transform(col("q"),
          x => abs(x.cast("int")))), lit(0)).as("maxq"))
      .agg(count(lit(1)).as("n"),
        coalesce(expr("bool_and(err <= scale / 2 + 1e-12)"), lit(true))
          .as("err_ok"),
        coalesce(expr("bool_and(maxq <= 127)"), lit(true)).as("range_ok"))
  }

  /** Quantized ANN vs exact float truth, self-verifying like
    * [[qSimLsh]]: int8 cosine top-5 recovers ≥ 3 of the exact top-5
    * per query, emitted as the hash-checked contract.
    */
  val qSimQuantized: QueryDef = QueryDef.sql(
    "q_sim_quantized",
    """SELECT vec_id AS query_id, 5 AS k, true AS recall_ok
      |FROM embeddings WHERE vec_id IN (0, 1, 2)
      |ORDER BY query_id""".stripMargin,
    doc = "int8-quantized cosine top-k w/ in-plan recall check (similarity storage scale path)") { (s, dir) =>
    import graft.sim.Quantization
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id").isin(0, 1, 2))
    val quant = Quantization.quantizedTopK(
      corpus = emb, queries = queries,
      idCol = "vec_id", vecCol = "embedding", k = 5)
    val exact = Similarity.bruteForceTopK(
      corpus = emb, queries = queries,
      idCol = "vec_id", vecCol = "embedding", k = 5)
    val overlap = quant.select(col("query_id"), col("corpus_id"))
      .join(exact.select(col("query_id"), col("corpus_id")),
        Seq("query_id", "corpus_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hit"))
    queries.select(col("vec_id").as("query_id"))
      .join(overlap, Seq("query_id"), "left")
      .select(col("query_id"), lit(5).as("k"),
        (coalesce(col("n_hit"), lit(0L)) >= 3).as("recall_ok"))
      .orderBy("query_id")
  }

  /** Group centroids ([[graft.sim.Similarity.meanVectorComponents]]):
    * per-label element-wise mean embedding — the class-prototype /
    * k-means-M-step primitive, decimal-exact so it hash-verifies.
    * 10 labels × 64 dims at every SF; the oracle zips `unnest` with
    * `generate_subscripts` (DuckDB's positional explode) and states
    * the identical decimal-sum mean.
    */
  val qEmbedCentroid: QueryDef = QueryDef.sql(
    "q_embed_centroid",
    """SELECT label, CAST(pos AS INT) AS pos, n,
      |  CAST(round(CAST(s AS DOUBLE) / n, 6) AS DOUBLE) AS mean
      |FROM (
      |  SELECT label, pos, count(*) AS n,
      |    sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(27,10))) AS s
      |  FROM (SELECT label, unnest(embedding) AS v,
      |          generate_subscripts(embedding, 1) - 1 AS pos
      |        FROM embeddings)
      |  GROUP BY 1, 2)
      |ORDER BY label, pos""".stripMargin,
    doc = "per-label embedding centroids, decimal-exact (class prototypes)") { (s, dir) =>
    graft.sim.Similarity.meanVectorComponents(
        t(s, dir, "embeddings"), "label", "embedding")
      .select(col("label"), col("pos"), col("n"),
        round(col("mean"), 6).cast("double").as("mean"))
      .orderBy("label", "pos")
  }

  /** RRF hybrid retrieval ([[graft.text.HybridRetrieval]]): BM25 over
    * documents (the q_text_bm25 topic probe, depth 20) fused with
    * dense cosine top-20 around embedding 0 by reciprocal-rank
    * fusion, doc_id ≡ vec_id. The oracle restates BOTH arms (each
    * already oracle-proven alone) and the fixed two-term fusion
    * arithmetic; ranks are integers so fusion parity reduces to the
    * per-arm score parity.
    */
  val qHybridRrf: QueryDef = QueryDef.sql(
    "q_hybrid_rrf",
    """WITH d AS (SELECT doc_id, trim(text) AS t FROM documents),
      |stats AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN t = '' THEN 0
      |      ELSE len(string_split_regex(t, '\s+')) END) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) AS avgdl
      |  FROM d),
      |tk AS (
      |  SELECT doc_id, len(string_split_regex(t, '\s+')) AS dl,
      |    unnest(string_split_regex(t, '\s+')) AS token
      |  FROM d WHERE t <> ''),
      |q AS (SELECT * FROM tk WHERE token IN ('vector', 'stream', 'merge')),
      |tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM q GROUP BY 1, 2, 3),
      |dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM q GROUP BY 1),
      |scored AS (
      |  SELECT t.doc_id,
      |    sum(CAST(
      |      ln(1.0 + (CAST(s.n AS DOUBLE) - f.df + 0.5)
      |          / (CAST(f.df AS DOUBLE) + 0.5))
      |        * (CAST(t.tf AS DOUBLE) * (1.2 + 1.0))
      |        / (CAST(t.tf AS DOUBLE) + 1.2 *
      |           ((1.0 - 0.75) + 0.75 * CAST(t.dl AS DOUBLE) / s.avgdl))
      |      AS DECIMAL(20,10))) AS s
      |  FROM tf t JOIN dfq f USING (token) CROSS JOIN stats s
      |  GROUP BY t.doc_id),
      |sparse AS (
      |  SELECT doc_id AS id,
      |    row_number() OVER (ORDER BY raw DESC, doc_id) AS sparse_rank
      |  FROM (SELECT doc_id, CAST(s AS DOUBLE) AS raw FROM scored
      |        ORDER BY raw DESC, doc_id LIMIT 20)),
      |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |qv AS (SELECT v AS w FROM e WHERE vec_id = 0),
      |dense AS (
      |  SELECT vec_id AS id,
      |    row_number() OVER (ORDER BY cosine DESC, vec_id) AS dense_rank
      |  FROM (SELECT e.vec_id,
      |          list_dot_product(e.v, qv.w) /
      |            (sqrt(list_dot_product(e.v, e.v)) *
      |             sqrt(list_dot_product(qv.w, qv.w))) AS cosine
      |        FROM e CROSS JOIN qv WHERE e.vec_id != 0
      |        ORDER BY cosine DESC, e.vec_id LIMIT 20))
      |SELECT coalesce(s.id, de.id) AS doc_id, s.sparse_rank, de.dense_rank,
      |  CAST(round(coalesce(1.0 / (60 + s.sparse_rank), 0.0) +
      |             coalesce(1.0 / (60 + de.dense_rank), 0.0), 6) AS DOUBLE)
      |    AS rrf
      |FROM sparse s FULL OUTER JOIN dense de ON s.id = de.id
      |ORDER BY doc_id""".stripMargin,
    doc = "reciprocal-rank fusion of BM25 + dense cosine retrieval (RAG hybrid)") { (s, dir) =>
    graft.text.HybridRetrieval.rrfFuse(
        t(s, dir, "documents"), "doc_id", "text",
        Seq("vector", "stream", "merge"),
        t(s, dir, "embeddings"), "vec_id", "embedding",
        queryId = 0L, depth = 20, k = 60)
  }

  /** Retrieval evaluation — MRR, recall@10, nDCG@10 per query, the
    * metric layer every retrieval stack (BM25 / ANN / hybrid RRF)
    * needs to be tuned against. Queries are every 50th vector;
    * relevance is label equality (the corpus's ground-truth
    * clustering); ranking is the exact cosine ordering with id
    * tiebreak. Discount terms 1/log2(rank+1) — only 10 distinct
    * values — are decimal-cast BEFORE summing so DCG/IDCG are
    * order-independent exact sums; the final divisions run in double
    * on identical inputs.
    *
    * Scale shape: queries broadcast against one corpus scan (the
    * bruteForceTopK pattern); metrics are one aggregation per query
    * over its ranked list; the IDCG helper joins a 10-row broadcast
    * range — output O(|queries|).
    */
  val qRetrievalEval: QueryDef = QueryDef.sql(
    "q_retrieval_eval",
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
      |      FROM e WHERE vec_id % 50 = 0 AND vec_id < 2000),
      |s AS (
      |  SELECT q.query_id, q.qlabel, e.vec_id AS corpus_id,
      |    CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS rel,
      |    CASE WHEN sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)) = 0
      |      THEN 0.0
      |      ELSE list_dot_product(e.v, q.qv) /
      |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) END
      |      AS cosine
      |  FROM e CROSS JOIN q WHERE e.vec_id != q.query_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |        ORDER BY cosine DESC, corpus_id) AS rnk FROM s),
      |m AS (SELECT query_id, qlabel,
      |        min(CASE WHEN rel = 1 THEN rnk END) AS first_rel,
      |        sum(CASE WHEN rel = 1 AND rnk <= 10 THEN 1 ELSE 0 END) AS rel10,
      |        sum(rel) AS r_total,
      |        sum(CASE WHEN rel = 1 AND rnk <= 10
      |              THEN CAST(1.0 / log2(rnk + 1) AS DECIMAL(18,12))
      |              ELSE CAST(0 AS DECIMAL(18,12)) END) AS dcg
      |      FROM r GROUP BY 1, 2),
      |i AS (SELECT query_id,
      |        sum(CAST(1.0 / log2(k + 1) AS DECIMAL(18,12))) AS idcg
      |      FROM m CROSS JOIN range(1, 11) t(k)
      |      WHERE k <= least(r_total, 10) GROUP BY 1)
      |SELECT m.query_id, m.qlabel AS label,
      |  CAST(round(1.0 / first_rel, 6) AS DOUBLE) AS rr,
      |  CAST(round(rel10 / CAST(r_total AS DOUBLE), 6) AS DOUBLE) AS recall10,
      |  CAST(round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) AS DOUBLE) AS ndcg10
      |FROM m JOIN i USING (query_id)
      |ORDER BY query_id""".stripMargin,
    doc = "retrieval metrics: MRR, recall@10, nDCG@10 vs label ground truth (similarity eval)") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    // FIXED-size benchmark query set (≤ 40 queries at any scale
    // factor): an eval harness whose query count grows with the
    // corpus does queries × corpus work — 100× measured it at
    // quadratic (245 s); bounded queries make the scan linear in the
    // corpus, which is what a retrieval benchmark means
    val q = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("embedding").as("qv"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qlabel"),
        when(col("label") === col("qlabel"), 1).otherwise(0).as("rel"),
        Similarity.cosine(col("embedding"), col("qv")).as("cosine"),
        col("vec_id").as("corpus_id"))
    val r = scored.withColumn("rnk",
      row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("corpus_id"))))
    val zeroDec = lit(BigDecimal(0)).cast("decimal(18,12)")
    val m = r.groupBy("query_id", "qlabel").agg(
      min(when(col("rel") === 1, col("rnk"))).as("first_rel"),
      sum(when(col("rel") === 1 && col("rnk") <= 10, 1).otherwise(0)).as("rel10"),
      sum(col("rel")).as("r_total"),
      sum(when(col("rel") === 1 && col("rnk") <= 10,
        (lit(1.0) / log2(col("rnk") + 1)).cast("decimal(18,12)"))
        .otherwise(zeroDec)).as("dcg"))
    val ks = s.range(1, 11).select(col("id").as("k"))
    val idcg = m.select(col("query_id"), col("r_total"))
      .crossJoin(broadcast(ks))
      .filter(col("k") <= least(col("r_total"), lit(10)))
      .groupBy("query_id")
      .agg(sum((lit(1.0) / log2(col("k") + 1)).cast("decimal(18,12)"))
        .as("idcg"))
    m.join(idcg, "query_id")
      .select(col("query_id"), col("qlabel").as("label"),
        round(lit(1.0) / col("first_rel"), 6).cast("double").as("rr"),
        round(col("rel10") / col("r_total").cast("double"), 6)
          .cast("double").as("recall10"),
        round(col("dcg").cast("double") / col("idcg").cast("double"), 6)
          .cast("double").as("ndcg10"))
      .orderBy("query_id")
  }

  /** Product-quantization ANN end-to-end
    * ([[graft.sim.ProductQuantization]]): per-subspace codebooks
    * trained in-plan (m = 8 × ksub = 16 on 64-dim vectors → 8 dims per
    * subspace), corpus encoded to 8 codes/vector, queries answered by
    * ADC lookup-table join + bounded exact re-rank (the production PQ
    * serving shape) — self-verifying recall contract vs the in-plan
    * brute-force truth like [[qSimLsh]]/[[qSimIvf]]. The memory face
    * of ANN (32× compression) next to IVF's compute face. Measured
    * overlap@5 is ≥ 4/5 at sf0.001/0.01/0.1; the contract gates ≥ 3.
    */
  val qSimPq: QueryDef = QueryDef.sql(
    "q_sim_pq",
    """SELECT vec_id AS query_id, 5 AS k, true AS recall_ok
      |FROM embeddings WHERE vec_id IN (0, 1, 2)
      |ORDER BY query_id""".stripMargin,
    doc = "product-quantization ANN w/ in-plan recall check (similarity scale path)") { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id").isin(0, 1, 2))
    val pq = ProductQuantization.pqTopK(emb, queries, "vec_id", "embedding",
      k = 5, m = 8, ksub = 16, iters = 3, rerank = 100)
    val exact = Similarity.bruteForceTopK(
      corpus = emb, queries = queries,
      idCol = "vec_id", vecCol = "embedding", k = 5)
    val overlap = pq.select(col("query_id"), col("corpus_id"))
      .join(exact.select(col("query_id"), col("corpus_id")),
        Seq("query_id", "corpus_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hit"))
    queries.select(col("vec_id").as("query_id"))
      .join(overlap, Seq("query_id"), "left")
      .select(col("query_id"), lit(5).as("k"),
        (coalesce(col("n_hit"), lit(0L)) >= 3).as("recall_ok"))
      .orderBy("query_id")
  }

  /** Embedding covariance matrix ([[Similarity.covarianceMatrix]]) —
    * PCA precursor and the distribution-drift monitor for embedding
    * pipelines: all d(d+1)/2 upper-triangle entries of cov(X) over the
    * corpus, O(d²) output however many vectors. The oracle recomputes
    * E[x_i x_j] − E[x_i]E[x_j] with the identical decimal-cast sums
    * (generate_subscripts ≡ posexplode+1 for the 1-based dim index).
    */
  val qEmbedCovariance: QueryDef = QueryDef.sql(
    "q_embed_covariance",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |x AS (
      |  SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x
      |  FROM e),
      |nn AS (SELECT count(*) AS n FROM e),
      |m AS (
      |  SELECT i, CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) AS sx
      |  FROM x GROUP BY i),
      |p AS (
      |  SELECT a.i AS i, b.i AS j,
      |    CAST(sum(CAST(a.x * b.x AS DECIMAL(30,12))) AS DOUBLE) AS sxy
      |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY a.i, b.i)
      |SELECT p.i, p.j,
      |  CAST(round(p.sxy / nn.n - (ma.sx / nn.n) * (mb.sx / nn.n), 8)
      |    AS DOUBLE) AS cov
      |FROM p CROSS JOIN nn
      |JOIN m ma ON ma.i = p.i
      |JOIN m mb ON mb.i = p.j
      |ORDER BY p.i, p.j""".stripMargin,
    doc = "embedding covariance matrix, exact decimal sums (embedding analytics)") { (s, dir) =>
    Similarity.covarianceMatrix(t(s, dir, "embeddings"), "vec_id", "embedding")
      .select(col("i"), col("j"),
        round(col("cov"), 8).cast("double").as("cov"))
      .orderBy("i", "j")
  }

  /** Dominant principal component of the embedding corpus by power
    * iteration ([[graft.sim.Pca.powerIteration]]) over the in-plan
    * covariance matrix: 8 matvec steps, each one d²-row join + d-row
    * aggregate, the corpus touched exactly once (for the covariance).
    * The oracle replays the covariance AND all 8 iterations as a CTE
    * chain with the identical decimal-cast sums — distributed linear
    * algebra under a bit-exact gate.
    */
  val qPcaPower: QueryDef = {
    val iters = 8
    // MATERIALIZED: y_i is referenced twice (norm + update) and sym 8
    // times — inlined CTEs would re-expand the chain exponentially
    val step = (i: Int) => {
      val prev = s"v${i - 1}"
      s"""y$i AS MATERIALIZED (
        |  SELECT s.i, CAST(sum(CAST(s.cov * $prev.v AS DECIMAL(28,14)))
        |    AS DOUBLE) AS y
        |  FROM sym s JOIN $prev ON $prev.j = s.j GROUP BY s.i),
        |n$i AS MATERIALIZED (
        |  SELECT sqrt(CAST(sum(CAST(y * y AS DECIMAL(30,14))) AS DOUBLE))
        |    AS nrm FROM y$i),
        |v$i AS MATERIALIZED (
        |  SELECT i AS j, y / nrm AS v FROM y$i CROSS JOIN n$i)"""
        .stripMargin
    }
    QueryDef.sql(
      "q_pca_power",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |x AS (
        |  SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x
        |  FROM e),
        |nn AS (SELECT count(*) AS n FROM e),
        |m AS (
        |  SELECT i, CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) AS sx
        |  FROM x GROUP BY i),
        |p AS (
        |  SELECT a.i AS i, b.i AS j,
        |    CAST(sum(CAST(a.x * b.x AS DECIMAL(30,12))) AS DOUBLE) AS sxy
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY a.i, b.i),
        |cm AS (
        |  SELECT p.i, p.j,
        |    p.sxy / nn.n - (ma.sx / nn.n) * (mb.sx / nn.n) AS cov
        |  FROM p CROSS JOIN nn
        |  JOIN m ma ON ma.i = p.i
        |  JOIN m mb ON mb.i = p.j),
        |sym AS MATERIALIZED (
        |  SELECT i, j, cov FROM cm
        |  UNION ALL SELECT j AS i, i AS j, cov FROM cm WHERE i <> j),
        |v0 AS MATERIALIZED (SELECT DISTINCT j, 1.0 AS v FROM sym),
        |${(1 to iters).map(step).mkString(",\n")}
        |SELECT v$iters.j AS i,
        |  CAST(round(v$iters.v, 6) AS DOUBLE) AS loading,
        |  CAST(round(n$iters.nrm, 6) AS DOUBLE) AS eigenvalue
        |FROM v$iters CROSS JOIN n$iters
        |ORDER BY i""".stripMargin,
      doc = "dominant PCA component via power iteration, oracle-replayed (embedding analytics)") { (s, dir) =>
      val cov = Similarity.covarianceMatrix(
        t(s, dir, "embeddings"), "vec_id", "embedding")
      Pca.powerIteration(cov, iters = iters)
        .select(col("i"),
          round(col("loading"), 6).cast("double").as("loading"),
          round(col("eigenvalue"), 6).cast("double").as("eigenvalue"))
        .orderBy("i")
    }
  }

  /** IVF × PQ composed serving path
    * ([[ProductQuantization.ivfPqTopK]]) — the production three-tier
    * funnel: coarse cells prune the corpus to nProbe/kCoarse of its
    * rows, ADC scans only those cells' compressed codes, exact cosine
    * re-ranks the bounded shortlist. Contract: recall@10 ≥ 0.9 per
    * query vs the in-plan brute-force truth (the verdict-prescribed
    * bar), emitted as the hash-checked boolean like
    * [[qSimLsh]]/[[qSimIvf]]/[[qSimPq]].
    */
  val qSimIvfPq: QueryDef = QueryDef.sql(
    "q_sim_ivfpq",
    """SELECT vec_id AS query_id, 10 AS k, true AS recall_ok
      |FROM embeddings WHERE vec_id IN (0, 1, 2)
      |ORDER BY query_id""".stripMargin,
    doc = "IVF-prune -> PQ-scan -> exact re-rank ANN w/ recall@10 >= 0.9 contract (similarity scale path)") { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id").isin(0, 1, 2))
    val got = ProductQuantization.ivfPqTopK(emb, queries,
      "vec_id", "embedding", k = 10, kCoarse = 8, nProbe = 4,
      m = 16, ksub = 16, iters = 3, rerank = 200)
    val exact = Similarity.bruteForceTopK(
      corpus = emb, queries = queries,
      idCol = "vec_id", vecCol = "embedding", k = 10)
    val overlap = got.select(col("query_id"), col("corpus_id"))
      .join(exact.select(col("query_id"), col("corpus_id")),
        Seq("query_id", "corpus_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hit"))
    queries.select(col("vec_id").as("query_id"))
      .join(overlap, Seq("query_id"), "left")
      .select(col("query_id"), lit(10).as("k"),
        (coalesce(col("n_hit"), lit(0L)) >= 9).as("recall_ok"))
      .orderBy("query_id")
  }

  /** The PERSISTED IVF × PQ index lifecycle as a gate contract:
    * build on the head of the corpus, incrementally append the tail
    * ([[graft.sim.IvfPqIndex.append]] — frozen centroids + codebooks,
    * two partitioned appends, idempotent per id per tier), then
    * search the servable four-table index. Truth is brute-force
    * top-10 over the FULL corpus, so the appended vectors must be
    * reachable through both tiers for recall@10 ≥ 0.9 to hold; a
    * replayed append must add nothing or the code tier double-counts
    * ADC terms and ranks drift.
    */
  val qSimIvfPqIndex: QueryDef = QueryDef.sql(
    "q_sim_ivfpq_index",
    """SELECT vec_id AS query_id, 10 AS k, true AS recall_ok
      |FROM embeddings WHERE vec_id IN (0, 1, 2)
      |ORDER BY query_id""".stripMargin,
    doc = "persisted IVF x PQ index: build -> incremental append -> search w/ recall@10 >= 0.9 (similarity scale path)") { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    val n = emb.count()
    val base = emb.filter(col("vec_id") < n - 20)
    val tail = emb.filter(col("vec_id") >= n - 20)
    val whDir = java.nio.file.Files.createTempDirectory("ivfpq_gate")
    val wh = new graft.store.Warehouse(s, whDir.toString)
    try {
      IvfPqIndex.build(wh, "ann", base, "vec_id", "embedding",
        kCoarse = 8, m = 16, ksub = 16, iters = 3)
      IvfPqIndex.append(wh, "ann", tail, "vec_id", "embedding")
      IvfPqIndex.append(wh, "ann", tail, "vec_id", "embedding") // replay: no-op
      val queries = emb.filter(col("vec_id").isin(0, 1, 2))
      val got = IvfPqIndex.search(wh, "ann", queries, "vec_id", "embedding",
        k = 10, nProbe = 4, rerank = 200)
      val exact = Similarity.bruteForceTopK(
        corpus = emb, queries = queries,
        idCol = "vec_id", vecCol = "embedding", k = 10)
      val overlap = got.select(col("query_id"), col("corpus_id"))
        .join(exact.select(col("query_id"), col("corpus_id")),
          Seq("query_id", "corpus_id"))
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hit"))
      queries.select(col("vec_id").as("query_id"))
        .join(overlap, Seq("query_id"), "left")
        .select(col("query_id"), lit(10).as("k"),
          (coalesce(col("n_hit"), lit(0L)) >= 9).as("recall_ok"))
        .orderBy("query_id")
        // pin the (3-row) verdict in block storage so the temp
        // warehouse can be deleted before the lazy result escapes —
        // without this every gate/sweep run leaked a populated
        // four-table index directory into /tmp
        .localCheckpoint(eager = true)
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      val walk = Files.walk(whDir)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close() // Files.walk holds a directory-stream handle
    }
  }

  val all: Seq[QueryDef] = Seq(qSimTopK, qSimLsh, qSimIvf, qQuantize,
    qSimQuantized, qEmbedCentroid, qHybridRrf, qRetrievalEval,
    qEmbedCovariance, qSimPq, qPcaPower, qSimIvfPq, qSimIvfPqIndex)
}
