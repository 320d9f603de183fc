package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for ANN (Jégou et al., TPAMI'11) — the
  * memory-scale path past int8: each unit-normalized vector is split
  * into `m` subvectors, each subvector encoded as the id of its
  * nearest per-subspace centroid (k-means, `ksub` codes), so a d-dim
  * float32 vector compresses to m small ints (64× at d=64, m=4 vs
  * float32). Search is ADC (asymmetric distance computation): the
  * query stays exact, each corpus vector is scored as
  * Σ_s ⟨q_s, c_{s,code_s}⟩ — a per-query lookup table of m·ksub dot
  * products joined against the code table.
  *
  * Everything runs in COMPONENT form (id, sub, q, x) — plain codegen
  * arithmetic + groupBy, no higher-order array functions on the hot
  * path: assignment distance is one (sub,q)-keyed join and a
  * sum-aggregate; centroid update is one group-by mean with
  * decimal-exact sums (repartition-stable codebooks); the ADC scan
  * shuffles the code table once on (sub, cid) against a broadcast
  * lookup table. Only the m·ksub·dsub centroid components are ever
  * broadcast; nothing corpus-sized reaches the driver.
  */
object ProductQuantization {

  /** Unit-normalized component rows (id, sub, q, x): dimension p of
    * the vector maps to subspace sub = p·m/d, in-subspace offset
    * q = p − sub·(d/m). d must be divisible by m.
    */
  def components(df: DataFrame, idCol: String, vecCol: String,
      m: Int): DataFrame = {
    val nrm = Similarity.norm(col(vecCol))
    df.select(col(idCol).as("id"), col(vecCol).as("__v"),
        when(nrm === 0, lit(1.0)).otherwise(nrm).as("__n"))
      .select(col("id"), col("__n"), size(col("__v")).as("__d"),
        posexplode(col("__v")).as(Seq("p", "__xf")))
      .select(col("id"),
        ((col("p") * m) / col("__d")).cast("int").as("sub"),
        (col("p") - ((col("p") * m) / col("__d")).cast("int") *
          (col("__d") / m).cast("int")).as("q"),
        (col("__xf").cast("double") / col("__n")).as("x"))
  }

  /** Per-subspace k-means codebook: component rows (sub, cid, q, c).
    * Seeds: the subvectors of the `ksub` lowest ids (deterministic);
    * then `iters` rounds of assign (argmin L2², cid tie-break) +
    * decimal-exact mean update. A code that loses all members drops
    * out (standard Lloyd's; [[Similarity.trainCentroids]] precedent).
    *
    * Training runs on at most `trainCap` vectors (the trainCap lowest
    * ids — deterministic, and a no-op below the cap, so gate-SF
    * results are bit-identical to uncapped training): codebooks are
    * k-means cells in tiny d/m-dim subspaces that converge on a
    * bounded sample (FAISS trains on ~[30, 256]·k points per
    * codebook), while full-corpus fitting made codebook training the
    * dominant cost of the entire IVF×PQ funnel at replica scale —
    * O(iters · N · ksub) for zero recall gain. Encoding
    * ([[encodeCodes]]) still covers every vector.
    *
    * Takes the raw vector table (not component rows) so the per-round
    * assignment runs through the [[graft.plans.PqEncode]] kernel — a
    * pure projection — instead of the component × codebook distance
    * join; the component form is built once, capped, for the mean
    * update only.
    */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int,
      ksub: Int, iters: Int, trainCap: Int = 1 << 15): DataFrame = {
    // ids with at least one component row — the join form's training
    // population (a null/empty vector never reaches posexplode)
    val ids = df.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(idCol).as("id")).distinct()
      .orderBy(col("id")).limit(trainCap)
    val capped = df.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .join(broadcast(ids), Seq("id"))
      .localCheckpoint(eager = true)
    val tcomp = components(capped, "id", "__v", m)
      .localCheckpoint(eager = true)
    // lowest-ksub ids, then a ksub-row ranking window (never corpus-wide)
    val seeds = tcomp.select(col("id")).distinct()
      .orderBy(col("id")).limit(ksub)
      .withColumn("cid", row_number().over(Window.orderBy(col("id"))) - 1)
    var cents = tcomp.join(broadcast(seeds), Seq("id"))
      .select(col("sub"), col("cid"), col("q"), col("x").as("c"))
      .localCheckpoint()
    (0 until iters).foreach { _ =>
      val assign = encodeCodes(capped, "id", "__v", m, cents)
      cents = tcomp.join(assign, Seq("id", "sub"))
        .groupBy(col("sub"), col("cid"), col("q"))
        .agg((sum(col("x").cast("decimal(27,10)")).cast("double") /
          count(lit(1)).cast("double")).as("c"))
        .localCheckpoint()
    }
    cents
  }

  /** Nearest-codebook assignment, component form — the REFERENCE
    * formulation the kernel path is spec-pinned against
    * (ProductQuantizationSpec's parity suite): the component ×
    * codebook (sub, q) join fans N·d·ksub distance rows through two
    * exchanges, so production paths use [[encodeCodes]] instead. The
    * argmin is `min_by(cid, struct(__d2, cid))` — decimal-exact
    * per-term rounding, null-first struct ordering, cid tie-break —
    * exactly the semantics [[graft.plans.PqKernel]] reproduces.
    */
  def assignCodes(comp: DataFrame, cents: DataFrame): DataFrame = {
    val d2 = comp.join(broadcast(cents), Seq("sub", "q"))
      .select(col("id"), col("sub"), col("cid"),
        ((col("x") - col("c")) * (col("x") - col("c"))).as("__sq"))
      .groupBy(col("id"), col("sub"), col("cid"))
      .agg(sum(col("__sq").cast("decimal(27,12)")).as("__d2"))
    d2.groupBy(col("id"), col("sub"))
      .agg(min_by(col("cid"), struct(col("__d2"), col("cid"))).as("cid"))
      .select(col("id"), col("sub"), col("cid"))
  }

  /** Codebook component rows a kernel can be built from, collected
    * with a loud bound: m·ksub·(d/m) rows by construction (thousands);
    * anything bigger was handed the wrong table.
    */
  private val MaxBookRows = 1 << 22

  /** Nearest-codebook assignment as ONE pure projection: (id, sub,
    * cid), bit-identical to [[assignCodes]] over
    * `components(df, idCol, vecCol, m)` (see [[graft.plans.PqEncode]]
    * for the decimal-parity argument; ProductQuantizationSpec pins
    * it), but with no component explode, no N·d·ksub distance rows
    * and no exchanges — the codebooks ride one broadcast and the
    * codes fall out of the scan stage. Assumes unique ids, like every
    * ANN path here (a duplicate id was degenerate in the join form
    * too: both rows' components merged into one distance sum).
    */
  def encodeCodes(df: DataFrame, idCol: String, vecCol: String, m: Int,
      cents: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val spark = df.sparkSession
    val rows = cents.select(col("sub").cast("int"), col("cid").cast("int"),
        col("q").cast("int"), col("c").cast("double"))
      .limit(MaxBookRows + 1).collect()
    if (rows.isEmpty) // join-form parity: empty codebooks → empty codes
      return df.filter(lit(false)).select(col(idCol).as("id"),
        lit(0).as("sub"), lit(0).as("cid"))
    require(rows.length <= MaxBookRows,
      s"encodeCodes: codebook table exceeds $MaxBookRows component " +
        "rows — this is not a books table")
    val bcast = graft.plans.PqKernel.fromRows(spark, rows)
    df.select(col(idCol).as("id"),
        explode(ColumnBridge.column(graft.plans.PqEncode(
          ColumnBridge.expression(col(vecCol)), bcast, m))).as("__sc"))
      .select(col("id"), col("__sc.sub").as("sub"),
        col("__sc.cid").as("cid"))
  }

  /** ADC top-k: per query one m·ksub dot-product lookup table
    * (broadcast), one (sub, cid)-keyed join against the code table,
    * one (query, corpus) sum — approx cosine since inputs are
    * unit-normalized. Ties break by corpus id.
    */
  def adcTopK(codes: DataFrame, cents: DataFrame, queryComp: DataFrame,
      k: Int): DataFrame = {
    val dt = queryComp.select(col("id").as("query_id"), col("sub"),
        col("q"), col("x"))
      .join(cents, Seq("sub", "q"))
      .select(col("query_id"), col("sub"), col("cid"),
        (col("x") * col("c")).as("__p"))
      .groupBy(col("query_id"), col("sub"), col("cid"))
      .agg(sum(col("__p").cast("decimal(27,12)")).as("__dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id"))
    codes.join(broadcast(dt), Seq("sub", "cid"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("__dot")).cast("double").as("score"))
      .select(col("query_id"), col("id").as("corpus_id"), col("score"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF × PQ composed serving path — the 100 TB ANN shape: the IVF
    * coarse quantizer prunes the corpus to each query's `nProbe`
    * nearest cells, the ADC scan runs over ONLY those cells' PQ codes
    * (compressed — m small ints per vector), and the exact-cosine
    * re-rank touches just the bounded shortlist. Cell pruning cuts
    * compute by ~nProbe/kCoarse, PQ cuts the scanned bytes ~32×, and
    * the full-precision vectors are read for `rerank` rows per query
    * — the three-tier funnel (prune → compressed scan → exact) every
    * production vector store serves from.
    *
    * Codes encode the RAW unit-normalized vectors, not IVF residuals
    * (Jégou et al. §IV residual encoding buys ADC accuracy the exact
    * re-rank here already provides; raw codes let one code table
    * serve any probe set). Per-query cell restriction is a broadcast
    * join of the (query, cell) probe pairs — |queries| × nProbe rows
    * — against the cell-tagged code table; at rest the same
    * restriction is the `centroid_id` partition prune
    * [[IvfIndex.search]] performs. Recall is contract-gated vs exact
    * top-k in q_sim_ivfpq.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, kCoarse: Int = 8, nProbe: Int = 3,
      m: Int = 4, ksub: Int = 16, iters: Int = 3,
      rerank: Int = 50): DataFrame = {
    val cents = Similarity.trainCentroids(corpus, idCol, vecCol,
      kCoarse, iters)
    val cellOf = Similarity.ivfAssign(corpus, idCol, vecCol,
        cents, "centroid_id", "centroid_vec")
      .select(col(idCol).as("id"), col("centroid_id"))
    val books = train(corpus, idCol, vecCol, m, ksub, iters)
    val codes = encodeCodes(corpus, idCol, vecCol, m, books)
      .join(cellOf, Seq("id"))
    // each query's nProbe nearest cells — |queries| × nProbe pairs
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("__psim").desc, col("centroid_id"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .crossJoin(broadcast(cents))
      .withColumn("__psim",
        Similarity.cosine(col("__qv"), col("centroid_vec")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("centroid_id"))
    // per-query ADC lookup table (m · ksub dots), broadcast
    val dt = components(queries, idCol, vecCol, m)
      .select(col("id").as("query_id"), col("sub"), col("q"), col("x"))
      .join(books, Seq("sub", "q"))
      .select(col("query_id"), col("sub"), col("cid"),
        (col("x") * col("c")).as("__p"))
      .groupBy(col("query_id"), col("sub"), col("cid"))
      .agg(sum(col("__p").cast("decimal(27,12)")).as("__dot"))
    val wS = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id"))
    val shortlist = codes
      .join(broadcast(probes), Seq("centroid_id"))
      .join(broadcast(dt), Seq("query_id", "sub", "cid"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("__dot")).cast("double").as("score"))
      .select(col("query_id"), col("id").as("corpus_id"), col("score"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("__rn", row_number().over(wS))
      .filter(col("__rn") <= math.max(k, rerank))
      .select(col("query_id"), col("corpus_id"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("__cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    shortlist.join(c, Seq("corpus_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("corpus_id"),
        Similarity.cosine(col("__cv"), col("__qv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Full PQ lifecycle: train codebooks on the corpus, encode it,
    * ADC-shortlist `rerank` candidates per query, then EXACT-cosine
    * re-rank the shortlist — the production PQ serving shape (ADC is
    * the cheap scan; the shortlist is bounded, so the exact pass
    * touches `rerank` full vectors per query, not the corpus).
    * `queries` is bounded (user-ask-sized).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 4, ksub: Int = 16,
      iters: Int = 3, rerank: Int = 50): DataFrame = {
    val cents = train(corpus, idCol, vecCol, m, ksub, iters)
    val codes = encodeCodes(corpus, idCol, vecCol, m, cents)
    val shortlist = adcTopK(codes, cents,
      components(queries, idCol, vecCol, m), math.max(k, rerank))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("__cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    shortlist.select(col("query_id"), col("corpus_id"))
      .join(c, Seq("corpus_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("corpus_id"),
        Similarity.cosine(col("__cv"), col("__qv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
