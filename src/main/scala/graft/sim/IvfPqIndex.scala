package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.store.Warehouse

/** Persistent IVF × PQ index — the AT-REST form of
  * [[ProductQuantization.ivfPqTopK]]'s three-tier funnel, built once
  * and served many times (the [[IvfIndex]] lifecycle extended with a
  * compressed code tier):
  *
  *  - `<name>__centroids` — coarse quantizer, k rows;
  *  - `<name>__books`    — PQ codebooks, m · ksub component rows;
  *  - `<name>__codes`    — (id, sub, cid, centroid_id), PARTITIONED
  *    BY `centroid_id`: a probe of nProbe cells is a directory-pruned
  *    read of the COMPRESSED representation only (m small ints per
  *    vector — the tier that makes a 100 TB corpus scannable);
  *  - `<name>__cells`    — the full vectors, also centroid-partitioned
  *    (via [[IvfIndex]]'s layout), read ONLY for the re-rank
  *    shortlist (id-keyed semi-join, `rerank` rows per query).
  *
  * Search never touches an unprobed cell in either tier, and the
  * full-precision tier is touched only shortlist-deep — exactly the
  * I/O shape a disaggregated vector store serves from. Codes encode
  * raw unit-normalized vectors (not residuals): one code table serves
  * any probe set, and the exact re-rank supplies the accuracy
  * residual encoding would buy.
  */
object IvfPqIndex {

  private def booksTable(name: String) = s"${name}__books"
  private def codesTable(name: String) = s"${name}__codes"

  /** The build-time subvector count, derived from the persisted
    * codebooks (`max(sub) + 1`) — never caller-supplied: an `m` that
    * disagreed with the stored layout would mis-split the query
    * vectors, so the (sub, q)→books join would silently produce
    * wrong or missing ADC entries and a degraded shortlist with no
    * error (the exact re-rank masks it while recall quietly decays).
    */
  private def builtM(books: DataFrame): Int =
    books.agg(max(col("sub"))).head.getInt(0) + 1

  /** Build all four tables. Returns (#cells, #codes). */
  def build(wh: Warehouse, name: String, corpus: DataFrame,
      idCol: String, vecCol: String, kCoarse: Int, m: Int,
      ksub: Int = 16, iters: Int = 3): (Long, Long) = {
    val nCells = IvfIndex.build(wh, name, corpus, idCol, vecCol,
      kCoarse, iters)
    val books = ProductQuantization.train(corpus, idCol, vecCol, m,
      ksub, iters)
    wh.createTable(booksTable(name), books.schema, ifExists = "replace")
    wh.append(booksTable(name), books)
    val cellOf = wh.read(s"${name}__cells")
      .select(col(idCol).as("id"), col("centroid_id"))
    val codes = ProductQuantization
      .encodeCodes(corpus, idCol, vecCol, m, books)
      .join(cellOf, Seq("id"))
    wh.createTable(codesTable(name), codes.schema,
      ifExists = "replace", partitionBy = Seq("centroid_id"))
    wh.append(codesTable(name), codes)
    (nCells, wh.read(codesTable(name)).select("id").distinct().count())
  }

  /** Drift report for the compressed index — the coarse tier IS the
    * recall-relevant drift surface (probing picks cells by the frozen
    * centroids; the exact re-rank already absorbs fine-tier
    * quantization error), so this delegates to [[IvfIndex.staleness]]
    * over the shared cells tier.
    */
  def staleness(wh: Warehouse, name: String): DataFrame =
    IvfIndex.staleness(wh, name)

  /** Re-fit ALL FOUR tables (centroids, books, codes, cells) from the
    * index's own full-vector tier — the remedy once [[staleness]]
    * reports drift. Rides [[IvfIndex.retrainLifecycle]] (atomic
    * snapshot → build the new generation ASIDE under `<name>__next` →
    * rename-swap all five tiers): [[search]] keeps answering from the
    * old generation for the whole training and refuses only in the
    * milliseconds-long swap window after a mid-swap crash; [[append]]
    * refuses for the whole retrain (post-snapshot appends would be
    * dropped by the swap); rerunning retrain recovers any phase.
    * Training params are re-specified by the caller (they are also
    * re-derivable: kCoarse from the centroid count, m/ksub from the
    * persisted books). Returns (#cells, #codes).
    */
  def retrain(wh: Warehouse, name: String, idCol: String, vecCol: String,
      kCoarse: Int, m: Int, ksub: Int = 16,
      iters: Int = 3): (Long, Long) = {
    IvfIndex.retrainLifecycle(wh, name, idCol, vecCol,
      IvfIndex.IvfTiers ++ Seq("__books", "__codes")) { src =>
      build(wh, IvfIndex.nextName(name), wh.read(src), idCol, vecCol,
        kCoarse, m, ksub, iters)
      ()
    }
    (wh.read(s"${name}__centroids").count(),
      wh.read(codesTable(name)).select("id").distinct().count())
  }

  /** Fold new vectors into the persisted index incrementally: assign
    * each to its nearest EXISTING centroid, encode with the EXISTING
    * codebooks, and append to the centroid-partitioned codes and
    * cells tables — the archive is never re-read and nothing
    * retrains, so an update costs O(batch × (kCoarse + m·ksub))
    * assignment plus two partitioned appends (the [[IvfIndex.append]]
    * contract extended to the compressed tier; a new vector no longer
    * forces a full rebuild).
    *
    * Idempotent per id PER TIER: the codes append dedups against the
    * codes table's ids and the cells append against the cells
    * table's (both via batch-sized bloom-pruned anti-joins), so a
    * crash between the two appends replays into exactly the missing
    * tier — and because centroid assignment and code assignment are
    * deterministic given the frozen centroids/books, the repaired
    * rows agree with what the surviving tier already holds. Returns
    * the number of vectors appended to the cells tier.
    */
  def append(wh: Warehouse, name: String, newVecs: DataFrame,
      idCol: String, vecCol: String): Long = {
    import graft.store.ScaleJoins
    IvfIndex.requireNoPendingRetrain(wh, name)
    val cents = wh.read(s"${name}__centroids")
    val books = wh.read(booksTable(name))
    val m = builtM(books)
    // per-id idempotence holds across calls via the anti-join below,
    // but duplicate ids INSIDE one batch would pass it and land twice
    // in both tiers, double-counting ADC terms at search time —
    // collapse them first (streaming micro-batches can carry dups)
    val uniqVecs = newVecs.dropDuplicates(idCol)
    val freshC = ScaleJoins.bloomPrunedAntiJoin(
        uniqVecs.select(col(idCol)),
        wh.read(codesTable(name)).select(col("id").as(idCol)),
        Seq(idCol), expectedItems = 1000000L)
      .join(uniqVecs, Seq(idCol))
    val cellOf = Similarity.ivfAssign(freshC, idCol, vecCol,
        cents, "centroid_id", "centroid_vec")
      .select(col(idCol).as("id"), col("centroid_id"))
    val codes = ProductQuantization
      .encodeCodes(freshC, idCol, vecCol, m, books)
      .join(cellOf, Seq("id"))
      .localCheckpoint()
    if (codes.count() > 0L) wh.append(codesTable(name), codes)
    IvfIndex.append(wh, name, uniqVecs, idCol, vecCol)
  }

  /** Probe-pruned ADC search + exact re-rank against the persisted
    * index. The probed cell ids (|queries| × nProbe, driver-bounded
    * like [[IvfIndex.search]]) become an `isin` partition prune on
    * the CODES table; the ADC lookup tables broadcast; the full
    * vectors enter only for the shortlist. The subvector split is
    * derived from the persisted codebooks ([[builtM]]), so a query
    * can never be split differently from the stored codes.
    */
  def search(wh: Warehouse, name: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 2,
      rerank: Int = 50): DataFrame = {
    IvfIndex.requireNoPendingSwap(wh, name)
    val cents = wh.read(s"${name}__centroids")
    val books = wh.read(booksTable(name))
    val m = builtM(books)
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
      .localCheckpoint(eager = true)
    val probedCells = probes.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    // directory-pruned compressed scan: only probed centroid_id=
    // partitions of the codes table are ever listed or read
    val codes = wh.read(codesTable(name))
      .filter(col("centroid_id").isin(probedCells: _*))
    val dt = ProductQuantization.components(queries, idCol, vecCol, m)
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
    val full = wh.read(s"${name}__cells")
      .select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    shortlist.join(full, Seq("corpus_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("corpus_id"),
        Similarity.cosine(col("__cv"), col("__qv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
