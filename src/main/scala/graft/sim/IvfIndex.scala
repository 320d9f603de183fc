package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.{ScaleJoins, Warehouse}

/** Persistent IVF index lifecycle — train once, search many: the
  * missing piece between [[Similarity.trainCentroids]]/[[Similarity.ivfTopK]]
  * (pure DataFrame ops) and a production ANN serving path.
  *
  * Layout: `<name>__centroids` (k rows) and `<name>__cells` — the
  * assigned corpus PARTITIONED BY `centroid_id`, so a probe of
  * `nProbe` cells is a partition-pruned read of exactly those
  * directories (the inverted-file property realized as directory
  * pruning). At 100 TB the cells table is the corpus; a 16-probe
  * search over 4096 cells reads 0.4% of it.
  */
object IvfIndex {

  private def centroidsTable(name: String) = s"${name}__centroids"
  private def cellsTable(name: String) = s"${name}__cells"

  /** Train coarse centroids and land both index tables. Returns the
    * number of (non-empty) cells.
    */
  def build(warehouse: Warehouse, name: String, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, iters: Int = 5): Long = {
    val cents = Similarity.trainCentroids(corpus, idCol, vecCol, k, iters)
    val assigned = Similarity.ivfAssign(corpus, idCol, vecCol,
      cents, "centroid_id", "centroid_vec")
    warehouse.createTable(centroidsTable(name), cents.schema,
      ifExists = "replace")
    warehouse.append(centroidsTable(name), cents)
    warehouse.createTable(cellsTable(name), assigned.schema,
      ifExists = "replace", partitionBy = Seq("centroid_id"))
    warehouse.append(cellsTable(name), assigned)
    warehouse.read(centroidsTable(name)).count()
  }

  /** Fold new vectors into the index incrementally: assign each to
    * its nearest EXISTING centroid and append to the cells table —
    * the archive is never re-read or re-assigned, so an update costs
    * O(batch × k) assignment plus one partitioned append (the same
    * incremental contract as [[graft.dedup.DedupIndex.update]]).
    *
    * Idempotent per id: vectors whose ids already sit in a cell are
    * dropped (bloom-pruned anti-join — the probe is batch-sized no
    * matter how large the index), so crash-replay inserts nothing
    * twice. Ids must be globally unique across updates.
    *
    * Centroids are NOT retrained: appended vectors are exact members
    * of their nearest current cell, but as the ingested distribution
    * drifts from the build-time corpus, recall degrades the standard
    * IVF way — the remedy is a periodic [[build]] retrain, not
    * per-batch centroid movement (which would silently invalidate
    * every already-assigned cell). Returns the number of rows
    * actually appended.
    */
  def append(warehouse: Warehouse, name: String, newVecs: DataFrame,
      idCol: String, vecCol: String): Long = {
    val cents = warehouse.read(centroidsTable(name))
    // the anti-join dedups across CALLS but not within a batch —
    // in-batch duplicate ids would land twice and double-count at
    // search time, so collapse them here to honor per-id idempotence
    val uniqVecs = newVecs.dropDuplicates(idCol)
    val fresh = ScaleJoins.bloomPrunedAntiJoin(
      uniqVecs.select(col(idCol)),
      warehouse.read(cellsTable(name)).select(col(idCol)),
      Seq(idCol), expectedItems = 1000000L)
      .join(uniqVecs, Seq(idCol))
    val assigned = Similarity.ivfAssign(fresh, idCol, vecCol,
      cents, "centroid_id", "centroid_vec")
      // one computation feeds both the count and the append
      .localCheckpoint()
    val n = assigned.count()
    if (n > 0L) warehouse.append(cellsTable(name), assigned)
    n
  }

  /** Probe-pruned search against the persisted index. The union of
    * every query's `nProbe` nearest cells (exactly the probe set
    * [[Similarity.ivfTopK]] will join on — same similarity, same
    * tiebreak) becomes an `isin` filter on the cells scan, which
    * prunes the `centroid_id=` directories before any data is read.
    * The collect is bounded by |queries| × nProbe cell ids — the same
    * broadcast-size contract ivfTopK already places on the query side.
    */
  def search(warehouse: Warehouse, name: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = warehouse.read(centroidsTable(name))
    val cells = warehouse.read(cellsTable(name))
    val probeW = Window.partitionBy(col(idCol))
      .orderBy(col("__psim").desc, col("centroid_id"))
    val probed = queries
      .crossJoin(broadcast(cents))
      .withColumn("__psim",
        Similarity.cosine(col(vecCol), col("centroid_vec")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nProbe)
      .select(col("centroid_id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    Similarity.ivfTopK(
      cells.filter(col("centroid_id").isin(probed: _*)),
      queries, idCol, vecCol, cents, "centroid_id", "centroid_vec",
      k, nProbe)
  }
}
