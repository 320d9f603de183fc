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
  private[sim] def statsTable(name: String) = s"${name}__stats"
  private[sim] def retrainSrcTable(name: String) = s"${name}__retrain_src"
  private[sim] def nextName(name: String) = s"${name}__next"
  private[sim] val CommittedMark = "_committed"
  private[sim] val SwapReadyMark = "_swap_ready"
  private[sim] val IvfTiers = Seq("__centroids", "__cells", "__stats")

  /** Train coarse centroids and land both index tables. Returns the
    * number of (non-empty) cells. Also stamps a 1-row `__stats` table
    * with the BUILD-TIME corpus size, mean coarse quantization
    * distortion (mean 1 − centroid_sim) and max cell fraction — the
    * baseline [[staleness]] compares the drifting index against.
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
    val stats = currentStats(warehouse, name)
      .select(col("n").as("built_n"),
        col("mean_dist").as("built_mean_dist"),
        col("max_cell_frac").as("built_max_cell_frac"))
    warehouse.createTable(statsTable(name), stats.schema,
      ifExists = "replace")
    warehouse.append(statsTable(name), stats)
    warehouse.read(centroidsTable(name)).count()
  }

  /** (n, mean 1 − centroid_sim, max cell fraction) over the CURRENT
    * cells tier — one aggregation over the stored assignments; the
    * full vectors are never re-scored.
    */
  private def currentStats(warehouse: Warehouse, name: String): DataFrame = {
    val cells = warehouse.read(cellsTable(name))
    val perCell = cells.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("__cn"),
        sum(lit(1.0) - col("centroid_sim")).as("__cd"))
    perCell.agg(
      sum(col("__cn")).as("n"),
      (sum(col("__cd")) / sum(col("__cn"))).as("mean_dist"),
      (max(col("__cn")).cast("double") / sum(col("__cn"))).as("max_cell_frac"))
  }

  /** Drift report for a frozen-centroid index: one row comparing the
    * build-time baseline with the current cells tier. `append` assigns
    * new vectors to STALE structure — as the ingested distribution
    * drifts, vectors crowd into few badly-fitting cells, which shows
    * up as (a) mean coarse distortion rising above the build-time mean
    * and (b) cell-size skew — and probe-pruned recall decays with no
    * error anywhere. `stale` = distortion ratio > 1.5 OR max-cell
    * fraction ratio > 3; thresholds are deliberately coarse (drift is
    * a trend, not an edge) and both raw ratios are in the row for
    * callers with their own policy. The remedy is [[retrain]].
    */
  def staleness(warehouse: Warehouse, name: String): DataFrame = {
    require(warehouse.tableExists(statsTable(name)),
      s"$name has no __stats baseline — (re)build the index to stamp one")
    val built = warehouse.read(statsTable(name))
    currentStats(warehouse, name).crossJoin(broadcast(built))
      .select(
        col("built_n"), col("n").as("current_n"),
        col("built_mean_dist"), col("mean_dist").as("current_mean_dist"),
        (col("mean_dist") / col("built_mean_dist")).as("dist_ratio"),
        col("built_max_cell_frac"),
        col("max_cell_frac").as("current_max_cell_frac"),
        (col("max_cell_frac") / col("built_max_cell_frac")).as("skew_ratio"))
      .withColumn("stale",
        col("dist_ratio") > 1.5 || col("skew_ratio") > 3.0)
  }

  /** Re-fit the index from its own cells tier WITHOUT a serving
    * outage: snapshot the vectors, build the new generation ASIDE
    * (`<name>__next__*` — the live tables never stop answering
    * [[search]] during the minutes-to-hours of training), then swap
    * each tier in with the crash-safe rename dance. Phases and their
    * crash contracts:
    *
    *  1. SNAPSHOT — the vector set lands in `__retrain_src`
    *     ATOMICALLY ([[Warehouse.replaceTable]] + a `_committed`
    *     sidecar riding the same rename): the snapshot either exists
    *     complete or not at all; a legacy/partial snapshot without
    *     the sidecar is re-taken from the still-intact cells tier.
    *  2. BUILD ASIDE — [[build]] into `<name>__next`; a crash leaves
    *     the old index untouched and serving, and a rerun rebuilds
    *     the aside tables from the pinned snapshot.
    *  3. SWAP — a `_swap_ready` sidecar (listing the tiers) is
    *     stamped on the snapshot, then each tier promotes via
    *     [[Warehouse.promoteTable]] (renames, milliseconds). ONLY
    *     in this window do [[search]]/[[append]] refuse (mixed
    *     generations are possible after a mid-swap crash); rerunning
    *     retrain finishes the remaining renames — already-promoted
    *     tiers are skipped — and drops the snapshot+marker.
    *
    * [[append]] additionally refuses for the whole retrain (any
    * snapshot present): vectors appended after the snapshot was
    * taken would be silently dropped by the swap. Returns the new
    * cell count.
    */
  def retrain(warehouse: Warehouse, name: String, idCol: String,
      vecCol: String, k: Int, iters: Int = 5): Long = {
    retrainLifecycle(warehouse, name, idCol, vecCol, IvfTiers) { src =>
      build(warehouse, nextName(name), warehouse.read(src), idCol,
        vecCol, k, iters)
      ()
    }
    warehouse.read(centroidsTable(name)).count()
  }

  /** The shared snapshot → build-aside → swap driver (see [[retrain]];
    * [[IvfPqIndex.retrain]] reuses it with two extra tiers). Rerunning
    * IS the recovery procedure for every phase.
    */
  private[sim] def retrainLifecycle(warehouse: Warehouse, name: String,
      idCol: String, vecCol: String, tiers: Seq[String])(
      buildAside: String => Unit): Unit = {
    val src = retrainSrcTable(name)
    if (!swapPending(warehouse, name)) {
      if (!warehouse.tableExists(src) ||
          warehouse.readTableFile(src, CommittedMark).isEmpty) {
        // no committed snapshot: (re)take one atomically from the
        // cells tier, which nothing before the swap ever touches. The
        // snapshot RECORDS this retrain's tier set — the phase-1 twin
        // of the swap marker's authority below: a build-aside crash
        // of a five-tier IVF×PQ retrain resumed via the base type's
        // retrain would otherwise silently rebuild and swap only
        // three tiers over a five-tier index.
        val full = warehouse.read(cellsTable(name))
          .select(col(idCol), col(vecCol))
        warehouse.replaceTable(src, full,
          Map(CommittedMark ->
            s"at=${System.currentTimeMillis};tiers=${tiers.mkString(",")}"))
      }
      val committed = warehouse.readTableFile(src, CommittedMark)
        .getOrElse("")
      val snapTiers = committed.split(";").find(_.startsWith("tiers="))
        .map(_.stripPrefix("tiers=").split(",").toSeq.filter(_.nonEmpty))
      // compare as SETS: the tier list is a vocabulary, not an order —
      // two index types staging the same tiers in a different order
      // are the same retrain, not a conflict
      require(snapTiers.forall(_.toSet == tiers.toSet),
        s"retrain of $name is in flight for tier set " +
          s"[${snapTiers.get.mkString(",")}] but this retrain would " +
          s"build [${tiers.mkString(",")}] — rerun the index type that " +
          "started it (its snapshot and staged tables are intact)")
      if (snapTiers.isEmpty)
        // legacy snapshot from before tier recording: it cannot vouch
        // for WHICH index type started the retrain — proceed (the
        // finishSwap marker checks still refuse a subset promotion)
        // but say so, loudly, instead of silently resuming
        System.err.println(
          s"[graft] retrain of $name resumes a snapshot that predates " +
            s"tier recording — cannot verify it was taken for " +
            s"[${tiers.mkString(",")}]; the swap-marker staged-table " +
            "cross-check remains the backstop")
      buildAside(src)
      warehouse.writeTableFile(src, SwapReadyMark, tiers.mkString(","))
    }
    finishSwap(warehouse, name, tiers)
  }

  /** Every tier name any index type in this module stages — the
    * vocabulary [[finishSwap]] validates recorded markers against.
    */
  private[sim] val KnownTiers: Set[String] =
    Set("__centroids", "__cells", "__stats", "__books", "__codes")

  /** Promote every still-staged tier RECORDED IN THE MARKER, then
    * drop the snapshot (taking the marker with it). Idempotent: a
    * tier whose `__next` table is gone was promoted by a previous
    * (crashed) attempt.
    *
    * The marker content is trustworthy (`writeTableFile` lands it
    * atomically — complete or absent, never truncated) and is the
    * AUTHORITY on what to promote: an operator finishing a crashed
    * IvfPqIndex swap via `IvfIndex.retrain` must still promote all
    * FIVE recorded tiers, not the caller's three — promoting a
    * caller-static subset would drop the marker and serve a
    * mixed-generation index with every guard cleared. Two refusals
    * keep that impossible: the recorded list must cover the caller's
    * tiers (else the marker belongs to something else entirely) and
    * must draw only from [[KnownTiers]] (a legacy pre-atomic
    * truncated marker like `__centroids,__ce` refuses loudly instead
    * of half-promoting).
    */
  private def finishSwap(warehouse: Warehouse, name: String,
      tiers: Seq[String]): Unit = {
    val src = retrainSrcTable(name)
    val recorded = warehouse.readTableFile(src, SwapReadyMark)
      .getOrElse(sys.error(s"finishSwap: no $SwapReadyMark marker on $src"))
      .split(",").toSeq.filter(_.nonEmpty)
    require(recorded.nonEmpty && recorded.forall(KnownTiers.contains) &&
        tiers.forall(recorded.contains),
      s"finishSwap: swap marker on $src records tiers " +
        s"[${recorded.mkString(",")}] which do not cover this index's " +
        s"[${tiers.mkString(",")}] within the known tier vocabulary — " +
        "corrupt or foreign marker; refusing to finish a partial swap. " +
        "Inspect the staged __next tables before clearing the marker.")
    // a legacy truncation that happened to cut AT a comma boundary
    // passes the vocabulary check — but it cannot hide the staged
    // tables it dropped from the list: any staged KnownTier NOT in
    // the recorded list is proof the marker under-records the swap
    val unrecorded = (KnownTiers -- recorded.toSet)
      .filter(t => warehouse.tableExists(nextName(name) + t))
    require(unrecorded.isEmpty,
      s"finishSwap: staged tables exist for tiers " +
        s"[${unrecorded.toSeq.sorted.mkString(",")}] that the swap " +
        s"marker on $src does not record — truncated marker; refusing " +
        "to promote a subset. Stamp the complete tier list (rerun the " +
        "owning index type's retrain) before finishing the swap.")
    recorded.foreach { t =>
      val staged = nextName(name) + t
      if (warehouse.tableExists(staged))
        warehouse.promoteTable(staged, name + t)
    }
    warehouse.dropTable(src)
  }

  private[sim] def swapPending(warehouse: Warehouse, name: String): Boolean =
    warehouse.tableExists(retrainSrcTable(name)) &&
      warehouse.readTableFile(retrainSrcTable(name), SwapReadyMark).isDefined

  /** Serving guard: refuse only while a retrain SWAP is in flight —
    * after a mid-swap crash the live tiers may span two generations.
    * During snapshot/build-aside the old index is intact and serves.
    */
  private[sim] def requireNoPendingSwap(warehouse: Warehouse,
      name: String): Unit =
    require(!swapPending(warehouse, name),
      s"index $name crashed mid-retrain-swap (marker $SwapReadyMark on " +
        s"${retrainSrcTable(name)}) — rerun retrain(...) to finish the " +
        "swap before serving")

  /** Append guard: refuse for the WHOLE retrain — vectors appended
    * after the snapshot was pinned would be dropped by the swap.
    */
  private[sim] def requireNoPendingRetrain(warehouse: Warehouse,
      name: String): Unit =
    require(!warehouse.tableExists(retrainSrcTable(name)),
      s"index $name has a retrain in flight (marker " +
        s"${retrainSrcTable(name)} exists) — appends after the snapshot " +
        "would be lost in the swap; finish (rerun) retrain(...) first")

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
    requireNoPendingRetrain(warehouse, name)
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
    *
    * Serve-during-retrain caveat: [[requireNoPendingSwap]] runs at
    * CONSTRUCTION time, but the returned DataFrame is lazy. A search
    * built during the build-aside phase serves the OLD generation —
    * by design — but must finish EXECUTING before the retrain's swap
    * phase fires: the tier renames delete the old generation's files,
    * and a scan still in flight across the swap fails with
    * FileNotFoundException (or, worse, a retried stage could read
    * across generations). Operationally: drain in-flight searches
    * before (re)running [[retrain]]; a search that raced the swap
    * fails loudly and is safe to re-run against the new generation.
    */
  def search(warehouse: Warehouse, name: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireNoPendingSwap(warehouse, name)
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
