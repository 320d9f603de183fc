package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.ZoneMaps

/** Live-maintained data skipping: a file stream lands in a parquet
  * layout AND its zone-map manifest refreshes in the same
  * micro-batch — so a reader can prune files against an
  * always-current manifest instead of rebuilding one before each
  * scan. Per batch the cost is the batch write plus
  * [[ZoneMaps.refreshManifest]]'s contract: one filesystem listing
  * and a stat pass over ONLY the files this batch produced; the
  * archive is never re-read.
  *
  * Crash ordering: data first, manifest second. A crash between the
  * two leaves fresh files unmanifested — the NEXT refresh picks them
  * up (refreshManifest keys on the file listing, not on batch ids),
  * so the manifest is eventually consistent and pruning stays
  * conservative in the meantime only if readers treat "file absent
  * from manifest" as "must read". [[prunedScanLive]] does exactly
  * that.
  */
object StreamZoneMaps {

  def manifestPath(dataPath: String): String = s"${dataPath}__zonemap"

  /** Start appending `rows` to `dataPath` with per-batch manifest
    * maintenance over `cols`.
    */
  def maintainedAppend(rows: DataFrame, dataPath: String,
      cols: Seq[String], checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        batch.write.mode("append").parquet(dataPath)
        val mPath = manifestPath(dataPath)
        val fsPath = new org.apache.hadoop.fs.Path(mPath)
        val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val fresh =
          if (fs.exists(fsPath))
            ZoneMaps.refreshManifest(spark, dataPath,
              spark.read.parquet(mPath), cols)
          else ZoneMaps.buildManifest(spark, dataPath, cols)
        // write-then-swap: the new manifest materializes fully in a tmp
        // dir, the live dir renames ASIDE (not deleted), tmp renames
        // into the live name, only then does the old copy go — a rename
        // is atomic on HDFS/local FS, so at every instant the live name
        // either holds a complete manifest or (for the instant between
        // the two renames) is absent, which prunedScanLive treats as
        // "read every file" — conservative, never wrong
        val tmp = new org.apache.hadoop.fs.Path(mPath + "__tmp")
        val old = new org.apache.hadoop.fs.Path(mPath + "__old")
        fresh.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        if (fs.exists(old)) fs.delete(old, true)
        if (fs.exists(fsPath)) fs.rename(fsPath, old)
        fs.rename(tmp, fsPath)
        fs.delete(old, true)
        ()
      }
      .start()

  /** Prune-and-scan against the live manifest, treating files NOT in
    * the manifest (a crash window's stragglers) as must-read — the
    * conservative completion that keeps results exact at every
    * instant.
    */
  def prunedScanLive(spark: org.apache.spark.sql.SparkSession,
      dataPath: String, c: String, lo: Any, hi: Any): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(dataPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mPath = new org.apache.hadoop.fs.Path(manifestPath(dataPath))
    // a missing manifest (maintainer not yet run, or the instant
    // between the swap's two renames) degrades to "every file is
    // unmanifested" → full scan — conservative, never an error
    val (inManifest, keep) =
      if (!fs.exists(mPath)) (Set.empty[String], Seq.empty[String])
      else {
        val manifest = spark.read.parquet(mPath.toString)
        (manifest.select("file").collect().map(_.getString(0))
          .map(ZoneMaps.normFile).toSet,
          ZoneMaps.pruneFiles(manifest, c, lo, hi).map(ZoneMaps.normFile))
      }
    val it = fs.listFiles(hPath, true)
    val unmanifested = scala.collection.mutable.Buffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      val p = ZoneMaps.normFile(f.getPath.toUri.toString)
      if (f.isFile && p.endsWith(".parquet") && !inManifest(p))
        unmanifested += p
    }
    val files = keep ++ unmanifested
    val base =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          spark.read.parquet(dataPath).schema)
      else spark.read.parquet(files: _*)
    base.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
  }
}
