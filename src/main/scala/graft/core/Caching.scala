package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for iterative algorithms.
  *
  * `Dataset.unpersist()` only releases CacheManager entries; a
  * `localCheckpoint(eager = true)` instead persists its backing
  * InternalRow RDD directly, which `unpersist()` does not touch. Long-
  * lived drivers running per-batch iterative jobs (connected
  * components, transitive closure) would accrete one orphaned
  * checkpoint RDD per iteration per call — a slow executor-storage
  * leak. This frees the backing RDD explicitly.
  */
object Caching {

  /** Release the storage behind a localCheckpoint'ed frame (no-op for
    * frames that aren't one). Blocking=false: eviction may complete
    * asynchronously; callers never re-read the frame afterwards.
    */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
