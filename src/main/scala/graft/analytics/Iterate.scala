package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative fixpoint computation — Spark's replacement for recursive
  * CTEs (SURVEY J9: the reference's `WITH RECURSIVE` dependency query,
  * `postgres_manager.py:714-735`, is non-recursive as written; true
  * recursion becomes a driver loop of joins with an accumulator).
  *
  * Scale: each iteration is one distributed join of the frontier
  * against the (cached) edge set; the accumulator is checkpointed via
  * localCheckpoint every few rounds so the plan doesn't grow unboundedly
  * (lineage blowup is the classic iterative-Spark failure mode).
  */
object Iterate {

  /** Transitive closure of a (src, dst) edge set: all reachable
    * (src, dst) pairs. Stops when an iteration adds no new pairs or
    * after `maxIterations`.
    */
  def transitiveClosure(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 20,
      checkpointEvery: Int = 3): DataFrame = {
    val base = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    var closure = base
    var frontier = base
    var iter = 0
    var done = false
    while (!done && iter < maxIterations) {
      // frontier ⋈ edges: one hop further
      val next = frontier.as("f")
        .join(base.as("e"), col("f.dst") === col("e.src"))
        .select(col("f.src").as("src"), col("e.dst").as("dst"))
        .distinct()
      val fresh = next.join(closure, Seq("src", "dst"), "left_anti")
      val freshCount = fresh.count()
      if (freshCount == 0) done = true
      else {
        closure = closure.unionByName(fresh)
        if ((iter + 1) % checkpointEvery == 0)
          closure = closure.localCheckpoint(eager = true)
        frontier = fresh
      }
      iter += 1
    }
    closure
  }
}
