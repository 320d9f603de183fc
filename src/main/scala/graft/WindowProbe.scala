package graft

import org.apache.spark.sql.functions._

/** Plan/timing probe for the chunked-window family on a real events
  * table: prints the formatted lag1 plan (exchange-reuse visibility)
  * and wall times per stage. Usage: `runMain graft.WindowProbe <dir>`.
  */
object WindowProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.core.SparkEnv.session(appName = "graft-wprobe",
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("event_id"), col("value"),
        (unix_micros(col("ts"))).as("t"))
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sortCols = Seq("event_type", "t", "event_id")
    time("warm scan")(ev.groupBy("event_type").count().collect())
    time("bounds sample")(
      graft.transform.RangeChunks.sampleBounds(ev, sortCols, 32, 1L))
    time("bounds sample again")(
      graft.transform.RangeChunks.sampleBounds(ev, sortCols, 32, 1L))
    val chunked = time("withChunkId build")(
      graft.transform.RangeChunks.withChunkId(ev, sortCols, 32, "__pid"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("__pid", "event_type").orderBy("t", "event_id")
    time("chunked local window only")(chunked
      .withColumn("pv", lag(col("value"), 1).over(w))
      .groupBy("event_type").agg(count(col("pv"))).collect())
    val l = graft.transform.ChunkedWindows.lag1(ev,
      Seq("event_type"), Seq("t", "event_id"),
      Map("value" -> "pv", "t" -> "pt"))
    println(graft.ops.EngineOps.explain(l, "formatted").take(4000))
    time("warm lag1+agg")(l.groupBy("event_type")
      .agg(count(col("pv"))).collect())
    time("lag1+agg")(l.groupBy("event_type")
      .agg(count(col("pv"))).collect())
    time("bare window ref")(ev.withColumn("pv",
        lag(col("value"), 1).over(Window
          .partitionBy("event_type").orderBy("t", "event_id")))
      .groupBy("event_type").agg(count(col("pv"))).collect())
    spark.stop()
  }
}
