package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-15 optimization probe: times candidate variants of the
  * headline-query hot paths side by side (warm, median of N) so every
  * change in OPTIMIZATION_r15.md is justified by a same-host A/B
  * number, not a hunch. Usage: `runMain graft.OptProbe <sfDir> [runs]`.
  */
object OptProbe {

  def timeMedian(tag: String, runs: Int)(f: => Long): Double = {
    f // warm
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted
    val med = times(times.length / 2)
    println(f"[optprobe] $tag%-42s median=$med%.3f s  all=${times.map(t => f"$t%.3f").mkString(",")}")
    med
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.io.Tables

    // ---- 0. baseline: current headline implementations
    def q(name: String): DataFrame =
      SparkEntry.queries(name)(spark, dir)
    for (n <- Seq("q_dedup_minhash", "q_join_inner", "q_sessionize",
        "q1_agg", "q_lag_gaps", "q_window_rank", "q_overlap_semi",
        "q_join_semi")) {
      timeMedian(s"$n (current)", runs)(q(n).count())
    }

    // ---- 1. table-read overhead: schema-supplied read vs footer-sniffing read
    val li = s"$dir/lineitem.parquet"
    val schema = spark.read.parquet(li).schema
    timeMedian("read lineitem: footer-inferred count", runs)(
      spark.read.parquet(li).count())
    timeMedian("read lineitem: schema-supplied count", runs)(
      spark.read.schema(schema).parquet(li).count())
    timeMedian("Tables.table lineitem count (nano probe)", runs)(
      Tables.table(spark, dir, "lineitem").count())

    // ---- 2. q_dedup_minhash variant: materialized shingles
    {
      import graft.dedup.Dedup
      def variant(): Long = {
        val base = Tables.table(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
        val planted = base.filter(col("doc_id") < 20)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(col("text"), lit(" xyzzy")).as("text"))
        val corpus = base.unionByName(planted)
        // materialize (id, shingles) ONCE; band + verify both read it
        val shingled = corpus.select(
          col("doc_id").as("id"),
          Dedup.shingleHashes(spark, col("text"), 3).as("shingles"))
          .localCheckpoint(eager = true)
        val k = 32; val bands = 16; val rowsPerBand = k / bands
        val banded = shingled
          .withColumn("sig", Dedup.minHashColumn(spark, col("shingles"), k))
          .select(col("id"),
            posexplode(Dedup.lshBandKeys(col("sig"), bands, rowsPerBand))
              .as(Seq("band_idx", "band_key")))
        val capped = banded
          .withColumn("__bucket_n", count(lit(1)).over(
            Window.partitionBy(col("band_idx"), col("band_key"))))
          .filter(col("__bucket_n") <= 100)
          .drop("__bucket_n")
        val candidates = capped.select(col("band_idx"), col("band_key"),
            col("id").as("id_a"))
          .join(capped.select(col("band_idx"), col("band_key"),
            col("id").as("id_b")), Seq("band_idx", "band_key"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b")
          .distinct()
        val out = candidates
          .join(shingled.select(col("id").as("id_a"), col("shingles").as("sh_a")),
            Seq("id_a"))
          .join(shingled.select(col("id").as("id_b"), col("shingles").as("sh_b")),
            Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            Dedup.jaccardColumn(spark, col("sh_a"), col("sh_b")).as("jaccard"))
          .filter(col("jaccard") >= 0.9)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).cast("double").as("jaccard"))
          .orderBy("id_a", "id_b")
        val n = out.count()
        graft.core.Caching.freeLocalCheckpoint(shingled)
        n
      }
      timeMedian("q_dedup_minhash (checkpointed shingles)", runs)(variant())
    }

    // ---- 3. q_sessionize variant: max(session_id) instead of countDistinct
    {
      import graft.core.TimeCols.epochUs
      def variant(): Long = {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.table(spark, dir, "events")
          .withColumn("prev_us", lag(epochUs(col("ts")), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_us").isNull ||
              epochUs(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
          .withColumn("session_id",
            sum(col("new_session")).over(
              byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"))
          .agg(max(col("session_id")).as("n_sessions"))
          .orderBy("user_id")
          .count()
      }
      timeMedian("q_sessionize (max ids)", runs)(variant())
    }

    // ---- 4. q_join_inner variant: no pre-agg (straight join then agg)
    {
      def variant(): Long = {
        val c = Tables.table(spark, dir, "customer")
        val o = Tables.table(spark, dir, "orders")
        val l = Tables.table(spark, dir, "lineitem")
        broadcast(c).join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(col("c_mktsegment"), col("o_orderpriority"))
          .agg(
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(20,4)")).cast("double").as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("c_mktsegment"), col("o_orderpriority"))
          .count()
      }
      timeMedian("q_join_inner (no preagg)", runs)(variant())
    }

    // ---- 5. q_join_inner variant: broadcast the orders+customer side
    {
      def variant(): Long = {
        val c = Tables.table(spark, dir, "customer")
        val o = Tables.table(spark, dir, "orders")
        val l = Tables.table(spark, dir, "lineitem")
        val lAgg = l.groupBy(col("l_orderkey"))
          .agg(
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(20,4)")).as("__rev"),
            count(lit(1)).as("__n"))
        broadcast(c).join(o, c("c_custkey") === o("o_custkey"))
          .hint("broadcast")
          .join(lAgg, col("o_orderkey") === lAgg("l_orderkey"))
          .groupBy(col("c_mktsegment"), col("o_orderpriority"))
          .agg(
            sum(col("__rev")).cast("double").as("revenue"),
            sum(col("__n")).as("n_lines"))
          .orderBy(col("c_mktsegment"), col("o_orderpriority"))
          .count()
      }
      timeMedian("q_join_inner (broadcast dims side)", runs)(variant())
    }

    spark.stop()
  }
}
