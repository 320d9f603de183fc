package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-15 optimization probe, batch 3 (second optimization session):
  * stage-level decomposition of the two biggest 100× sweep costs —
  * the triangle family (q_triangles 372 s, q_clustering_coeff 100 s at
  * 100×) and the PQ family (q_sim_pq/ivfpq/ivfpq_index ≈ 134 s) — plus
  * inline A/B of candidate rewrites before they land in src. Usage:
  * `runMain graft.OptProbe3 <dataDir> [runs] [which]`.
  */
object OptProbe3 {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val which = if (args.length > 2) args(2) else "all"
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
    def t(name: String) = Tables.table(spark, dir, name)
    def noop(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    def timed(tag: String)(f: => Long): Unit =
      OptProbe.timeMedian(tag, runs)(f)

    // ---------- co-occurrence edges (the q_triangles upstream), inline
    def coOccur(cap: Int = 40): DataFrame = {
      val b0 = t("events")
        .select(col("user_id"), col("event_type"),
          date_trunc("minute", col("ts")).as("h"))
        .distinct()
      val w = Window.partitionBy(col("event_type"), col("h"))
        .orderBy(col("user_id"))
      val buckets = b0.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= cap).drop("__rn")
      buckets.as("x").join(buckets.as("y"),
          col("x.event_type") === col("y.event_type") &&
            col("x.h") === col("y.h") &&
            col("x.user_id") < col("y.user_id"))
        .select(col("x.user_id").as("u"), col("y.user_id").as("v"))
        .distinct()
    }

    // current triangles (no materialization, no wedge pre-filter)
    def trianglesCur(edges: DataFrame): DataFrame = {
      val e = edges.select(col("u").as("a"), col("v").as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct()
      trianglesDownstream(e)
    }

    def trianglesDownstream(e: DataFrame,
        bloom: Option[Array[Byte]] = None, semiHint: String = "",
        broadcastSemi: Boolean = false): DataFrame = {
      val deg = e.select(explode(array(col("a"), col("b"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).as("deg"))
      val withDeg = e
        .join(deg.select(col("n").as("a"), col("deg").as("da")), Seq("a"))
        .join(deg.select(col("n").as("b"), col("deg").as("db")), Seq("b"))
        .select(col("a"), col("b"),
          struct(col("da").as("d"), col("a").as("i")).as("ka"),
          struct(col("db").as("d"), col("b").as("i")).as("kb"))
      val oriented = withDeg.select(
          when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("lo"),
          when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("hi"),
          when(col("ka") < col("kb"), col("kb")).otherwise(col("ka")).as("khi"))
      val wedges0 = oriented.select(col("lo"), col("hi").as("h1"),
          col("khi").as("k1"))
        .join(oriented.select(col("lo"), col("hi").as("h2"),
          col("khi").as("k2")), Seq("lo"))
        .filter(col("k1") < col("k2"))
        .select(col("lo"), col("h1"), col("h2"))
      // lossless pre-filter: wedge (h1,h2) with k1 < k2 closes iff
      // {h1,h2} is adjacent in e (h1 < h2 in (deg,id) order matches the
      // orientation), so an e-keyed bloom drops non-closing wedges
      // BEFORE the exchange; fps just ride to the exact semi join
      val wedges = bloom match {
        case Some(bytes) => wedges0.filter(call_function(
          "bloom_might_contain", lit(bytes),
          xxhash64(least(col("h1"), col("h2")),
            greatest(col("h1"), col("h2")))))
        case None => wedges0
      }
      val closing = oriented.select(col("lo").as("h1"), col("hi").as("h2"))
      val right =
        if (broadcastSemi) broadcast(closing)
        else if (semiHint.nonEmpty) closing.hint(semiHint)
        else closing
      wedges
        .join(right, Seq("h1", "h2"), "left_semi")
        .select(least(col("lo"), col("h1"), col("h2")).as("ta"),
          greatest(col("lo"), col("h1"), col("h2")).as("tc"),
          (col("lo") + col("h1") + col("h2")).as("sum3"))
        .select(col("ta").as("a"),
          (col("sum3") - col("ta") - col("tc")).as("b"), col("tc").as("c"))
    }

    def trianglesBloom(edges: DataFrame, semiHint: String = "",
        broadcastSemi: Boolean = false, useBloom: Boolean = true): DataFrame = {
      val e = edges.select(col("u").as("a"), col("v").as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct()
        .localCheckpoint(eager = true)
      val m = e.count()
      val bytes = if (useBloom) {
        val bf = e.select(xxhash64(col("a"), col("b")).as("__bk"))
          .stat.bloomFilter("__bk", math.max(m, 1L), 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        Some(bos.toByteArray)
      } else None
      trianglesDownstream(e, bytes, semiHint, broadcastSemi)
    }

    if (which == "all" || which == "tri") {
      timed("edges only (upstream)")(noop(coOccur()))
      timed("triangles CURRENT")(noop(trianglesCur(coOccur())))
      timed("triangles BLOOM+ckpt")(noop(trianglesBloom(coOccur())))
      timed("triangles BLOOM+ckpt+SHJ")(
        noop(trianglesBloom(coOccur(), semiHint = "SHUFFLE_HASH")))
      timed("triangles ckpt+BROADCAST semi")(
        noop(trianglesBloom(coOccur(), broadcastSemi = true,
          useBloom = false)))
      timed("triangles BLOOM+ckpt+BROADCAST semi")(
        noop(trianglesBloom(coOccur(), broadcastSemi = true)))
    }

    // the q_triangles QUERY adds ORDER BY a,b,c: range-partitioner
    // sampling re-executes the sort's child once more, so how the
    // triangle set is materialized before the sort matters
    if (which == "all" || which == "trisort") {
      timed("tri+sort BC semi, plain")(
        noop(trianglesBloom(coOccur(), broadcastSemi = true)
          .orderBy("a", "b", "c")))
      timed("tri+sort BC semi, ckpt before sort")(
        noop(trianglesBloom(coOccur(), broadcastSemi = true)
          .localCheckpoint(eager = true).orderBy("a", "b", "c")))
      timed("tri+sort SHJ semi, plain")(
        noop(trianglesBloom(coOccur(), semiHint = "SHUFFLE_HASH")
          .orderBy("a", "b", "c")))
      timed("tri+sort SHJ semi, ckpt before sort")(
        noop(trianglesBloom(coOccur(), semiHint = "SHUFFLE_HASH")
          .localCheckpoint(eager = true).orderBy("a", "b", "c")))
    }

    // ---------- PQ decomposition (q_sim_pq params: m=8 ksub=16 iters=3)
    if (which == "all" || which == "pq") {
      import graft.sim.{ProductQuantization => PQ, Similarity}
      val emb = t("embeddings")
      val queries = emb.filter(col("vec_id").isin(0, 1, 2))
      timed("pq comp explode only")(
        noop(PQ.components(emb, "vec_id", "embedding", 8)))
      val comp = PQ.components(emb, "vec_id", "embedding", 8).cache()
      comp.count()
      timed("pq train (capped, kernel assign)")(
        noop(PQ.train(emb, "vec_id", "embedding", 8, 16, 3)))
      val books = PQ.train(emb, "vec_id", "embedding", 8, 16, 3)
        .localCheckpoint(eager = true)
      timed("pq join-form assignCodes FULL corpus")(
        noop(PQ.assignCodes(comp, books)))
      timed("pq KERNEL encodeCodes FULL corpus")(
        noop(PQ.encodeCodes(emb, "vec_id", "embedding", 8, books)))
      val codes = PQ.encodeCodes(emb, "vec_id", "embedding", 8, books)
        .localCheckpoint(eager = true)
      timed("pq adcTopK (shortlist)")(noop(PQ.adcTopK(codes, books,
        PQ.components(queries, "vec_id", "embedding", 8), 100)))
      timed("pq full pqTopK")(noop(PQ.pqTopK(emb, queries, "vec_id",
        "embedding", k = 5, m = 8, ksub = 16, iters = 3, rerank = 100)))
      comp.unpersist()
    }

    spark.stop()
  }
}
