package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-15 optimization probe, batch 2: A/B-times the graph / span /
  * gram-hashing rewrites against inline reconstructions of the
  * pre-round-15 shapes, on a replica directory big enough for per-row
  * work to dominate the scheduler floor (use a 10× ScaleUp replica).
  * Usage: `runMain graft.OptProbe2 <dataDir> [runs]`.
  */
object OptProbe2 {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
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

    // OLD triangles: no materialization anywhere
    def trianglesOld(edges: DataFrame): DataFrame = {
      val e = edges.select(col("u").as("a"), col("v").as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct()
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
      val wedges = oriented.select(col("lo"), col("hi").as("h1"),
          col("khi").as("k1"))
        .join(oriented.select(col("lo"), col("hi").as("h2"),
          col("khi").as("k2")), Seq("lo"))
        .filter(col("k1") < col("k2"))
        .select(col("lo"), col("h1"), col("h2"))
      wedges
        .join(oriented.select(col("lo").as("h1"), col("hi").as("h2")),
          Seq("h1", "h2"), "left_semi")
        .select(least(col("lo"), col("h1"), col("h2")).as("ta"),
          greatest(col("lo"), col("h1"), col("h2")).as("tc"),
          (col("lo") + col("h1") + col("h2")).as("sum3"))
        .select(col("ta").as("a"),
          (col("sum3") - col("ta") - col("tc")).as("b"), col("tc").as("c"))
    }

    timed("triangles OLD (no checkpoint)")(
      trianglesOld(coOccur()).count())
    timed("triangles NEW (checkpointed)")(
      graft.analytics.Iterate.triangles(coOccur(), "u", "v").count())

    // ---------- span dup report: string grams + distinct vs hashed kernel
    def wordGrams(textCol: Column, n: Int): Column =
      transform(
        sequence(lit(1), greatest(size(split(trim(textCol), "\\s+")) - lit(n - 1), lit(1))),
        i => concat_ws(" ", slice(split(trim(textCol), "\\s+"), i, lit(n))))
    def dupSpanReportOld(docs: DataFrame, n: Int): DataFrame = {
      val dg = docs
        .filter(trim(col("text")) =!= "")
        .select(col("doc_id"), explode(wordGrams(col("text"), n)).as("__g"))
        .distinct()
      val dfreq = dg.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
      val per = dg.join(dfreq, Seq("__g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("__df") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
      docs.select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"))
    }
    timed("span_dup_report OLD (string grams)")(
      dupSpanReportOld(t("documents"), 5).count())
    timed("span_dup_report NEW (hashed kernel)")(
      graft.text.SpanDedup.dupSpanReport(t("documents"), "doc_id", "text", 5)
        .count())
    timed("span_remove NEW")(
      graft.text.SpanDedup.removeDuplicateSpans(
        t("documents"), "doc_id", "text", 5).count())

    // ---------- langid: interpreted filter OR-chain vs in_set_count
    def langIdOld(text: Column): Column = {
      val cjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))
      val toks = split(lower(trim(text)), "[\\s\\p{Punct}]+")
      val scores = graft.text.TextAnalysis.LanguageMarkers.map { case (lang, words) =>
        lang -> size(filter(toks,
          tk => words.foldLeft(lit(false))((acc, w) => acc || tk === w)))
      }
      val best = scores.foldLeft(lit(0)) { case (acc, (_, s)) => greatest(acc, s) }
      val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
        when(s === best && best > 0, lit(lang)).otherwise(acc)
      }
      when(cjk.cast("double") / greatest(length(text), lit(1)).cast("double") > 0.05,
        lit("zh")).otherwise(pick)
    }
    timed("langid OLD (interpreted filter)")(
      t("documents").select(langIdOld(col("text")).as("l"))
        .groupBy("l").count().count())
    timed("langid NEW (in_set_count)")(
      t("documents").select(
        graft.text.TextAnalysis.languageId(col("text")).as("l"))
        .groupBy("l").count().count())

    // ---------- dsir: 3-pass string grams vs 1-pass hashed
    timed("dsir NEW")(
      graft.text.Dsir.importanceWeights(
        t("documents"), t("documents").filter(col("doc_id") % 10 === 0),
        "doc_id", "text").count())

    // ---------- decontaminate fuzzy NEW
    timed("decontaminate_fuzzy NEW")(
      graft.text.Decontaminate.containmentReport(
        t("documents").filter(col("doc_id") % 50 =!= 0),
        t("documents").filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 3, threshold = 0.5).count())

    spark.stop()
  }
}
