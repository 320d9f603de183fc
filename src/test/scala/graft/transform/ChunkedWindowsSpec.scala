package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[ChunkedWindows.lag1]] must equal the plain per-key window lag on
  * every row — including across chunk boundaries, with many chunks,
  * few keys, null source values, and single-row keys.
  */
class ChunkedWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def refLag(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("k").orderBy(col("o"), col("id"))
    df.withColumn("pv", lag(col("v"), 1).over(w))
      .withColumn("po", lag(col("o"), 1).over(w))
  }

  test("chunked lag ≡ per-key window lag, boundaries included") {
    val rnd = new scala.util.Random(20260815L)
    // 3 keys × 2000 rows: with 32 shuffle partitions each key spans
    // MANY chunks, so every stitch path is exercised
    val rows = (0 until 6000).map { i =>
      (i.toLong, s"k${i % 3}", rnd.nextInt(100000).toLong,
        rnd.nextDouble())
    }
    val df = rows.toDF("id", "k", "o", "v")
    val got = ChunkedWindows.lag1(df, Seq("k"), Seq("o", "id"),
        Map("v" -> "pv", "o" -> "po"))
      .select("id", "pv", "po")
    val want = refLag(df).select("id", "pv", "po")
    val joined = got.as("g").join(want.as("w"), Seq("id"))
    assert(joined.count() === 6000L)
    val bad = joined.filter(
      not(col("g.pv") <=> col("w.pv")) || not(col("g.po") <=> col("w.po")))
    assert(bad.count() === 0L,
      "chunked lag diverged:\n" + bad.limit(5).collect().mkString("\n"))
  }

  test("null source values lag through; single-row keys get null") {
    val df = Seq(
      (1L, "a", 1L, Option(1.0)),
      (2L, "a", 2L, None: Option[Double]), // null value must lag to id 3
      (3L, "a", 3L, Option(3.0)),
      (4L, "b", 1L, Option(9.0))           // lone row: pv null
    ).toDF("id", "k", "o", "v")
    val got = ChunkedWindows.lag1(df, Seq("k"), Seq("o", "id"),
        Map("v" -> "pv"))
      .select("id", "pv").as[(Long, Option[Double])].collect().toMap
    assert(got(1L) === None)
    assert(got(2L) === Some(1.0))
    assert(got(3L) === None) // predecessor's value IS null
    assert(got(4L) === None)
  }

  test("globalRowNumber ≡ per-key window row_number") {
    val rnd = new scala.util.Random(42L)
    val df = (0 until 5000).map { i =>
      (i.toLong, s"k${i % 3}", rnd.nextInt(1000000).toLong, rnd.nextDouble())
    }.toDF("id", "k", "o", "v")
    val got = ChunkedWindows.globalRowNumber(df, Seq("k"), Seq("o", "id"),
      "grn").select("id", "grn")
    val w = Window.partitionBy("k").orderBy(col("o"), col("id"))
    val want = df.withColumn("grn", row_number().over(w).cast("long"))
      .select("id", "grn")
    assert(got.as("g").join(want.as("w"), Seq("id"))
      .filter(col("g.grn") =!= col("w.grn")).count() === 0L)
  }

  test("lagsUpTo ≡ per-key window lag(k) for k = 1..7, thin keys included") {
    val rnd = new scala.util.Random(7L)
    // k0/k1 span many chunks; k2 has FEWER rows than maxLag (3 rows,
    // 7 lags) — the thin-key shape a naive chunk-carry would corrupt
    val rows = (0 until 4000).map { i =>
      (i.toLong, s"k${i % 2}", rnd.nextInt(100000).toLong,
        BigDecimal(rnd.nextInt(1000)) / 100)
    } ++ Seq(
      (9001L, "k2", 5L, BigDecimal(1)),
      (9002L, "k2", 9L, BigDecimal(2)),
      (9003L, "k2", 2L, BigDecimal(3)))
    val df = rows.toDF("id", "k", "o", "x")
      .withColumn("x", col("x").cast("decimal(18,6)"))
    val got = ChunkedWindows.lagsUpTo(df, Seq("k"), Seq("o", "id"),
      "x", maxLag = 7, "xl")
    val w = Window.partitionBy("k").orderBy(col("o"), col("id"))
    val want = (1 to 7).foldLeft(df) { (d, j) =>
      d.withColumn(s"xl$j", lag(col("x"), j).over(w))
    }
    val cmp = got.as("g").join(want.as("w"), Seq("id"))
    assert(cmp.count() === df.count())
    val bad = (1 to 7).map(j =>
      not(col(s"g.xl$j") <=> col(s"w.xl$j"))).reduce(_ || _)
    assert(cmp.filter(bad).count() === 0L,
      "lagsUpTo diverged from the window form")
  }

  test("runningSum ≡ per-key decimal window cumsum; rejects doubles") {
    val rnd = new scala.util.Random(11L)
    val df = (0 until 5000).map { i =>
      (i.toLong, s"k${i % 3}", rnd.nextInt(1000000).toLong,
        BigDecimal(rnd.nextInt(20000) - 10000) / 100)
    }.toDF("id", "k", "o", "dev")
      .withColumn("dev", col("dev").cast("decimal(24,10)"))
    val got = ChunkedWindows.runningSum(df, Seq("k"), Seq("o", "id"),
      "dev", "s").select("id", "s")
    val w = Window.partitionBy("k").orderBy(col("o"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("s", sum(col("dev")).over(w)).select("id", "s")
    // bit-identical decimals, and the same widened sum type
    assert(got.schema("s").dataType === want.schema("s").dataType)
    assert(got.as("g").join(want.as("w"), Seq("id"))
      .filter(not(col("g.s") <=> col("w.s"))).count() === 0L)
    val dbl = df.withColumn("dev", col("dev").cast("double"))
    val e = intercept[IllegalArgumentException] {
      ChunkedWindows.runningSum(dbl, Seq("k"), Seq("o", "id"), "dev", "s")
    }
    assert(e.getMessage.contains("DECIMAL"))
  }

  test("plan is balanced: window exchange hashes on the chunk id, not the raw key") {
    val df = (0 until 1000).map(i =>
      (i.toLong, s"k${i % 2}", i.toLong, i.toDouble)).toDF("id", "k", "o", "v")
    val plan = graft.ops.EngineOps.explain(
      ChunkedWindows.lag1(df, Seq("k"), Seq("o", "id"), Map("v" -> "pv")),
      "formatted")
    // the CORPUS-sized window exchange (the streamed side of the
    // bridge join — first exchange in plan order) must include __pid
    // in its hash key: hashing on the raw key alone is exactly the
    // 5-task skew this helper exists to kill. Raw-key hashes are
    // legal only in the boundary branch, which is P×|keys| rows and
    // sits under the BroadcastExchange.
    val hashKeys = raw"hashpartitioning\(([^)]*)\)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(hashKeys.nonEmpty, "expected a window exchange:\n" +
      plan.take(2000))
    assert(hashKeys.head.contains("__pid"),
      s"corpus window exchange missing __pid chunk key: $hashKeys\n" +
        plan.take(2000))
  }

  test("bridges are aggregates: the corpus is window-sorted exactly once") {
    // round 10 built the boundary branch as a FILTER of the windowed
    // frame; column pruning de-canonicalized the branches and Spark
    // planned TWO corpus window exchanges (2–3.6× at 10×). With
    // aggregate bridges each helper plans exactly two Window nodes:
    // the corpus-chunk window + the tiny P×|keys| boundary roll.
    val df = (0 until 1000).map(i =>
      (i.toLong, s"k${i % 2}", i.toLong, i.toDouble)).toDF("id", "k", "o", "v")
    val plans = Seq(
      "lag1" -> ChunkedWindows.lag1(
        df, Seq("k"), Seq("o", "id"), Map("v" -> "pv")),
      "globalRowNumber" -> ChunkedWindows.globalRowNumber(
        df, Seq("k"), Seq("o", "id"), "rn"),
      "runningSum" -> ChunkedWindows.runningSum(
        df.withColumn("x", col("v").cast("decimal(18,6)")),
        Seq("k"), Seq("o", "id"), "x", "s"))
    for ((name, d) <- plans) {
      val plan = graft.ops.EngineOps.explain(d, "formatted")
      val nWindows = raw"\(\d+\) Window".r.findAllIn(plan).length
      assert(nWindows === 2,
        s"$name: expected corpus window + boundary roll (2 Window " +
          s"nodes), got $nWindows:\n${plan.take(2500)}")
    }
  }

  test("high-cardinality keys fail loudly instead of OOMing the driver") {
    val df = (0 until 6000).map(i =>
      (i.toLong, s"user$i", i.toLong, i.toDouble)).toDF("id", "k", "o", "v")
    spark.conf.set("spark.graft.chunkedWindows.maxSampledKeys", "100")
    try {
      val e = intercept[IllegalStateException] {
        ChunkedWindows.lag1(df, Seq("k"), Seq("o", "id"), Map("v" -> "pv"))
      }
      assert(e.getMessage.contains("maxSampledKeys"), e.getMessage)
      // low-cardinality keys stay untouched under the same cap
      val ok = (0 until 1000).map(i =>
        (i.toLong, s"k${i % 3}", i.toLong, i.toDouble)).toDF("id", "k", "o", "v")
      ChunkedWindows.lag1(ok, Seq("k"), Seq("o", "id"), Map("v" -> "pv"))
    } finally spark.conf.unset("spark.graft.chunkedWindows.maxSampledKeys")
  }

  test("NULL order columns fail loudly instead of silently diverging") {
    // the bridge max_by and the window sort disagree on NULL order
    // values — the requirement was documented on lag1; the bounds
    // sketch reads the order columns anyway, so a sampled NULL must
    // fail with guidance, not hand the next chunk a wrong bridge row
    val df = (0 until 500).map { i =>
      (i.toLong, s"k${i % 3}",
        if (i % 7 == 0) None: Option[Long] else Some(i.toLong), i.toDouble)
    }.toDF("id", "k", "o", "v")
    val e = intercept[IllegalArgumentException] {
      ChunkedWindows.lag1(df, Seq("k"), Seq("o", "id"), Map("v" -> "pv"))
    }
    assert(e.getMessage.contains("NULL") &&
      e.getMessage.contains("'o'"), e.getMessage)
    // the same guard protects every helper sharing chunkBounds
    val e2 = intercept[IllegalArgumentException] {
      ChunkedWindows.globalRowNumber(df, Seq("k"), Seq("o", "id"), "rn")
    }
    assert(e2.getMessage.contains("NULL"), e2.getMessage)
  }

  test("pre-sampled bounds are honored: one sketch serves chained helpers") {
    val df = (0 until 3000).map(i =>
      (i.toLong, s"k${i % 3}", i.toLong, i.toDouble)).toDF("id", "k", "o", "v")
    val bounds = ChunkedWindows.chunkBounds(df, Seq("k"), Seq("o", "id"))
    val viaBounds = ChunkedWindows.lag1(df, Seq("k"), Seq("o", "id"),
      Map("v" -> "pv"), bounds = Some(bounds)).select("id", "pv")
    val fresh = ChunkedWindows.lag1(df, Seq("k"), Seq("o", "id"),
      Map("v" -> "pv")).select("id", "pv")
    assert(viaBounds.as("g").join(fresh.as("w"), Seq("id"))
      .filter(not(col("g.pv") <=> col("w.pv"))).count() === 0L)
  }

  test("no whole-corpus materialization: lag1 plan has no checkpointed scan") {
    // round-9 pinned chunk ids via eager localCheckpoint — a full
    // fact-table copy into block storage per time-series query at
    // 100 TB, and a lineage truncation. The bounds-broadcast chunk id
    // must keep the parquet/LocalRelation scan visible in the plan.
    val df = (0 until 1000).map(i =>
      (i.toLong, s"k${i % 2}", i.toLong, i.toDouble)).toDF("id", "k", "o", "v")
    for (d <- Seq(
        ChunkedWindows.lag1(df, Seq("k"), Seq("o", "id"), Map("v" -> "pv")),
        ChunkedWindows.globalRowNumber(df, Seq("k"), Seq("o", "id"), "rn"),
        ChunkedWindows.runningSum(
          df.withColumn("x", col("v").cast("decimal(18,6)")),
          Seq("k"), Seq("o", "id"), "x", "s"))) {
      val plan = graft.ops.EngineOps.explain(d, "formatted")
      assert(!plan.contains("ExistingRDD"),
        s"chunked window still materializes the corpus:\n${plan.take(1500)}")
    }
  }
}
