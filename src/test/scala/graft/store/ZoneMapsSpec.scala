package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Zone-map pruning over a Z-ordered layout: the pruned scan must
  * equal the full scan-plus-filter exactly, while reading only a
  * fraction of the files — on EITHER z-dimension, which is the whole
  * point of pairing the manifest with the Morton layout.
  */
class ZoneMapsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val (path, manifest) = {
    val dir = Files.createTempDirectory("zm").toString + "/t"
    val df = (0 until 20000)
      .map(i => (i.toLong, (i * 37 % 1000).toLong, (i * 91 % 500).toLong))
      .toDF("id", "a", "b")
    ZOrder.writeZOrdered(df, dir, Seq("a", "b"), nFiles = 16)
    val m = ZoneMaps.buildManifest(spark, dir, Seq("a", "b"))
      .localCheckpoint(eager = true)
    (dir, m)
  }

  test("manifest covers every file and row") {
    val nFiles = manifest.count()
    assert(nFiles === 16)
    assert(manifest.agg(sum("n_rows")).head.getLong(0) === 20000L)
  }

  test("pruned scan ≡ full filter on the first z-column, fewer files") {
    val full = spark.read.parquet(path)
      .filter(col("a") >= 100 && col("a") <= 120)
      .select("id").as[Long].collect().toSet
    val kept = ZoneMaps.pruneFiles(manifest, "a", 100L, 120L)
    assert(kept.size < 16, s"no pruning: ${kept.size} files")
    val pruned = ZoneMaps.prunedScan(spark, path, manifest, "a", 100L, 120L)
      .select("id").as[Long].collect().toSet
    assert(pruned === full)
  }

  test("pruned scan ≡ full filter on the second z-column too") {
    val full = spark.read.parquet(path)
      .filter(col("b") >= 470 && col("b") <= 480)
      .select("id").as[Long].collect().toSet
    val kept = ZoneMaps.pruneFiles(manifest, "b", 470L, 480L)
    assert(kept.size < 16, s"no pruning on b: ${kept.size} files")
    val pruned = ZoneMaps.prunedScan(spark, path, manifest, "b", 470L, 480L)
      .select("id").as[Long].collect().toSet
    assert(pruned === full)
  }

  test("empty interval prunes every file and returns an empty typed frame") {
    val out = ZoneMaps.prunedScan(spark, path, manifest, "a", 5000L, 6000L)
    assert(out.count() === 0)
    assert(out.columns.toSet === Set("id", "a", "b"))
  }

  test("incremental refresh stats only new files; dead paths drop") {
    val dir = Files.createTempDirectory("zmr").toString + "/t"
    (0 until 1000).map(i => (i.toLong, i.toLong % 100))
      .toDF("id", "a").repartition(4).write.parquet(dir)
    val m1 = ZoneMaps.buildManifest(spark, dir, Seq("a"))
      .localCheckpoint(eager = true)
    assert(m1.count() === 4)
    // append a wave of new files
    (1000 until 1500).map(i => (i.toLong, 200L + i % 50))
      .toDF("id", "a").repartition(2).write.mode("append").parquet(dir)
    val m2 = ZoneMaps.refreshManifest(spark, dir, m1, Seq("a"))
      .localCheckpoint(eager = true)
    assert(m2.count() === 6)
    assert(m2.agg(sum("n_rows")).head.getLong(0) === 1500L)
    // the refreshed manifest equals a from-scratch build
    val scratch = ZoneMaps.buildManifest(spark, dir, Seq("a"))
    val asSet = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toSeq).toSet
    assert(asSet(m2.select("file", "a_min", "a_max", "n_rows")) ===
      asSet(scratch.select("file", "a_min", "a_max", "n_rows")))
    // pruned read over the refreshed manifest stays exact on new range
    val full = spark.read.parquet(dir)
      .filter(col("a") >= 200 && col("a") <= 210)
      .select("id").as[Long].collect().toSet
    val pruned = ZoneMaps.prunedScan(spark, dir, m2, "a", 200L, 210L)
      .select("id").as[Long].collect().toSet
    assert(pruned === full)
    assert(ZoneMaps.pruneFiles(m2, "a", 200L, 210L).size <= 2)
  }

  test("bloom manifest: equality pruning on a high-cardinality key, no false negatives") {
    val dir = Files.createTempDirectory("zmb").toString + "/t"
    // keys clustered per file: file f holds keys k-f-0..k-f-999
    val rows = for (f <- 0 until 8; i <- 0 until 1000)
      yield (s"k-$f-$i", f.toLong * 1000 + i)
    rows.toDF("key", "v").repartitionByRange(8, col("v"))
      .write.parquet(dir)
    val m = ZoneMaps.buildBloomManifest(spark, dir, "key", 2000L)
      .localCheckpoint(eager = true)
    assert(m.count() === 8)
    // every present key scans exactly and prunes most files
    Seq("k-0-5", "k-3-999", "k-7-0").foreach { k =>
      val full = spark.read.parquet(dir).filter(col("key") === k)
        .select("v").as[Long].collect().toSet
      assert(full.size === 1, s"premise: $k present once")
      val kept = ZoneMaps.pruneFilesMightContain(m, "key", k)
      assert(kept.nonEmpty && kept.size <= 3,
        s"$k kept ${kept.size} of 8 files")
      val pruned = ZoneMaps.prunedScanEq(spark, dir, m, "key", k)
        .select("v").as[Long].collect().toSet
      assert(pruned === full, s"key $k")
    }
    // an absent key usually prunes everything; result stays empty either way
    val none = ZoneMaps.prunedScanEq(spark, dir, m, "key", "absent-key")
    assert(none.count() === 0)
  }

  test("bloom manifest on an INTEGRAL key probes by long — no false negatives") {
    // BloomAggregate hashes numeric keys via putLong; the probe must
    // dispatch to mightContainLong or every file answers NO and the
    // pruned scan silently returns empty
    val dir = Files.createTempDirectory("zmbl").toString + "/t"
    val rows = for (f <- 0 until 8; i <- 0 until 1000)
      yield (f.toLong * 1000 + i, s"v-$f-$i")
    rows.toDF("key", "v").repartitionByRange(8, col("key"))
      .write.parquet(dir)
    val m = ZoneMaps.buildBloomManifest(spark, dir, "key", 2000L)
      .localCheckpoint(eager = true)
    Seq(5L, 3999L, 7000L).foreach { k =>
      val full = spark.read.parquet(dir).filter(col("key") === k)
        .select("v").as[String].collect().toSet
      assert(full.size === 1, s"premise: $k present once")
      val kept = ZoneMaps.pruneFilesMightContain(m, "key", k)
      assert(kept.nonEmpty, s"false negative for integral key $k")
      assert(kept.size <= 3, s"$k kept ${kept.size} of 8 files")
      val pruned = ZoneMaps.prunedScanEq(spark, dir, m, "key", k)
        .select("v").as[String].collect().toSet
      assert(pruned === full, s"key $k")
    }
    assert(ZoneMaps.prunedScanEq(spark, dir, m, "key", 999999L).count() === 0)
  }

  test("bloom probe is distributed: collected payload is file-name-sized") {
    val dir = Files.createTempDirectory("zmd").toString + "/t"
    val rows = for (f <- 0 until 4; i <- 0 until 500)
      yield (s"k-$f-$i", f.toLong * 500 + i)
    rows.toDF("key", "v").repartitionByRange(4, col("v")).write.parquet(dir)
    val m = ZoneMaps.buildBloomManifest(spark, dir, "key", 1000L)
      .localCheckpoint(eager = true)
    // the probe frame projects ONLY the file column — the serialized
    // filters stay on executors; nothing filter-sized crosses to the
    // driver (this is the 100-TB posture: file names, not megabyte
    // bloom payloads)
    assert(spark.catalog.functionExists("bloom_might_contain"),
      "premise: spec session has GraftExtensions")
    val probeDf = ZoneMaps.pruneFilesMightContainDf(m, "key", "k-2-7")
    assert(probeDf.columns.toSeq === Seq("file"))
    assert(probeDf.schema.head.dataType ===
      org.apache.spark.sql.types.StringType)
    // distributed probe ≡ driver-side reference probe, string + long keys
    def driverProbe(value: Any): Set[String] = {
      import org.apache.spark.util.sketch.BloomFilter
      m.select("file", "key_bloom").collect().filter { r =>
        val bf = BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        value match {
          case s: String => bf.mightContainString(s)
          case n: Number => bf.mightContainLong(n.longValue())
        }
      }.map(_.getString(0)).toSet
    }
    Seq("k-0-0", "k-2-7", "k-3-499", "absent").foreach { k =>
      assert(ZoneMaps.pruneFilesMightContain(m, "key", k).toSet ===
        driverProbe(k), s"key $k")
    }
  }

  test("file-identity normalization: file:///p, file:/p and /p compare equal") {
    Seq("file:///tmp/x/part-0.parquet", "file:/tmp/x/part-0.parquet",
      "/tmp/x/part-0.parquet").foreach { u =>
      assert(ZoneMaps.normFile(u) === "/tmp/x/part-0.parquet", u)
    }
    // remote URIs pass through unchanged (both sides use the same form)
    assert(ZoneMaps.normFile("hdfs://nn:8020/p/f.parquet") ===
      "hdfs://nn:8020/p/f.parquet")
    // the codegen column form agrees with the driver form
    val got = Seq("file:///a/b.parquet", "file:/a/b.parquet", "/a/b.parquet")
      .toDF("u").select(ZoneMaps.normFileCol(col("u"))).as[String]
      .collect()
    assert(got.toSet === Set("/a/b.parquet"))
  }

  test("boundary values on file edges are never lost") {
    // every distinct value of a, queried as a point interval, matches
    // the full filter — overlap pruning must be conservative at edges
    val rnd = new scala.util.Random(3)
    val samples = Seq.fill(10)(rnd.nextInt(1000).toLong)
    samples.foreach { v =>
      val full = spark.read.parquet(path).filter(col("a") === v)
        .select("id").as[Long].collect().toSet
      val pruned = ZoneMaps.prunedScan(spark, path, manifest, "a", v, v)
        .select("id").as[Long].collect().toSet
      assert(pruned === full, s"value $v")
    }
  }
}
