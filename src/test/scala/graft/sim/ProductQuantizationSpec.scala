package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters in 8 dims: ids 0-9 around e1, ids 100-109 around e5
  private def clustered = {
    val rows = (0 until 10).map { i =>
      val v = Array.fill(8)(0.01f * i)
      v(0) = 1.0f; v(1) = 0.1f * (i % 3)
      (i.toLong, v)
    } ++ (0 until 10).map { i =>
      val v = Array.fill(8)(0.01f * i)
      v(4) = 1.0f; v(5) = 0.1f * (i % 3)
      (100L + i, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("components: subspace/offset mapping and unit normalization") {
    val one = Seq((7L, Array(3.0f, 4.0f, 0.0f, 12.0f)))
      .toDF("vec_id", "embedding")
    val comp = ProductQuantization.components(one, "vec_id", "embedding", 2)
      .orderBy("sub", "q")
      .as[(Long, Int, Int, Double)].collect()
    // |v| = 13; dims (0,1) → sub 0 offsets (0,1); dims (2,3) → sub 1
    assert(comp.map(c => (c._2, c._3)) ===
      Seq((0, 0), (0, 1), (1, 0), (1, 1)))
    assert(math.abs(comp(0)._4 - 3.0 / 13) < 1e-9)
    assert(math.abs(comp(3)._4 - 12.0 / 13) < 1e-9)
  }

  test("codes are within [0, ksub) and cover both planted clusters") {
    val cents = ProductQuantization.train(clustered, "vec_id",
      "embedding", m = 2, ksub = 4, iters = 3)
    val codes = ProductQuantization.encodeCodes(clustered, "vec_id",
        "embedding", 2, cents)
      .as[(Long, Int, Int)].collect()
    assert(codes.length == 20 * 2) // one code per (vec, subspace)
    assert(codes.forall(c => c._3 >= 0 && c._3 < 4))
    // cluster members must agree on the code of their dominant subspace
    val sub0 = codes.filter(_._2 == 0).groupBy(_._1).view.mapValues(_.head._3)
    val a = (0L until 10L).map(sub0(_)).toSet
    val b = (100L until 110L).map(sub0(_)).toSet
    // k-means may subdivide a cluster (ksub > clusters) — what matters
    // is that no code is SHARED across the two planted clusters
    assert((a intersect b).isEmpty,
      s"cluster codes not separated: $a vs $b")
  }

  test("pqTopK retrieves same-cluster neighbors") {
    val queries = clustered.filter(col("vec_id").isin(0, 100))
    val got = ProductQuantization.pqTopK(clustered, queries, "vec_id",
        "embedding", k = 3, m = 2, ksub = 4, iters = 3, rerank = 6)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got(0L).forall(_ < 100L), s"cross-cluster hits: ${got(0L)}")
    assert(got(100L).forall(_ >= 100L), s"cross-cluster hits: ${got(100L)}")
  }

  test("ivfPqTopK composed funnel retrieves same-cluster neighbors") {
    // prune (2 coarse cells) -> compressed scan -> exact re-rank: the
    // planted clusters land in separate cells, so each query's results
    // must come from its own cluster even with nProbe = 1
    val queries = clustered.filter(col("vec_id").isin(0, 100))
    val got = ProductQuantization.ivfPqTopK(clustered, queries, "vec_id",
        "embedding", k = 3, kCoarse = 2, nProbe = 1, m = 2, ksub = 4,
        iters = 3, rerank = 6)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got(0L).size === 3 && got(0L).forall(_ < 100L),
      s"cluster-0 results: ${got(0L)}")
    assert(got(100L).size === 3 && got(100L).forall(_ >= 100L),
      s"cluster-1 results: ${got(100L)}")
    // ranks are exact-cosine ordered (the re-rank tier is authoritative)
    val ranked = ProductQuantization.ivfPqTopK(clustered, queries,
        "vec_id", "embedding", k = 3, kCoarse = 2, nProbe = 2, m = 2,
        ksub = 4, iters = 3, rerank = 20)
      .filter(col("query_id") === 0L).orderBy("rank")
      .select("corpus_id", "cosine").as[(Long, Double)].collect()
    assert(ranked.map(_._2).sliding(2).forall(p => p(0) >= p(1)),
      s"re-rank order broken: ${ranked.toSeq}")
  }

  test("codebooks and codes are layout-independent (decimal-exact means)") {
    def run(parts: Int) = {
      val df = clustered.repartition(parts)
      val cents = ProductQuantization.train(df, "vec_id", "embedding",
        m = 2, ksub = 4, iters = 2)
      ProductQuantization.encodeCodes(df, "vec_id", "embedding", 2, cents)
        .as[(Long, Int, Int)].collect().toSet
    }
    assert(run(1) == run(7))
  }

  // ---- kernel ≡ join-form parity (graft.plans.PqEncode) -------------

  /** Both assignment formulations over the same vectors + codebooks. */
  private def bothForms(df: org.apache.spark.sql.DataFrame, m: Int,
      cents: org.apache.spark.sql.DataFrame) = {
    val joinForm = ProductQuantization.assignCodes(
        ProductQuantization.components(df, "vec_id", "embedding", m), cents)
      .as[(Long, Int, Int)].collect().toSet
    val kernel = ProductQuantization.encodeCodes(df, "vec_id",
        "embedding", m, cents)
      .as[(Long, Int, Int)].collect().toSet
    (joinForm, kernel)
  }

  test("kernel parity: trained books over float and double corpora") {
    val floats = clustered
    val cents = ProductQuantization.train(floats, "vec_id", "embedding",
      m = 2, ksub = 4, iters = 3)
    val (j1, k1) = bothForms(floats, 2, cents)
    assert(j1 == k1, s"float parity: ${j1 diff k1} vs ${k1 diff j1}")

    val rnd = new scala.util.Random(42)
    val doubles = (0L until 64L).map(i =>
        (i, Array.fill(16)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val cents2 = ProductQuantization.train(doubles, "vec_id", "embedding",
      m = 4, ksub = 8, iters = 2)
    val (j2, k2) = bothForms(doubles, 4, cents2)
    assert(j2 == k2, s"double parity: ${j2 diff k2} vs ${k2 diff j2}")
  }

  test("kernel parity: exact-tie codebooks break to the smaller cid") {
    // two IDENTICAL codes (0, 2) and a distinct one (1): every vector's
    // distances to 0 and 2 tie exactly, so min_by's (d2, cid) ordering
    // must hand the code to 0, never 2 — in both formulations
    val cents = Seq(
      (0, 0, 0, 0.5), (0, 0, 1, 0.5),
      (0, 1, 0, -0.5), (0, 1, 1, 0.25),
      (0, 2, 0, 0.5), (0, 2, 1, 0.5),
      (1, 0, 0, 0.1), (1, 0, 1, 0.2),
      (1, 1, 0, 0.1), (1, 1, 1, 0.2)) // subspace 1: 0 ≡ 1, tie → 0
      .toDF("sub", "cid", "q", "c")
    val vecs = (0L until 8L).map(i =>
        (i, Array(0.3f + 0.1f * i, -0.2f, 0.05f * i, 0.9f)))
      .toDF("vec_id", "embedding")
    val (j, k) = bothForms(vecs, 2, cents)
    assert(j == k, s"tie parity: ${j diff k} vs ${k diff j}")
    assert(k.forall { case (_, sub, cid) => sub != 1 || cid == 0 },
      s"subspace-1 tie must break to cid 0: $k")
    assert(k.collect { case (_, 0, cid) => cid }.forall(_ != 2),
      s"subspace-0 tie vs cid 2 must break to cid 0: $k")
  }

  test("kernel parity: zero vector, empty vector, missing subs, short q") {
    // books cover only sub 0 with offsets {0, 1}: components of sub 1
    // never match (no code for sub 1), and q = 2.. of a wider subspace
    // contribute no term — in both formulations
    val cents = Seq(
      (0, 0, 0, 0.9), (0, 0, 1, 0.1),
      (0, 1, 0, -0.9), (0, 1, 1, 0.3))
      .toDF("sub", "cid", "q", "c")
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f, 5.0f, 6.0f)), // dsub 3: q=2 unmatched
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),             // zero norm → /1.0
      (3L, Array.empty[Float]),                         // no components
      (4L, Array(-1.0f, 1.0f, 0.5f, -0.5f)))
      .toDF("vec_id", "embedding")
    val (j, k) = bothForms(vecs, 2, cents)
    assert(j == k, s"edge parity: ${j diff k} vs ${k diff j}")
    assert(j.nonEmpty && j.forall(_._2 == 0), s"only sub-0 codes: $j")
    assert(!j.exists(_._1 == 3L), "empty vector must emit no codes")
  }

  test("kernel parity: null element nulls the row's distances (null-first argmin)") {
    // one null component nulls the norm, hence every normalized value,
    // hence every (sub, cid) distance — min_by's struct ordering puts
    // null d2 FIRST, so the smallest matched cid wins in both forms
    val cents = Seq(
      (0, 3, 0, 0.9), (0, 3, 1, 0.1),
      (0, 7, 0, -0.9), (0, 7, 1, 0.3),
      (1, 2, 0, 0.5), (1, 2, 1, 0.5),
      (1, 5, 0, 0.1), (1, 5, 1, 0.9))
      .toDF("sub", "cid", "q", "c")
    val vecs = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array(cast(1.0 as double), cast(null as double),
        |             cast(2.0 as double), cast(0.5 as double))),
        |  (2L, array(cast(0.2 as double), cast(0.8 as double),
        |             cast(-0.3 as double), cast(0.6 as double)))
        |AS t(vec_id, embedding)""".stripMargin)
    val (j, k) = bothForms(vecs, 2, cents)
    assert(j == k, s"null-element parity: ${j diff k} vs ${k diff j}")
    assert(j.contains((1L, 0, 3)) && j.contains((1L, 1, 2)),
      s"null row must take the smallest matched cid per sub: $j")
  }

  test("roundScale12 matches cast(double as decimal(27,12)) bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val adversarial = Seq(
      0.0, 1e-13, 4.999e-13, 5e-13, 5.001e-13, 1.5e-12, 2.5e-12,
      3.5e-12, 1.0000000000005, 0.9999999999995, 2.0000000000015,
      1e-300, 4.9e-324, 1.1e-16, 4.0, 3.9999999999999996,
      39.9, 41.5, 123.456, 1e6) ++
      (0 until 4000).map(_ => rnd.nextDouble() * 4.0) ++
      (0 until 1000).map(_ => rnd.nextDouble() * 4e-12) ++
      (0 until 500).map(i => (i + 0.5) * 1e-12) ++ // half-way ladder
      (0 until 500).map(_ => math.pow(rnd.nextDouble() * 2,
        rnd.nextInt(20) - 10)).filter(d =>
        // scale-12 unscaled longs cover < ~9.2e6 — far beyond the
        // kernel's (x−c)² ≤ ~4 domain; larger values throw (below)
        java.lang.Double.isFinite(d) && d < 4e6)
    val df = adversarial.toDF("d")
      .select(col("d"), col("d").cast("decimal(27,12)").as("dec"))
      .collect()
    df.foreach { r =>
      val d = r.getDouble(0)
      val expect = r.getDecimal(1).unscaledValue.longValueExact
      val got = graft.plans.PqKernel.roundScale12(d)
      assert(got == expect,
        s"roundScale12($d) = $got, Spark cast = $expect")
    }
    // where the ANSI cast throws (≥ 1e15 overflows decimal(27,12)) or
    // the long accumulator can't hold the unscaled value (≥ ~9.2e6 —
    // unreachable for unit-normalized inputs), the kernel throws too
    Seq(1e16, 1e10, Double.NaN, Double.PositiveInfinity).foreach { d =>
      assertThrows[ArithmeticException](
        graft.plans.PqKernel.roundScale12(d))
    }
  }

  test("pq_encode codegen path (no fallback) agrees with the join form") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val cents = ProductQuantization.train(clustered, "vec_id",
        "embedding", m = 2, ksub = 4, iters = 2)
      val (j, k) = bothForms(clustered, 2, cents)
      assert(j == k, s"codegen parity: ${j diff k} vs ${k diff j}")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
