package graft.profile

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def nums(n: Int) = (1 to n).map(i => (i.toLong, s"row$i"))
    .toDF("id", "payload")

  test("size cap: min(requested, 100k, 0.5% of total)") {
    assert(Sampling.cappedSize(10000, 1000000L) === 5000)
    assert(Sampling.cappedSize(1000, 1000000L) === 1000)
    assert(Sampling.cappedSize(500000, 100000000L) === 100000)
    assert(Sampling.cappedSize(100, 10L) === 1) // floor to >= 1
  }

  test("random sample always includes first and last rows") {
    val df = nums(1000)
    val s = new Sampling.RandomStrategy("id").sample(df, 1000)
    val ids = s.select("id").as[Long].collect().toSet
    assert(ids.contains(1L) && ids.contains(1000L))
    assert(s.count() === ids.size.toLong) // no duplicate rows
  }

  test("systematic sample strides evenly") {
    val df = nums(1000)
    // cappedSize(100, 1000) = 5 → step 200 → ids 1, 201, 401, 601, 801
    val s = new Sampling.SystematicStrategy("id").sample(df, 100)
    assert(s.select("id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 201L, 401L, 601L, 801L))
  }

  test("stratified sample takes fixed n per stratum deterministically") {
    val df = (1 to 300).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    val s = new Sampling.StratifiedStrategy("g", "id").sample(df, 7)
    val byG = s.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG === Map("g0" -> 7L, "g1" -> 7L, "g2" -> 7L))
    // deterministic: lowest ids win within each stratum
    val g1 = s.filter($"g" === "g1").select("id").as[Long].collect().sorted
    assert(g1 === Array(1L, 4L, 7L, 10L, 13L, 16L, 19L))
  }

  test("mixtureQuotas: largest-remainder seats, deterministic ties") {
    assert(Sampling.mixtureQuotas(
      Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.05),
      100) === Map("en" -> 50L, "de" -> 20L, "fr" -> 15L, "es" -> 10L, "zh" -> 5L))
    // 3 equal thirds of 100: floor 33 each, one remainder seat → first
    // group by name tie-break gets 34; total always exact
    val q = Sampling.mixtureQuotas(Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), 100)
    assert(q === Map("a" -> 34L, "b" -> 33L, "c" -> 33L))
    assert(q.values.sum === 100L)
    // weights need not sum to 1 (normalized internally)
    assert(Sampling.mixtureQuotas(Map("x" -> 2.0, "y" -> 2.0), 10) ===
      Map("x" -> 5L, "y" -> 5L))
  }

  test("mixtureSample takes first-quota rows per group; short groups give all") {
    val df = ((1 to 50).map(i => (i.toLong, "big")) ++
      Seq((100L, "tiny"))).toDF("id", "g")
    val s = Sampling.mixtureSample(df, "g", "id",
      Map("big" -> 0.8, "tiny" -> 0.2), 20)
    val byG = s.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG === Map("big" -> 16L, "tiny" -> 1L)) // tiny has only 1 row
    // deterministic membership: lowest ids
    assert(s.filter($"g" === "big").select("id").as[Long].collect().sorted
      .toSeq === (1L to 16L).toSeq)
    // groups outside the weight map are excluded entirely
    val s2 = Sampling.mixtureSample(df, "g", "id", Map("big" -> 1.0), 5)
    assert(s2.select("g").distinct().as[String].collect().toSeq === Seq("big"))
  }

  test("weightedSample matches the A-ES draw computed by hand and is repartition-stable") {
    def hash32(id: Long): Long = {
      val m = 4294967296L; val c = 2654435761L
      val x = ((id % m) + m) % m
      (((x / 65536 * c) % m) * 65536 + x % 65536 * c) % m
    }
    val rows = (1L to 200L).map(i => (i, (i % 7 + 1).toDouble))
    val expected = rows
      .map { case (id, w) =>
        (id, math.log((hash32(id) + 0.5) / 4294967296.0) / w) }
      .sortBy(-_._2).take(25).map(_._1).toSet
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", 25)
      .select("id").as[Long].collect().toSet
    assert(got === expected)
    // same draw regardless of physical layout
    val got2 = Sampling.weightedSample(df.repartition(13), "id", "w", 25)
      .select("id").as[Long].collect().toSet
    assert(got2 === expected)
    // zero/negative weights can never be drawn
    val withBad = (rows ++ Seq((900L, 0.0), (901L, -5.0))).toDF("id", "w")
    val got3 = Sampling.weightedSample(withBad, "id", "w", 25)
      .select("id").as[Long].collect().toSet
    assert(got3 === expected)
  }

  test("weightedSample favors heavy weights: a dominant weight is always drawn") {
    val df = ((1L to 99L).map(i => (i, 1.0)) :+ (500L, 1e9))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", 10)
      .select("id").as[Long].collect().toSet
    assert(got.contains(500L)) // key ~ ln(u)/1e9 ≈ 0⁻ beats any w=1 key
  }
}
