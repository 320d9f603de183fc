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
}
