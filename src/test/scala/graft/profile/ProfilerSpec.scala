package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.types._

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("single-pass profile computes count/nulls/distinct/min/max/integral") {
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 1.5, "aa"), (2L, 2.25, "bbb"), (2L, null, "cc"), (3L, 4.0, null)
    ).toDF("k", "v", "s")
    val profiles = Profiler.profile(df).map(p => p.name -> p).toMap

    val k = profiles("k")
    assert(k.count === 4 && k.nullCount === 0 && k.distinctCount === 3)
    assert(k.allIntegral && k.minNumeric === Some(1.0) && k.maxNumeric === Some(3.0))

    val v = profiles("v")
    assert(v.nullCount === 1)
    assert(!v.allIntegral)
    assert(v.maxDecimalPlaces === 2) // 2.25

    val s = profiles("s")
    assert(s.nullCount === 1 && s.maxStrLen === 3)
  }

  test("profile feeds inference end-to-end (analyzeSchema)") {
    val df = Seq((1, "x", 10.5), (200, "yy", 20.25)).toDF("Small ID", "name", "v")
    val result = Profiler.analyzeSchema(df)
    val types = result.map { case (_, d) => d.name -> d.sqlType }.toMap
    assert(types("small_id") === "SMALLINT")
    assert(types("name") === "VARCHAR(2)")
    assert(types("v") === "NUMERIC(12,6)")
  }

  test("large fractional doubles (scientific string form) never infer INTEGER") {
    // 1.23456785e7 stringifies as '1.23456785E7': the decimal-places
    // regex sees no fraction, but the value is NOT integral — the type
    // must stay floating, not truncate to INTEGER.
    val df = Seq(12345678.5, 98765432.25).toDF("big_frac")
    val inferred = Profiler.analyzeSchema(df).head._2.sqlType
    assert(inferred === "DOUBLE PRECISION", inferred)
  }

  test("monotonicity detection over an explicit order column") {
    val inc = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("ord", "v")
    val dec = Seq((1, 30.0), (2, 20.0), (3, 10.0)).toDF("ord", "v")
    val mixed = Seq((1, 10.0), (2, 30.0), (3, 20.0)).toDF("ord", "v")
    assert(Profiler.isMonotonic(inc, "v", "ord"))
    assert(Profiler.isMonotonic(dec, "v", "ord"))
    assert(!Profiler.isMonotonic(mixed, "v", "ord"))
  }
}
