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

  test("composed decimal counting matches the native path on scientific forms") {
    // 12345678.5 casts to '1.23456785E7' (fraction 8 − exp 7 = 1 place);
    // 1.5e-8 casts to '1.5E-8' (fraction 1 + 8 = 9 places); 0.1 is plain.
    val cases = Seq(
      (Seq(12345678.5), 1), (Seq(1.5e-8), 9), (Seq(0.1), 1),
      (Seq(1234.5678), 4), (Seq(98765432.25), 2), (Seq(3.0), 0))
    cases.foreach { case (vals, want) =>
      val df = vals.toDF("v")
      val composed = Profiler.profile(df).head.maxDecimalPlaces
      val native = Profiler.profileFast(df).head.maxDecimalPlaces
      assert(composed === want, s"composed($vals)")
      assert(native === want, s"native($vals)")
    }
  }

  test("wide fractional magnitudes stay floating even with visible decimals") {
    // NUMERIC(12,6) holds only 6 integer digits — an 8-digit fractional
    // value must infer DOUBLE PRECISION, not a DDL type it overflows.
    val df = Seq(12345678.5, 98765432.25).toDF("big_frac")
    val inferred = Profiler.analyzeSchema(df).head._2.sqlType
    assert(inferred === "DOUBLE PRECISION", inferred)
  }

  test("histogram bins equal-width with clamped max; degenerate column → bin 0") {
    val df = Seq(0.0, 1.0, 2.5, 4.9, 5.0, 9.9, 10.0).toDF("v")
    // lo=0, hi=10, width 2.5 over 4 bins; 2.5 sits ON the bin-1 edge
    // (floor(2.5/2.5)=1) and 10.0 clamps into bin 3
    val bins = Profiler.histogram(df, "v", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bins === Map(0L -> 2L, 1L -> 2L, 2L -> 1L, 3L -> 2L))
    val flat = Seq(7.0, 7.0, 7.0).toDF("v")
    assert(Profiler.histogram(flat, "v", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((0L, 3L)))
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
