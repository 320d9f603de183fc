package graft.profile

import graft.SparkSpec
import graft.io.Tables

class ProfileFastSpec extends SparkSpec {
  import spark.implicits._

  test("profileFast agrees with the composed profiler on real data") {
    val orders = Tables.table(spark, "/root/testdata/sf0.001", "orders")
    val slow = Profiler.profile(orders).map(p => p.name -> p).toMap
    val fast = Profiler.profileFast(orders).map(p => p.name -> p).toMap
    assert(fast.keySet === slow.keySet)
    fast.foreach { case (name, f) =>
      val s = slow(name)
      assert(f.count === s.count, name)
      assert(f.nullCount === s.nullCount, name)
      assert(f.minNumeric === s.minNumeric, name)
      assert(f.maxNumeric === s.maxNumeric, name)
      assert(f.allIntegral === s.allIntegral, name)
      assert(f.maxDecimalPlaces === s.maxDecimalPlaces, name)
      assert(f.maxStrLen === s.maxStrLen, name)
      // HLL estimate within 10% of exact
      assert(math.abs(f.distinctCount - s.distinctCount).toDouble /
        math.max(s.distinctCount, 1) < 0.1, name)
    }
  }

  test("profileFast counts decimals of scientific-notation doubles positionally") {
    // 12345678.5 stringifies as '1.23456785E7'; the fraction must still
    // count (1 decimal place), and tiny values expand too
    val df = Seq(12345678.5, 0.0000001).toDF("big_frac")
    val p = Profiler.profileFast(df).head
    assert(!p.allIntegral)
    assert(p.maxDecimalPlaces === 7, p.maxDecimalPlaces.toString) // 1e-7
  }

  test("profileFast handles nulls and mixed types") {
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 1.5, "aa"), (2L, null, "bbb"), (3L, 2.25, null)
    ).toDF("k", "v", "s")
    val p = Profiler.profileFast(df).map(x => x.name -> x).toMap
    assert(p("v").nullCount === 1 && p("v").maxDecimalPlaces === 2)
    assert(p("s").nullCount === 1 && p("s").maxStrLen === 3)
    assert(p("k").allIntegral && p("k").minNumeric === Some(1.0))
  }
}
