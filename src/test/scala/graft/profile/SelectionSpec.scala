package graft.profile

import graft.SparkSpec

/** kthSmallest against driver-side sorts: random data, heavy
  * duplicates, all-equal columns, tight clusters around one value
  * (the ulp-narrow terminal path), and every rank of a small set.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def check(xs: Seq[Double], ks: Seq[Long]): Unit = {
    val df = xs.toDF("v")
    val sorted = xs.sorted
    ks.foreach { k =>
      val got = Selection.kthSmallest(df, "v", k)
      assert(got === sorted((k - 1).toInt), s"k=$k")
    }
  }

  test("random doubles: min, max, median, and arbitrary ranks") {
    val rnd = new scala.util.Random(41)
    val xs = Seq.fill(5000)(rnd.nextDouble() * 1e6 - 5e5)
    check(xs, Seq(1L, 5000L, 2500L, 17L, 4999L, 123L))
  }

  test("every rank of a small set (exhaustive off-by-one hunt)") {
    val rnd = new scala.util.Random(13)
    val xs = Seq.fill(40)(rnd.nextInt(10).toDouble) // heavy ties
    check(xs, (1L to 40L))
  }

  test("all-equal column returns the value at any rank") {
    val xs = Seq.fill(10000)(42.5)
    check(xs, Seq(1L, 5000L, 10000L))
  }

  test("one dominant duplicate with outliers either side") {
    val xs = Seq.fill(9000)(7.0) ++ Seq.fill(500)(1.0) ++ Seq.fill(500)(9.0)
    check(xs, Seq(1L, 500L, 501L, 5000L, 9500L, 9501L, 10000L))
  }

  test("ulp-tight cluster resolves exactly") {
    val base = 1.0
    val xs = (0 until 1000).map(i => base + i * java.lang.Math.ulp(base))
    check(xs, Seq(1L, 500L, 1000L))
  }

  test("small finishRows forces multiple refinement passes, still exact") {
    val rnd = new scala.util.Random(99)
    val xs = Seq.fill(20000)(rnd.nextGaussian() * 100)
    val sorted = xs.sorted
    val got = Selection.kthSmallest(xs.toDF("v"), "v", 10000L,
      buckets = 16, finishRows = 64)
    assert(got === sorted(9999))
  }
}
