package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall proof for the grid prune: Skyline.skyline2d must equal the
  * quadratic dominance filter for any bucket count — the prune may
  * only ever drop dominated points.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    val u = pts.distinct
    u.filterNot { case (x, y) =>
      u.exists { case (qx, qy) =>
        (qx < x && qy >= y) || (qx <= x && qy > y)
      }
    }.toSet
  }

  private def run(pts: Seq[(Double, Double)], buckets: Int): Set[(Double, Double)] =
    Skyline.skyline2d(pts.toDF("x", "y"), "x", "y", nBuckets = buckets)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet

  test("matches brute force on a seeded random cloud, any bucket count") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(400)((rnd.nextDouble() * 100,
      rnd.nextDouble() * 50))
    val expected = brute(pts)
    for (b <- Seq(1, 2, 16, 256))
      assert(run(pts, b) === expected, s"nBuckets=$b")
  }

  test("duplicates, vertical stacks, and single-x degenerate input") {
    val dup = Seq((1.0, 5.0), (1.0, 5.0), (1.0, 3.0), (2.0, 5.0))
    assert(run(dup, 8) === Set((1.0, 5.0)))
    // all points share x: only the max-y survives
    val stack = Seq((3.0, 1.0), (3.0, 9.0), (3.0, 4.0))
    assert(run(stack, 8) === Set((3.0, 9.0)))
  }

  test("falling staircase: the cheapest-largest corner dominates all") {
    // y falls as x rises, so (0, 100) is cheaper AND larger than
    // every other point — the frontier is that single corner
    val chain = (0 until 20).map(i => (i.toDouble, (100 - i).toDouble))
    assert(brute(chain) === Set((0.0, 100.0)))
    assert(run(chain, 4) === Set((0.0, 100.0)))
  }

  test("diagonal input is an anti-chain: everything survives") {
    // y grows with x, so no point is both cheaper and larger than
    // another — the whole diagonal is the frontier
    val diag = (0 until 20).map(i => (i.toDouble, i.toDouble))
    assert(brute(diag) === diag.toSet)
    assert(run(diag, 4) === diag.toSet)
  }

  test("dominated cloud behind a single champion collapses to it") {
    val pts = (1 to 50).map(i => (i.toDouble, 50.0 - i)) :+ (0.5, 60.0)
    assert(run(pts, 8) === Set((0.5, 60.0)))
  }
}
