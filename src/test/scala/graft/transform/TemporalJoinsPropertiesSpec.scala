package graft.transform

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized equivalence: the scalable shapes in [[TemporalJoins]]
  * must agree with their brute-force definitions on arbitrary data —
  * duplicated timestamps, empty key groups, boundary hits included.
  * One generated batch per property, checked in one distributed pass.
  */
class TemporalJoinsPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)
  private def t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  // coarse second grid with few keys → plenty of ties and collisions
  private def randTs(): Timestamp = new Timestamp(t0 + rnd.nextInt(60) * 1000L)
  private def randKey(): Long = rnd.nextInt(4).toLong

  test("property: as-of join ≡ brute-force latest-prior pick under ties") {
    val left = (1 to 120).map(i => (randKey(), randTs(), i.toLong))
      .toDF("k", "lt", "lid")
    val right = (1 to 120).map(i => (randKey(), randTs(), 1000L + i))
      .toDF("k", "rt", "rid")

    val got = TemporalJoins.asofJoinBackward(left, right, Seq("k"),
        "lt", "rt", payload = Seq("rid"), tiebreakCols = Seq("rid"))
      .select($"lid", $"asof_rid")
      .as[(Long, Option[Long])].collect().toMap

    // brute force: all prior-or-equal right rows, max (rt, rid) wins
    val rRows = right.as[(Long, Timestamp, Long)].collect()
    val expected = left.as[(Long, Timestamp, Long)].collect().map {
      case (k, lt, lid) =>
        val cands = rRows.filter(r => r._1 == k && !r._2.after(lt))
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(r => (r._2.getTime, r._3))._3))
    }.toMap
    assert(got === expected)
  }

  test("property: forward as-of join ≡ brute-force earliest-later pick under ties") {
    val left = (1 to 120).map(i => (randKey(), randTs(), i.toLong))
      .toDF("k", "lt", "lid")
    val right = (1 to 120).map(i => (randKey(), randTs(), 1000L + i))
      .toDF("k", "rt", "rid")

    val got = TemporalJoins.asofJoinForward(left, right, Seq("k"),
        "lt", "rt", payload = Seq("rid"), tiebreakCols = Seq("rid"))
      .select($"lid", $"asof_rid")
      .as[(Long, Option[Long])].collect().toMap

    val rRows = right.as[(Long, Timestamp, Long)].collect()
    val expected = left.as[(Long, Timestamp, Long)].collect().map {
      case (k, lt, lid) =>
        val cands = rRows.filter(r => r._1 == k && !r._2.before(lt))
        lid -> (if (cands.isEmpty) None
                else Some(cands.minBy(r => (r._2.getTime, r._3))._3))
    }.toMap
    assert(got === expected)
  }

  test("property: nearest as-of join ≡ brute-force min-|distance| pick under ties") {
    val left = (1 to 120).map(i => (randKey(), randTs(), i.toLong))
      .toDF("k", "lt", "lid")
    val right = (1 to 120).map(i => (randKey(), randTs(), 1000L + i))
      .toDF("k", "rt", "rid")

    val got = TemporalJoins.asofJoinNearest(left, right, Seq("k"),
        "lt", "rt", payload = Seq("rid"), tiebreakCols = Seq("rid"))
      .select($"lid", $"asof_rid")
      .as[(Long, Option[Long])].collect().toMap

    // brute force: min |distance|; backward beats forward at equal
    // distance; backward equals → max rid, forward equals → min rid
    val rRows = right.as[(Long, Timestamp, Long)].collect()
    val expected = left.as[(Long, Timestamp, Long)].collect().map {
      case (k, lt, lid) =>
        val cands = rRows.filter(_._1 == k)
        lid -> (if (cands.isEmpty) None
                else Some(cands.minBy { r =>
                  val isFwd = r._2.after(lt)
                  (math.abs(r._2.getTime - lt.getTime),
                    if (isFwd) 1 else 0,
                    if (isFwd) r._3 else -r._3)
                }._3))
    }.toMap
    assert(got === expected)
  }

  test("property: binned range join ≡ filtered cross join for random bin widths") {
    val points = (1 to 80).map(i => (i.toLong, randTs())).toDF("pid", "pt")
    val ivRaw = (1 to 25).map { i =>
      val s = randTs()
      (100L + i, s, new Timestamp(s.getTime + rnd.nextInt(30) * 1000L))
    }
    val iv = ivRaw.toDF("iid", "s", "e")

    val expected = {
      val ps = points.as[(Long, Timestamp)].collect()
      (for {
        (iid, s, e) <- ivRaw
        (pid, pt) <- ps
        if !pt.before(s) && !pt.after(e)
      } yield (iid, pid)).sorted
    }
    for (binSec <- Seq(1L, 13L, 300L)) {
      val got = TemporalJoins.rangeJoinBinned(points, "pt", iv, "s", "e",
          binMicros = binSec * 1000000L)
        .select("iid", "pid").as[(Long, Long)].collect().sorted.toSeq
      assert(got === expected, s"binSec=$binSec")
    }
  }

  test("property: multi-scale range join ≡ filtered cross join on mixed 1s/1d interval lengths") {
    // the skew case the single-width form can't bin well: interval
    // lengths spanning ~5 orders of magnitude (0-3s vs ~1 day), with
    // extra key collisions and boundary-exact points
    val points = (1 to 120).map(i =>
      (i.toLong, randKey(), new Timestamp(t0 + rnd.nextInt(200000) * 1000L)))
      .toDF("pid", "k", "pt")
    val ivRaw = (1 to 40).map { i =>
      val s = new Timestamp(t0 + rnd.nextInt(150000) * 1000L)
      val lenMs =
        if (i % 2 == 0) rnd.nextInt(4) * 1000L          // 0-3 s
        else 86400000L + rnd.nextInt(10000) * 1000L     // ~1 day
      (100L + i, randKey(), s, new Timestamp(s.getTime + lenMs))
    }
    val iv = ivRaw.toDF("iid", "k", "s", "e")

    val expected = {
      val ps = points.as[(Long, Long, Timestamp)].collect()
      (for {
        (iid, ik, s, e) <- ivRaw
        (pid, pk, pt) <- ps
        if pk == ik && !pt.before(s) && !pt.after(e)
      } yield (iid, pid)).sorted
    }
    for (baseSec <- Seq(1L, 60L)) {
      val got = TemporalJoins.rangeJoinMultiScale(points, "pt", iv, "s", "e",
          baseBinMicros = baseSec * 1000000L, extraKeys = Seq("k"))
        .select("iid", "pid").as[(Long, Long)].collect().sorted.toSeq
      assert(got === expected, s"baseSec=$baseSec")

      // the at-scale contract: every interval occupies ≤ 2 bins at its
      // own level no matter its length (vs len/bin+1 for single-width)
      val bins = TemporalJoins.intervalLevelBins(iv, "s", "e",
        baseSec * 1000000L)
      val maxBinsPerInterval = bins.groupBy("iid")
        .agg(count(lit(1)).as("n")).agg(max("n")).as[Long].head()
      assert(maxBinsPerInterval <= 2L,
        s"explode factor $maxBinsPerInterval > 2 at baseSec=$baseSec")
      // and points probe once per level present — bounded by the
      // distinct level count, not by interval length skew
      val nLevels = bins.select("__lvl").distinct().count()
      assert(nLevels <= 20L, s"level count $nLevels unbounded")
    }
  }

  test("property: interval overlap join ≡ filtered cross join, each pair exactly once") {
    // coarse grid → plenty of equal-start collisions, the case the
    // strict second disjunct must not double-count
    val aRaw = (1 to 30).map { i =>
      val s = randTs()
      (i.toLong, randKey(), s,
        new Timestamp(s.getTime + rnd.nextInt(30) * 1000L))
    }
    val bRaw = (1 to 30).map { i =>
      val s = randTs()
      val lenMs = if (i % 2 == 0) rnd.nextInt(5) * 1000L
                  else 40000L + rnd.nextInt(30) * 1000L
      (100L + i, randKey(), s, new Timestamp(s.getTime + lenMs))
    }
    val a = aRaw.toDF("a_id", "k", "a_s", "a_e")
    val b = bRaw.toDF("b_id", "k", "b_s", "b_e")

    val expected = (for {
      (aid, ak, as_, ae) <- aRaw
      (bid, bk, bs, be) <- bRaw
      if ak == bk && !as_.after(be) && !bs.after(ae)
    } yield (aid, bid)).sorted

    val got = TemporalJoins.intervalOverlapJoin(a, "a_s", "a_e",
        b, "b_s", "b_e", baseBinMicros = 1000000L, extraKeys = Seq("k"))
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    // sorted-seq equality catches BOTH misses and double counts
    assert(got === expected)
  }
}
