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
}
