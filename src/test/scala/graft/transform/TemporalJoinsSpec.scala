package graft.transform

import java.sql.Timestamp

import graft.SparkSpec
import graft.ops.EngineOps
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // quotes (right side): user 1 has three, user 2 one, user 3 none
  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0, 11L),
    (1L, ts("2024-01-01 10:05:00"), 101.0, 12L),
    (1L, ts("2024-01-01 10:05:00"), 999.0, 13L), // same ts as 12 — tiebreak
    (1L, ts("2024-01-01 11:00:00"), 102.0, 14L),
    (2L, ts("2024-01-01 09:00:00"), 200.0, 21L)
  ).toDF("uid", "qts", "price", "qid")

  private val trades = Seq(
    (1L, ts("2024-01-01 10:04:59"), 1000L), // → quote 11 (10:00)
    (1L, ts("2024-01-01 10:05:00"), 1001L), // tie ts → quote 13 (max qid)
    (1L, ts("2024-01-01 12:00:00"), 1002L), // → quote 14
    (2L, ts("2024-01-01 08:59:00"), 2000L), // before any quote → null
    (3L, ts("2024-01-01 10:00:00"), 3000L)  // user with no quotes → null
  ).toDF("uid", "tts", "tid")

  test("backward as-of join picks latest prior right row, inclusive, tiebroken") {
    val out = TemporalJoins.asofJoinBackward(
        trades, quotes, Seq("uid"), "tts", "qts",
        payload = Seq("price", "qid"), tiebreakCols = Seq("qid"))
      .select($"tid", $"asof_price", $"asof_qid")
      .orderBy("tid")
      .as[(Long, Option[Double], Option[Long])].collect().toSeq
    assert(out === Seq(
      (1000L, Some(100.0), Some(11L)),
      (1001L, Some(999.0), Some(13L)), // inclusive <= and max-qid tiebreak
      (1002L, Some(102.0), Some(14L)),
      (2000L, None, None),
      (3000L, None, None)))
  }

  test("tolerance nulls out matches older than the window") {
    val out = TemporalJoins.asofJoinBackward(
        trades, quotes, Seq("uid"), "tts", "qts",
        payload = Seq("qid"), tiebreakCols = Seq("qid"),
        toleranceMicros = Some(60L * 1000000)) // 1 minute
      .select($"tid", $"asof_qid")
      .orderBy("tid")
      .as[(Long, Option[Long])].collect().toSeq
    // 1000 is 4:59 after quote 11 → dropped; 1001 exact-tie → kept;
    // 1002 is an hour after quote 14 → dropped
    assert(out === Seq((1000L, None), (1001L, Some(13L)), (1002L, None),
      (2000L, None), (3000L, None)))
  }

  test("forward as-of join picks earliest later right row, inclusive, min tiebreak") {
    val out = TemporalJoins.asofJoinForward(
        trades, quotes, Seq("uid"), "tts", "qts",
        payload = Seq("qid"), tiebreakCols = Seq("qid"))
      .select($"tid", $"asof_qid")
      .orderBy("tid")
      .as[(Long, Option[Long])].collect().toSeq
    assert(out === Seq(
      (1000L, Some(12L)), // next quote at 10:05, MIN qid wins the tie
      (1001L, Some(12L)), // inclusive >=
      (1002L, None),      // nothing after 12:00
      (2000L, Some(21L)), // 09:00 quote is later than 08:59
      (3000L, None)))
  }

  test("nearest as-of join picks min |distance|, backward wins ties") {
    val out = TemporalJoins.asofJoinNearest(
        trades, quotes, Seq("uid"), "tts", "qts",
        payload = Seq("qid"), tiebreakCols = Seq("qid"))
      .select($"tid", $"asof_qid")
      .orderBy("tid")
      .as[(Long, Option[Long])].collect().toSeq
    assert(out === Seq(
      (1000L, Some(12L)), // 10:04:59 → 10:05 fwd (1s) beats 10:00 bwd (4:59); min qid among fwd ties
      (1001L, Some(13L)), // exact hit: backward direction wins, max qid among bwd equals
      (1002L, Some(14L)), // only backward exists
      (2000L, Some(21L)), // only forward exists (09:00, 1 min away)
      (3000L, None)))     // no quotes at all
  }

  test("nearest as-of tolerance applies to both directions") {
    val out = TemporalJoins.asofJoinNearest(
        trades, quotes, Seq("uid"), "tts", "qts",
        payload = Seq("qid"), tiebreakCols = Seq("qid"),
        toleranceMicros = Some(30L * 1000000)) // 30 seconds
      .select($"tid", $"asof_qid")
      .orderBy("tid")
      .as[(Long, Option[Long])].collect().toSeq
    // 1000's fwd match is 1s away → kept; 2000's fwd match is 60s → dropped
    assert(out === Seq((1000L, Some(12L)), (1001L, Some(13L)),
      (1002L, None), (2000L, None), (3000L, None)))
  }

  test("nearest as-of join still shuffles exactly once (two sorts, one exchange)") {
    val s = EngineOps.planSummaryNoAqe(spark,
      TemporalJoins.asofJoinNearest(trades, quotes, Seq("uid"), "tts", "qts",
        payload = Seq("price")))
    assert(s.exchangeCount === 1, s)
  }

  test("as-of join shuffles exactly once (union + single keyed window)") {
    val s = EngineOps.planSummaryNoAqe(spark,
      TemporalJoins.asofJoinBackward(trades, quotes, Seq("uid"), "tts", "qts",
        payload = Seq("price")))
    assert(s.exchangeCount === 1, s)
  }

  test("binned range join = BETWEEN join, each pair exactly once, any bin width") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:10:00")),
      (3L, ts("2024-01-01 10:30:00")),
      (4L, ts("2024-01-01 23:00:00"))).toDF("pid", "pt")
    val iv = Seq(
      (100L, ts("2024-01-01 09:55:00"), ts("2024-01-01 10:10:00")), // p1, p2 (inclusive end)
      (101L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:45:00")), // p1 (inclusive start), p2, p3
      (102L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"))  // none
    ).toDF("iid", "s", "e")
    for (binMin <- Seq(1L, 7L, 60L)) {
      val got = TemporalJoins.rangeJoinBinned(points, "pt", iv, "s", "e",
          binMicros = binMin * 60L * 1000000)
        .select("iid", "pid").as[(Long, Long)].collect().sorted.toSeq
      assert(got === Seq((100L, 1L), (100L, 2L), (101L, 1L), (101L, 2L),
        (101L, 3L)), s"binMin=$binMin")
    }
  }
}
