package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class MergeScd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private val existing = Seq(
    // k=1 has closed history + a current row; k=2 only current
    (1L, "v1", ts("2024-01-01"), Option(ts("2024-03-01"))),
    (1L, "v2", ts("2024-03-01"), Option.empty[Timestamp]),
    (2L, "w1", ts("2024-02-01"), Option.empty[Timestamp]))
    .toDF("k", "attr", "valid_from", "valid_to")

  test("update closes the open version, opens a new one, history untouched") {
    val updates = Seq((1L, "v3", ts("2024-06-01"))).toDF("k", "attr", "eff")
    val got = Warehouse.mergeScd2(existing, updates, Seq("k"), "eff")
      .orderBy("k", "valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSeq
    assert(got === Seq(
      (1L, "v1", ts("2024-01-01"), Some(ts("2024-03-01"))), // history intact
      (1L, "v2", ts("2024-03-01"), Some(ts("2024-06-01"))), // closed now
      (1L, "v3", ts("2024-06-01"), None),                   // new current
      (2L, "w1", ts("2024-02-01"), None)))                  // untouched
  }

  test("brand-new key inserts as current; point-in-time queries see one version") {
    val updates = Seq((3L, "x1", ts("2024-05-01"))).toDF("k", "attr", "eff")
    val merged = Warehouse.mergeScd2(existing, updates, Seq("k"), "eff")
    assert(merged.count() === 4)
    // as-of 2024-02-01: k=1 resolves to v1 (its first version)
    val asOf = merged.filter(
      col("valid_from") <= lit(ts("2024-02-01")) &&
        (col("valid_to").isNull || col("valid_to") > lit(ts("2024-02-01"))))
    val versions = asOf.orderBy("k").as[(Long, String, Timestamp, Option[Timestamp])]
      .collect().map(r => r._1 -> r._2).toSeq
    assert(versions === Seq(1L -> "v1", 2L -> "w1"))
    // exactly one open version per key after the merge
    val openPerKey = merged.filter(col("valid_to").isNull)
      .groupBy("k").count().as[(Long, Long)].collect().toMap
    assert(openPerKey.values.forall(_ == 1L))
  }
}
