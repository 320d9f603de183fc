package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.Row

/** q_ewma / q_ctfidf — each verified against an independent driver-side
  * reimplementation over the smoke data (sf0.001), not just the DuckDB
  * oracle: the spec recomputes the truncated-EWMA recursion and the
  * c-TF-IDF scoring from first principles in plain Scala and compares.
  */
class EwmaCtfidfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_ewma matches driver-side truncated adjusted EWMA") {
    val got = Catalog.byName("q_ewma").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap

    val events = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_id", "event_type",
        "CAST(ts AS TIMESTAMP) AS ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getDouble(3)))
    assert(events.nonEmpty)

    val beta = BigDecimal("0.75")
    val weights = (0 until 8).map(beta.pow)
    val want = events.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      // full-precision order key: (epoch seconds, nanos-of-second, id)
      val ordered = es.sortBy(e =>
        (math.floorDiv(e._3.getTime, 1000L), e._3.getNanos, e._1))
      ordered.zipWithIndex.map { case ((id, _, _, _), i) =>
        val ks = (0 until 8).filter(_ <= i)
        val num = ks.map(k =>
          weights(k) * BigDecimal(ordered(i - k)._4).setScale(
            6, BigDecimal.RoundingMode.HALF_UP)).sum
        val den = ks.map(weights).sum
        id -> BigDecimal(num.toDouble / den.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    assert(got.size === want.size)
    want.foreach { case (id, w) =>
      assert(got(id) === w, s"event $id")
    }
  }

  test("ewma of a constant sequence is the constant") {
    // all 'click' values replaced by 7 via the same pipeline shape:
    // truncation + normalization must keep a constant series fixed
    val beta = 0.75
    val w = (0 until 8).map(k => math.pow(beta, k))
    val y = w.map(_ * 7.0).sum / w.sum
    assert(math.abs(y - 7.0) < 1e-12)
  }

  test("q_ctfidf matches driver-side c-TF-IDF; salient terms per class") {
    val got = Catalog.byName("q_ctfidf").run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val tok = docs.flatMap { case (src, text) =>
      text.trim.toLowerCase.split("[\\s\\p{Punct}]+").filter(_.nonEmpty)
        .map(tk => (src, tk))
    }
    val ctf = tok.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ft = tok.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val a = tok.length.toDouble / tok.map(_._1).distinct.length
    val want = ctf.toSeq.map { case ((src, tk), tf) =>
      (src, tk, tf, tf * math.log(1 + a / ft(tk)))
    }.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._4, r._2)).take(5)
    }.map(r => (r._1, r._2, r._3,
      BigDecimal(r._4).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet

    assert(got.length === want.size)
    assert(got.toSet === want)
    // every class contributes exactly 5 terms
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.length === 5, s"class $src")
    }
  }
}
