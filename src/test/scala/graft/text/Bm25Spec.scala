package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def bm25Ref(tf: Long, df: Long, n: Long, dl: Long,
      avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
      (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

  private def r6(x: Double): Double = BigDecimal(x)
    .setScale(10, BigDecimal.RoundingMode.HALF_UP)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-checked scores: tf saturation, idf rarity, length normalization") {
    val docs = Seq(
      (1L, "spark spark spark join"), // tf(spark)=3, dl=4
      (2L, "spark join join"),        // dl=3
      (3L, "scan filter scan scan"),  // no query terms
      (4L, "join"),                   // dl=1
      (5L, "   "))                    // blank: dl=0, counts toward N/avgdl
      .toDF("doc_id", "text")
    // N=5, total tokens = 4+3+4+1+0 = 12 → avgdl = 2.4
    // df(spark)=2, df(join)=3
    val got = Bm25.topDocs(docs, "doc_id", "text", Seq("spark", "join"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    val avgdl = 12.0 / 5.0
    def dec(x: Double) = BigDecimal(x)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val d1 = r6((dec(bm25Ref(3, 2, 5, 4, avgdl)) +
      dec(bm25Ref(1, 3, 5, 4, avgdl))).toDouble)
    val d2 = r6((dec(bm25Ref(1, 2, 5, 3, avgdl)) +
      dec(bm25Ref(2, 3, 5, 3, avgdl))).toDouble)
    val d4 = r6(dec(bm25Ref(1, 3, 5, 1, avgdl)).toDouble)
    assert(got === Seq((1L, 2L, d1), (2L, 2L, d2), (4L, 1L, d4)))
  }

  test("limit keeps the highest-scoring docs; non-matching docs never retrieved") {
    val docs = (1L to 20L).map { i =>
      // doc i repeats 'rare' i times then pads with 'pad' to equal length
      (i, (Seq.fill(i.toInt)("rare") ++ Seq.fill(21 - i.toInt)("pad")).mkString(" "))
    }.toDF("doc_id", "text")
    val got = Bm25.topDocs(docs, "doc_id", "text", Seq("rare"), limit = 5)
      .collect().map(_.getLong(0)).sorted
    // equal lengths → score monotone in tf → docs 16..20 win
    assert(got === Seq(16L, 17L, 18L, 19L, 20L))
  }
}
