package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // reference model computed independently of the Spark plan
  private def refWeights(raw: Seq[(Long, String)], tgt: Seq[String])
      : Map[Long, (Long, Double)] = {
    def grams(s: String): Seq[String] = {
      val tk = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
      tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val rawG = raw.flatMap { case (id, s) => grams(s).map(id -> _) }
    val tgtG = tgt.flatMap(grams)
    val rc = rawG.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tc = tgtG.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val space = (rc.keySet ++ tc.keySet).toSeq
    val (rtot, ttot, v) = (rc.values.sum, tc.values.sum, space.size)
    val lambda = space.map { g =>
      g -> (math.log((tc.getOrElse(g, 0L) + 1.0) / (ttot + 1.0 * v)) -
            math.log((rc.getOrElse(g, 0L) + 1.0) / (rtot + 1.0 * v)))
    }.toMap
    raw.map { case (id, s) =>
      val gs = grams(s)
      val w = gs.groupBy(identity).map { case (g, occ) =>
        BigDecimal(occ.size.toDouble * lambda(g))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      id -> (gs.size.toLong,
        BigDecimal(w.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.toMap
  }

  private val raw = Seq(
    (1L, "the cat sat"),
    (2L, "dog runs fast dog runs"),
    (3L, "the cat runs"),
    (4L, "  "))       // blank: zero grams, must survive
  private val tgt = Seq("the cat sat", "the cat naps")

  test("weights match an independent reference model; blank docs preserved at 0.0") {
    val rawDf = raw.toDF("doc_id", "text")
    val tgtDf = tgt.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
    val got = Dsir.importanceWeights(rawDf, tgtDf, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
    val want = refWeights(raw, tgt) + (4L -> (0L, 0.0))
    assert(got.toMap === want)
    // target-like doc must outrank the target-unlike one
    val byId = got.toMap
    assert(byId(1L)._2 > byId(2L)._2)
  }

  test("hashed-bucket path matches exact grams when buckets don't collide; topK ranks by weight") {
    val rawDf = raw.toDF("doc_id", "text")
    val tgtDf = tgt.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
    val exact = Dsir.importanceWeights(rawDf, tgtDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // 2^20 buckets over ~14 grams: collision-free (deterministic corpus)
    val hashed = Dsir.importanceWeights(rawDf, tgtDf, "doc_id", "text",
        nBuckets = Some(1 << 20))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(hashed === exact)

    val top = Dsir.selectTopK(rawDf, tgtDf, "doc_id", "text", k = 2)
      .collect().map(_.getLong(0))
    val ranked = exact.toSeq.sortBy { case (id, w) => (-w, id) }.map(_._1)
    assert(top.toSeq === ranked.take(2))
  }
}
