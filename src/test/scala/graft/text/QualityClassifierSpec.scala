package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val clean =
    "the cat sat on the mat and it was a good day for all of us in the sun"
  private val junk = "@@## $$%% ^^&& ** !!| ~~`` <<>> {}[] ||\\ ++=="

  private def corpus(n: Int) =
    ((1 to n).map(i => (i.toLong, clean + " " + i, 1)) ++
      (1 to n).map(i => ((100 + i).toLong, junk + " " + i, 0)))
      .toDF("doc_id", "text", "y")

  test("learns to separate prose from junk (train AUC = 1 on a separable task)") {
    val docs = corpus(15)
    val scored = QualityClassifier.trainAndScore(docs, "doc_id", "text",
        col("y") === 1, iters = 10, lr = 2.0)
      .select("label", "score").as[(Int, Double)].collect()
    val pos = scored.filter(_._1 == 1).map(_._2)
    val neg = scored.filter(_._1 == 0).map(_._2)
    assert(pos.min > neg.max,
      s"separable task not separated: pos.min=${pos.min} neg.max=${neg.max}")
  }

  test("gradient direction: stopword weight positive, punct weight negative") {
    val m = QualityClassifier.train(
      QualityClassifier.features(corpus(15), "doc_id", "text", col("y") === 1),
      iters = 10, lr = 2.0)
    assert(m.weights(0) > 0) // stopword ratio predicts prose
    assert(m.weights(1) < 0) // punct ratio predicts junk
  }

  test("trained model is bit-identical under repartitioning (exact gradient sums)") {
    val docs = corpus(20)
    val f1 = QualityClassifier.features(docs.repartition(1), "doc_id", "text",
      col("y") === 1)
    val f7 = QualityClassifier.features(docs.repartition(7), "doc_id", "text",
      col("y") === 1)
    val m1 = QualityClassifier.train(f1, iters = 4)
    val m7 = QualityClassifier.train(f7, iters = 4)
    assert(m1.bias == m7.bias)
    assert(m1.weights == m7.weights)
  }

  test("one GD step matches the hand-computed gradient") {
    // single feature column via the public API: check step arithmetic on
    // a 2-doc corpus with known features
    val docs = Seq((1L, "the the the the", 1), (2L, "zzz qqq vvv kkk", 0))
      .toDF("doc_id", "text", "y")
    val f = QualityClassifier.features(docs, "doc_id", "text", col("y") === 1)
    val rows = f.orderBy("doc_id").collect()
    val m = QualityClassifier.train(f, iters = 1, lr = 1.0)
    // at w=0: sigma = 0.5 for every row; r = 0.5 - y
    def d12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expB = -(d12(0.5 - 1.0) + d12(0.5 - 0.0)) / 2
    assert(m.bias == expB)
    (0 until 3).foreach { j =>
      val g = rows.map { r =>
        d12((0.5 - r.getDouble(1)) * r.getDouble(2 + j)) }.sum / 2
      assert(math.abs(m.weights(j) - (-g)) < 1e-12)
    }
  }
}
