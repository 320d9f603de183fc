package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the fastText/CCNet move (Joulin et al.
  * 2017; Wenzek et al. 2020): instead of hand-tuned thresholds
  * ([[QualityRules]]), learn a linear model over cheap text features
  * from weak labels and score every document with it. Here: logistic
  * regression by FULL-BATCH gradient descent where each iteration is
  * ONE distributed aggregate — the gradient is a (k+1)-vector of
  * sufficient statistics Σ(σ(w·x)−y)·x_j, so training at 100 TB is
  * `iters` cached scans and nothing else. Only k+1 doubles per
  * iteration reach the driver (the trainCentroids precedent).
  *
  * Determinism (the oracle contract): every per-row quantity —
  * features, z, σ(z) — is a deterministic IEEE double given the same
  * weights; each row's gradient contribution is decimal-cast before
  * the sum, so partial-aggregation order cannot perturb the model;
  * weight updates replay the identical double arithmetic in both
  * engines. The learned weights are therefore BIT-identical to a
  * DuckDB CTE-chain replay of the same iterations.
  */
object QualityClassifier {

  final case class Model(bias: Double, weights: Seq[Double])

  /** Standard feature triple: English-stopword ratio (natural-prose
    * signal), punctuation ratio (markup/junk signal), log doc length.
    * All are [[TextAnalysis]] column expressions with proven SQL
    * oracle twins.
    */
  def features(df: DataFrame, idCol: String, textCol: String,
      label: Column): DataFrame =
    df.select(col(idCol), label.cast("double").as("y"),
      TextAnalysis.stopwordRatio(col(textCol)).as("x1"),
      TextAnalysis.punctRatio(col(textCol)).as("x2"),
      log(lit(1.0) + length(col(textCol)).cast("double")).as("x3"))

  private def zOf(bias: Double, weights: Seq[Double],
      featCols: Seq[String]): Column =
    featCols.zipWithIndex.foldLeft(lit(bias): Column) {
      case (acc, (c, i)) => acc + lit(weights(i)) * col(c)
    }

  private def sigmoid(z: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-z))

  /** Full-batch GD from w = 0. One aggregate per iteration; exact
    * decimal gradient sums; updates w_j ← w_j − lr·(Σr·x_j / n).
    */
  def train(feats: DataFrame, featCols: Seq[String] = Seq("x1", "x2", "x3"),
      iters: Int = 3, lr: Double = 1.0): Model = {
    var bias = 0.0
    var w = Seq.fill(featCols.size)(0.0)
    val cached = feats.cache()
    try {
      (0 until iters).foreach { _ =>
        val r = (sigmoid(zOf(bias, w, featCols)) - col("y")).as("__r")
        val gradAggs =
          sum(col("__r").cast("decimal(28,12)")).cast("double").as("sb") +:
            featCols.zipWithIndex.map { case (c, i) =>
              sum((col("__r") * col(c)).cast("decimal(28,12)")).cast("double")
                .as(s"s$i")
            }
        val row: Row = cached.withColumn("__r", r)
          .agg(count(lit(1)).as("n"), gradAggs: _*).head()
        val n = row.getLong(0).toDouble
        bias = bias - lr * (row.getDouble(1) / n)
        w = w.indices.map(i => w(i) - lr * (row.getDouble(i + 2) / n))
      }
      Model(bias, w)
    } finally cached.unpersist()
  }

  /** Per-doc probability under the model: (id, label, score). */
  def score(feats: DataFrame, idCol: String, model: Model,
      featCols: Seq[String] = Seq("x1", "x2", "x3")): DataFrame =
    feats.select(col(idCol), col("y").cast("int").as("label"),
      round(sigmoid(zOf(model.bias, model.weights, featCols)), 6)
        .cast("double").as("score"))

  /** Train-and-score convenience over raw documents. */
  def trainAndScore(df: DataFrame, idCol: String, textCol: String,
      label: Column, iters: Int = 3, lr: Double = 1.0): DataFrame = {
    val f = features(df, idCol, textCol, label)
    score(f, idCol, train(f, iters = iters, lr = lr))
  }
}
