package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring — the CCNet-style "how
  * surprising is this document under the corpus's own token
  * distribution" proxy (Wenzek et al. 2020 use a real LM; the unigram
  * form is the standard cheap stand-in): per document, the mean
  * negative log-likelihood of its tokens under the corpus unigram
  * model. Low = bland/common text, high = rare-token-heavy (often
  * junk, boilerplate codes, non-language); both tails are the usual
  * filter targets.
  *
  * Scale posture: model build is one token-keyed count shuffle with
  * map-side combine; scoring is one token-keyed equi-join (unique
  * build keys — Zipf skew sits on the probe side, where AQE skew
  * splits apply) and one doc-keyed agg. Nothing quadratic, no
  * driver-side state; the token-count total rides a 1-row broadcast.
  *
  * Determinism: per-token −ln p values are cast to DECIMAL(20,10)
  * BEFORE summing, so the per-doc sum is order-independent (double
  * summation would vary with partitioning); the final mean divides
  * once in double.
  */
object UnigramLm {

  /** Corpus unigram model: (token, cnt, p) with p = cnt / total
    * tokens, both derived in-plan (the 1-row total is broadcast).
    * Tokens are [[TextAnalysis.words]] — the shared whitespace
    * tokenizer every word-level operator and oracle uses.
    */
  def model(df: DataFrame, textCol: String): DataFrame = {
    val toks = df.select(
      explode(TextAnalysis.words(col(textCol))).as("token"))
    val total = toks.agg(count(lit(1)).as("__total"))
    toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .select(col("token"), col("cnt"),
        (col("cnt").cast("double") / col("__total").cast("double")).as("p"))
  }

  /** Per-document mean NLL under `model` (typically
    * [[model]](corpus) — scoring one corpus against another's model
    * is the cross-corpus variant, same plan). Every input row comes
    * back: token-less (blank) docs score (n_tokens = 0,
    * mean_nll = null) via the keyed left join — the row-preservation
    * contract ([[Vocab.encode]] precedent).
    */
  def meanNll(df: DataFrame, idCol: String, textCol: String,
      lm: DataFrame): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextAnalysis.words(col(textCol))).as("token"))
    val scored = toks
      .join(lm.select(col("token"), col("p")), Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum((-log(col("p"))).cast("decimal(20,10)")).as("__s"))
      .select(col(idCol), col("n_tokens"),
        round(col("__s").cast("double") / col("n_tokens").cast("double"), 6)
          .cast("double").as("mean_nll"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("mean_nll"))
  }

  /** Self-scoring convenience: each doc against its own corpus's
    * model. */
  def meanNll(df: DataFrame, idCol: String, textCol: String): DataFrame =
    meanNll(df, idCol, textCol, model(df, textCol))

  // ----------------------------------------------------- bigram LM

  /** Per-row bigram strings "u v" from the shared whitespace tokenizer
    * — zip of the word array with its own tail (no shuffle, no window:
    * the pair construction is embarrassingly parallel per row; a
    * per-doc window lead would shuffle the corpus on doc id for
    * nothing). Docs with < 2 tokens → empty array.
    */
  def bigrams(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val w = TextAnalysis.words(text)
    when(size(w) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => concat(a, lit(" "), b)))
  }

  /** Per-document mean NLL under an add-k-smoothed corpus BIGRAM model
    * (Jurafsky & Martin ch. 3): P(v|u) = (c(u,v) + k) / (c(u·) + k·V)
    * with c(u·) the prefix count (Σ_v c(u,v), so probabilities
    * normalize) and V the corpus vocabulary size. The sequence-aware
    * upgrade of [[meanNll]]: scrambled-word junk that the unigram
    * model scores as bland lights up here (every bigram unseen →
    * each transition costs ≈ −ln(k / (c(u·)+kV))).
    *
    * Plan: one bigram-keyed count shuffle (map-side combined), one
    * prefix-keyed count, scoring joins on those keys, one doc-keyed
    * agg; V rides a 1-row broadcast. Zipf skew sits on the probe side
    * of unique-key build joins. Determinism: per-bigram −ln p decimal-
    * cast before the per-doc sum; row preservation: docs with < 2
    * tokens come back (0, null) via the keyed left join.
    */
  def bigramMeanNll(df: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    val pairs = df.select(col(idCol),
        explode(bigrams(col(textCol))).as("bg"))
      .withColumn("u", substring_index(col("bg"), " ", 1))
    val c2 = pairs.groupBy("bg").agg(count(lit(1)).as("c2"))
    val c1 = pairs.groupBy("u").agg(count(lit(1)).as("c1"))
    val vocab = df.select(
        explode(TextAnalysis.words(col(textCol))).as("token"))
      .agg(countDistinct(col("token")).as("__v"))
    val p = (col("c2").cast("double") + lit(k)) /
      (col("c1").cast("double") + lit(k) * col("__v").cast("double"))
    val scored = pairs
      .join(c2, Seq("bg")).join(c1, Seq("u"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum((-log(p)).cast("decimal(20,10)")).as("__s"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__s").cast("double") / col("n_bigrams").cast("double"), 6)
          .cast("double").as("mean_nll"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("mean_nll"))
  }
}
