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
}
