package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call corpus statistics — the report a data curator runs before
  * and after every pipeline change: volume, token mass, language
  * spread, exact-dup rate and quality pass rate in ONE aggregation
  * pass over the corpus (every metric is an aggregate of per-row
  * expressions, so the whole report costs a single scan at any corpus
  * size — no per-metric jobs, the reference's profiling anti-pattern).
  */
object CorpusReport {

  /** One row: n_docs, total_tokens, mean_token_len (corpus-wide chars
    * per token), n_langs, dup_rate (1 − distinct normalized
    * fingerprints / docs), quality_pass_rate (share with
    * [[TextAnalysis.qualityScore]] ≥ `qualityFloor`). Integer sums +
    * single divisions → engine-exact; doubles rounded to 6.
    */
  def summary(docs: DataFrame, textCol: String, langCol: String,
      qualityFloor: Double = 0.5): DataFrame = {
    val text = col(textCol)
    val norm = TextAnalysis.normalized(text) // the fingerprint/dedup key
    val toks = TextAnalysis.tokenCount(text).cast("long")
    val chars = length(regexp_replace(trim(text), "\\s+", "")).cast("long")
    docs.agg(
      count(lit(1)).as("n_docs"),
      sum(toks).as("total_tokens"),
      when(sum(toks) === 0, lit(0.0)) // all-blank corpus: define 0, not 0/0
        .otherwise(round(sum(chars).cast("double") / sum(toks).cast("double"), 6))
        .cast("double").as("mean_token_len"),
      countDistinct(col(langCol)).as("n_langs"),
      round(lit(1.0) - countDistinct(norm).cast("double")
        / count(lit(1)).cast("double"), 6).cast("double").as("dup_rate"),
      round(count(when(round(TextAnalysis.qualityScore(text), 6)
          >= qualityFloor, 1)).cast("double")
        / count(lit(1)).cast("double"), 6).cast("double")
        .as("quality_pass_rate"))
  }
}
