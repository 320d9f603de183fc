package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document duplicated-span analysis (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better",
  * arXiv:2107.06499): for every document, the fraction of its word
  * n-grams that also occur in at least one OTHER document. Where
  * [[QualityRules]]' repetition stats are within-doc and the MinHash
  * path judges whole-document similarity, this is the span-level
  * cross-doc view — the signal behind exact-substring dedup: a doc
  * can be globally unique yet assembled from boilerplate spans shared
  * across the corpus.
  *
  * Scale posture: distinct (doc, gram) explode → gram-keyed
  * doc-frequency agg (map-side combined) → join back on the SAME gram
  * key → doc-keyed count agg. Four keyed exchanges, all O(corpus
  * grams), no pairwise anything — the gram's doc-frequency stands in
  * for the quadratic "which docs share this span" join a naive
  * implementation would do.
  */
object SpanDedup {

  /** Word n-grams of `textCol` as one array: whitespace tokens, then
    * every length-`n` window joined by single spaces; docs shorter
    * than `n` tokens collapse to one whole-doc gram (the NgramHashes
    * convention, and DuckDB's truncating list-slice semantics, so the
    * SQL oracle derives the identical set).
    */
  def wordGrams(textCol: Column, n: Int): Column = {
    val tk = split(trim(textCol), "\\s+")
    transform(
      sequence(lit(1), greatest(size(tk) - lit(n - 1), lit(1))),
      i => concat_ws(" ", slice(tk, i, lit(n))))
  }

  /** Per-document report: (idCol, n_grams, n_dup_grams, dup_frac).
    * `n_grams` counts DISTINCT grams in the doc; a gram is duplicated
    * iff it occurs in ≥ 2 distinct documents. Blank docs are
    * preserved as (0, 0, null) — the row-preservation contract.
    */
  def dupSpanReport(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val dg = docs
      .filter(trim(col(textCol)) =!= "")
      .select(col(idCol), explode(wordGrams(col(textCol), n)).as("__g"))
      .distinct()
    // doc-frequency per gram: dg is already distinct per (doc, gram),
    // so count(*) IS the distinct-doc count — no countDistinct state
    val dfreq = dg.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    val per = dg.join(dfreq, Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
    docs.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        when(col("n_grams") > 0,
          round(col("n_dup_grams").cast("double") /
            col("n_grams").cast("double"), 6)).as("dup_frac"))
  }

  /** Drop documents whose duplicated-span fraction exceeds
    * `maxDupFrac` — the document-level filter built on the report
    * (span-level surgery is a tokenizer-coupled editorial decision;
    * the filter form is what curation pipelines compose). Blank docs
    * survive (nothing duplicated).
    */
  def dropDuplicated(docs: DataFrame, idCol: String, textCol: String,
      n: Int, maxDupFrac: Double): DataFrame =
    docs.join(
      dupSpanReport(docs, idCol, textCol, n)
        .filter(coalesce(col("dup_frac") <= maxDupFrac, lit(true)))
        .select(col(idCol)),
      Seq(idCol), "left_semi")
}
