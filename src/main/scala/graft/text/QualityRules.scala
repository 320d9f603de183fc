package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-quality heuristics in the style of the published C4 and
  * Gopher curation rules: word-shape gates, symbol density, bullet /
  * ellipsis line structure, and repetition measures (duplicate lines,
  * most-repeated word bigram). The heuristic FAMILY is public
  * knowledge (Raffel et al. 2020 §2.2; Rae et al. 2021 appendix A);
  * the exact definitions here are our own and are mirrored verbatim by
  * the `q_quality_rules` DuckDB oracle.
  *
  * Scale posture: every per-document feature except the top-bigram
  * fraction is a pure Column expression over the row's own text —
  * zero shuffles, whole-stage codegen. The top-bigram fraction needs
  * per-(doc, bigram) counts; arrays-only evaluation would be O(n²) in
  * document length, so it runs as explode → map-side-combined count
  * shuffle keyed by (doc, bigram) → per-doc max, which survives any
  * document length. Duplicate-line stats deliberately use the
  * `array_distinct` identity (dups = n − n_distinct) instead of a
  * shuffle: a document's line array is bounded by the document itself.
  *
  * Beyond the reference's surface (its analytics package is empty,
  * `src/analytics/__init__.py:1`); part of the training-data layer.
  */
object QualityRules {

  /** The shared tokenizer ([[TextAnalysis.words]]) — one definition
    * for every word-level operator and its oracle mirror. */
  def words(text: Column): Column = TextAnalysis.words(text)

  /** Non-blank trimmed lines (newline-delimited). */
  def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  private def sumLen(arr: Column): Column =
    aggregate(transform(arr, x => length(x)), lit(0L), (a, x) => a + x)

  /** Mean characters per word; 0.0 for wordless text. One exact
    * integer sum and one IEEE division — bit-identical across engines.
    */
  def meanWordLength(text: Column): Column = {
    val ws = words(text)
    when(size(ws) === 0, lit(0.0))
      .otherwise(sumLen(ws).cast("double") / size(ws).cast("double"))
  }

  /** Symbol-to-word ratio: occurrences of '#', '...' and '…' per word
    * (Gopher's "symbol" set). Counted by length differencing so the
    * whole thing stays one codegen'd expression.
    */
  def symbolWordRatio(text: Column): Column = {
    val hash = length(text) - length(regexp_replace(text, "#", ""))
    val dots3 = (length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))).cast("double") / 3.0
    val hellip = length(text) - length(regexp_replace(text, "…", ""))
    (hash + dots3 + hellip) / greatest(size(words(text)), lit(1)).cast("double")
  }

  /** Fraction of words containing at least one ASCII letter. */
  def alphaWordFraction(text: Column): Column = {
    val ws = words(text)
    when(size(ws) === 0, lit(0.0))
      .otherwise(size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double")
        / size(ws).cast("double"))
  }

  /** Fraction of lines that start like a bullet point. */
  def bulletLineFraction(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) === 0, lit(0.0))
      .otherwise(size(filter(ls,
        l => substring(l, 1, 1).isin("-", "*", "•"))).cast("double")
        / size(ls).cast("double"))
  }

  /** Fraction of lines ending in an ellipsis ('...' or '…'). */
  def ellipsisLineFraction(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) === 0, lit(0.0))
      .otherwise(size(filter(ls,
        l => l.endsWith("...") || l.endsWith("…"))).cast("double")
        / size(ls).cast("double"))
  }

  /** Fraction of line occurrences beyond each line's first —
    * (n − n_distinct) / n, the no-shuffle duplicate measure.
    */
  def dupLineFraction(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) === 0, lit(0.0))
      .otherwise((size(ls) - size(array_distinct(ls))).cast("double")
        / size(ls).cast("double"))
  }

  /** Character-weighted twin of [[dupLineFraction]]: chars in repeat
    * occurrences / chars in all lines.
    */
  def dupLineCharFraction(text: Column): Column = {
    val ls = lines(text)
    val total = sumLen(ls)
    when(total === 0, lit(0.0))
      .otherwise((total - sumLen(array_distinct(ls))).cast("double")
        / total.cast("double"))
  }

  // Array-input twins of the per-row features, for plans that have
  // already materialized the split ([[qualityStats]]): the regex
  // word/line splits are the dominant per-row cost, and the
  // text-input forms above recompute them once PER FEATURE —
  // CollapseProject keeps a projection boundary when an expensive
  // producer is referenced more than once, so splitting once into
  // `__ws`/`__ls` and deriving every feature from the array columns
  // runs each split exactly once per row. Definitions are verbatim
  // the same expressions, so oracle parity is untouched.
  private def meanWordLenOf(ws: Column): Column =
    when(size(ws) === 0, lit(0.0))
      .otherwise(sumLen(ws).cast("double") / size(ws).cast("double"))

  private def symbolRatioOf(text: Column, ws: Column): Column = {
    val hash = length(text) - length(regexp_replace(text, "#", ""))
    val dots3 = (length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))).cast("double") / 3.0
    val hellip = length(text) - length(regexp_replace(text, "…", ""))
    (hash + dots3 + hellip) / greatest(size(ws), lit(1)).cast("double")
  }

  private def alphaWordFracOf(ws: Column): Column =
    when(size(ws) === 0, lit(0.0))
      .otherwise(size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double")
        / size(ws).cast("double"))

  private def bulletLineFracOf(ls: Column): Column =
    when(size(ls) === 0, lit(0.0))
      .otherwise(size(filter(ls,
        l => substring(l, 1, 1).isin("-", "*", "•"))).cast("double")
        / size(ls).cast("double"))

  private def ellipsisLineFracOf(ls: Column): Column =
    when(size(ls) === 0, lit(0.0))
      .otherwise(size(filter(ls,
        l => l.endsWith("...") || l.endsWith("…"))).cast("double")
        / size(ls).cast("double"))

  private def dupLineFracOf(ls: Column): Column =
    when(size(ls) === 0, lit(0.0))
      .otherwise((size(ls) - size(array_distinct(ls))).cast("double")
        / size(ls).cast("double"))

  private def dupLineCharFracOf(ls: Column): Column = {
    val total = sumLen(ls)
    when(total === 0, lit(0.0))
      .otherwise((total - sumLen(array_distinct(ls))).cast("double")
        / total.cast("double"))
  }

  /** Per-document repetition via the most-repeated word bigram:
    * max over bigrams of count·length(bigram) / total word chars.
    * Maximizing the fraction itself (not "the top bigram's" fraction)
    * makes the result tie-break-free. Input must carry a unique
    * `idCol`; output is (idCol, top_bigram_char_frac), one row per
    * document that has ≥2 words — join back and coalesce(0.0) for the
    * rest.
    */
  def topBigramCharFraction(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ws = words(col(textCol))
    topBigramFromWords(
      df.select(col(idCol), ws.as("__ws")), idCol)
  }

  /** [[topBigramCharFraction]] over a frame that already carries the
    * split words as `__ws` — lets [[qualityStats]] run the word split
    * once for both the per-row features and this aggregate branch.
    */
  private def topBigramFromWords(pre: DataFrame, idCol: String): DataFrame = {
    val bigrams = pre
      .select(col(idCol), col("__ws"), sumLen(col("__ws")).as("__wchars"))
      .filter(size(col("__ws")) >= 2)
      .select(col(idCol), col("__wchars"),
        explode(transform(sequence(lit(0), size(col("__ws")) - 2),
          i => concat(element_at(col("__ws"), i + 1), lit(" "),
            element_at(col("__ws"), i + 2)))).as("__g"))
    bigrams
      .groupBy(col(idCol), col("__g"), col("__wchars"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(max(col("__c") * length(col("__g"))).cast("double")
        .as("__top_chars"),
        first(col("__wchars")).as("__wchars"))
      .select(col(idCol),
        (col("__top_chars") / col("__wchars").cast("double"))
          .as("top_bigram_char_frac"))
  }

  /** Per-document duplicate word-n-gram character fraction (the
    * Gopher-family "fraction of characters in duplicate n-grams"):
    * chars in n-gram occurrences beyond each gram's first, over total
    * n-gram chars. Same explode → map-side-combined (doc, gram) count
    * shuffle as [[topBigramCharFraction]]; same arrays-would-be-O(n²)
    * reasoning. Output: (idCol, dup_ngram_char_frac), one row per doc
    * with ≥ n words — join back and coalesce(0.0).
    */
  def dupNgramCharFraction(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 2, "dupNgramCharFraction needs n >= 2")
    val ws = words(col(textCol))
    df.select(col(idCol), ws.as("__ws"))
      .filter(size(col("__ws")) >= n)
      .select(col(idCol),
        explode(transform(sequence(lit(0), size(col("__ws")) - n),
          i => concat_ws(" ", slice(col("__ws"), i + 1, lit(n))))).as("__g"))
      .groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum((col("__c") - 1) * length(col("__g"))).as("__dup_chars"),
        sum(col("__c") * length(col("__g"))).as("__all_chars"))
      .select(col(idCol),
        (col("__dup_chars").cast("double") / col("__all_chars").cast("double"))
          .as("dup_ngram_char_frac"))
  }

  /** All quality features for each document, plus the composite `keep`
    * gate evaluated on the RAW (unrounded) feature values — the
    * C4/Gopher-style accept decision. Thresholds are the published
    * ballpark (see object doc); override per corpus.
    */
  def qualityStats(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val text = col(textCol)
    // split once; every feature derives from the array columns (see
    // the array-twin note above — this is the dominant-cost saver)
    val base = df.select(col(idCol), text.as("__text"),
      words(text).as("__ws"), lines(text).as("__ls"))
    val ws = col("__ws")
    val ls = col("__ls")
    val perRow = base.select(
      col(idCol),
      size(ws).cast("long").as("n_words"),
      meanWordLenOf(ws).as("mean_word_len"),
      symbolRatioOf(col("__text"), ws).as("symbol_ratio"),
      alphaWordFracOf(ws).as("alpha_word_frac"),
      bulletLineFracOf(ls).as("bullet_line_frac"),
      ellipsisLineFracOf(ls).as("ellipsis_line_frac"),
      dupLineFracOf(ls).as("dup_line_frac"),
      dupLineCharFracOf(ls).as("dup_line_char_frac"))
    val top = topBigramFromWords(base, idCol)
    perRow.join(top, Seq(idCol), "left")
      .withColumn("top_bigram_char_frac",
        coalesce(col("top_bigram_char_frac"), lit(0.0)))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") < 0.1 &&
          col("alpha_word_frac") > 0.8 &&
          col("bullet_line_frac") < 0.9 &&
          col("ellipsis_line_frac") < 0.3 &&
          col("dup_line_frac") < 0.3 &&
          col("dup_line_char_frac") < 0.3 &&
          col("top_bigram_char_frac") < 0.2)
  }
}
