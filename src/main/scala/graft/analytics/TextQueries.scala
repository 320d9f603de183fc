package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.text.TextAnalysis

/** Text-analysis operators over the documents corpus, oracle-verified
  * where ANSI-SQL-expressible (token counts, ratios, quality formula
  * — the DuckDB twin mirrors each expression exactly, with 'g' flags
  * where DuckDB's regexp_replace is single-match by default).
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Token counting + length stats (whitespace tokenizer; the BPE-ish
    * regex variant is Spark-only because RE2 lacks lookaround —
    * covered by TextAnalysisSpec instead).
    */
  val qTextTokens: QueryDef = QueryDef.sql(
    "q_text_tokens",
    """SELECT doc_id,
      |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
      |  length(text) AS n_chars,
      |  CAST(round(length(regexp_replace(trim(text), '\s+', '', 'g'))
      |    / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 6) AS DOUBLE)
      |    AS mean_token_len
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
    doc = "token counting + mean token length (training-data text ops)") { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars"),
        round(TextAnalysis.meanTokenLength(col("text")), 6).cast("double")
          .as("mean_token_len"))
      .orderBy("doc_id")
  }

  /** Quality scoring: the full composite formula mirrored in SQL —
    * length score, punctuation penalty, token-shape score, stopword
    * score, equally weighted.
    */
  val qTextQuality: QueryDef = QueryDef.sql(
    "q_text_quality",
    """WITH feats AS (
      |  SELECT doc_id,
      |    least(length(text) / 500.0, 1.0) AS len_score,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |      ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
      |           / CAST(length(text) AS DOUBLE) END AS punct_ratio,
      |    length(regexp_replace(trim(text), '\s+', '', 'g'))
      |      / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS mean_tok,
      |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |        tk -> tk IN ('the','a','an','and','or','of','to','in','is','are',
      |                    'was','it','that','this','for','on','with','as','at','by')))
      |      / CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE)
      |      AS stop_ratio
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(round(
      |    least(len_score, 1.0) * 0.25 +
      |    greatest(0.0, 1.0 - punct_ratio * 5.0) * 0.25 +
      |    (CASE WHEN mean_tok BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.25 +
      |    least(stop_ratio * 4.0, 1.0) * 0.25, 6) AS DOUBLE) AS quality
      |FROM feats ORDER BY doc_id""".stripMargin,
    doc = "composite text quality score (training-data text ops)") { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).cast("double").as("quality"))
      .orderBy("doc_id")
  }

  /** Language ID per document. The marker-word heuristic is fully
    * SQL-expressible, so the oracle mirrors it exactly: same
    * tokenization, same per-language hit counts, same argmax with
    * first-language tie-break. (The CJK codepoint branch never fires
    * on this all-ASCII corpus, verified at both SFs; accuracy on real
    * multilingual prose is asserted in TextAnalysisSpec.)
    */
  val qTextLangId: QueryDef = QueryDef.sql(
    "q_text_langid",
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split_regex(lower(trim(text)), '[\s[:punct:]]+') AS tk
      |  FROM documents),
      |scores AS (
      |  SELECT doc_id,
      |    len(list_filter(tk, t -> t IN ('the','and','of','to','is','with','that'))) AS s_en,
      |    len(list_filter(tk, t -> t IN ('der','die','und','das','ist','nicht','ein','mit'))) AS s_de,
      |    len(list_filter(tk, t -> t IN ('el','los','las','una','que','por','para','con'))) AS s_es,
      |    len(list_filter(tk, t -> t IN ('le','les','des','une','est','dans','pour','sur'))) AS s_fr
      |  FROM toks)
      |SELECT doc_id,
      |  CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
      |       WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
      |       WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
      |       WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
      |       ELSE 'fr' END AS lang_pred
      |FROM scores ORDER BY doc_id""".stripMargin,
    doc = "n-gram/stopword language ID (training-data text ops)") { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.languageId(col("text")).as("lang_pred"))
      .orderBy("doc_id")
  }

  /** Fingerprint distinctness: count of distinct 64-bit normalized-
    * text fingerprints must equal count of distinct normalized texts
    * (oracle computes the latter; equality fails on any hash
    * collision or normalization mismatch).
    */
  val qTextFingerprint: QueryDef = QueryDef.sql(
    "q_text_fingerprint",
    """SELECT count(*) AS n_docs,
      |  count(DISTINCT regexp_replace(regexp_replace(lower(text),
      |    '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS n_unique
      |FROM documents""".stripMargin,
    doc = "rolling-hash document fingerprinting (training-data text ops)") { (s, dir) =>
    t(s, dir, "documents")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(TextAnalysis.fingerprint(col("text"))).as("n_unique"))
  }

  /** Explode / LATERAL coverage: corpus-wide token frequencies — the
    * generate-operator shape (one explode, map-side pre-aggregation,
    * one shuffle on the token) every text pipeline starts from.
    * Top-20 with deterministic tie-break.
    */
  val qTokenFreq: QueryDef = QueryDef.sql(
    "q_token_freq",
    """SELECT token, count(*) AS n FROM (
      |  SELECT unnest(string_split_regex(lower(trim(text)), '[\s[:punct:]]+')) AS token
      |  FROM documents)
      |WHERE token != ''
      |GROUP BY token
      |ORDER BY n DESC, token LIMIT 20""".stripMargin,
    doc = "explode + token frequency top-k (LATERAL/generate shape)") { (s, dir) =>
    t(s, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "[\\s\\p{Punct}]+"))
        .as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)
  }

  /** The canonical training-data selection flow as ONE plan: quality
    * score → threshold filter → language filter → exact dedup on the
    * normalized-text fingerprint (keep lowest doc_id) → selected ids.
    * Every stage has an exact SQL twin, so the whole pipeline is
    * hash-verified end-to-end — the text-side counterpart of
    * q_dedup_pipeline.
    */
  val qSelectPipeline: QueryDef = QueryDef.sql(
    "q_select_pipeline",
    """WITH feats AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'),
      |      '\s+', ' ', 'g') AS norm,
      |    least(length(text) / 500.0, 1.0) * 0.25 +
      |    greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
      |      ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
      |           / CAST(length(text) AS DOUBLE) END) * 5.0) * 0.25 +
      |    (CASE WHEN length(regexp_replace(trim(text), '\s+', '', 'g'))
      |        / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
      |        BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.25 +
      |    least(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |        tk -> tk IN ('the','a','an','and','or','of','to','in','is','are',
      |                    'was','it','that','this','for','on','with','as','at','by')))
      |      / CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE)
      |      * 4.0, 1.0) * 0.25 AS quality
      |  FROM documents)
      |SELECT doc_id FROM (
      |  SELECT doc_id, row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
      |  FROM feats WHERE round(quality, 6) >= 0.5)
      |WHERE rn = 1
      |ORDER BY doc_id""".stripMargin,
    doc = "training-set selection: quality filter + fingerprint dedup (text ops)") { (s, dir) =>
    import graft.dedup.Dedup
    val scored = t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .filter(round(col("quality"), 6) >= 0.5)
    Dedup.exactTextDedup(scored, "text", "doc_id")
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** Token-budget sequence packing (concat-and-chunk): per-language
    * streams in doc_id order, 512-token bins, each doc assigned the
    * bin its first token lands in plus its in-bin offset. Pure integer
    * prefix-sum — the oracle mirrors the window exactly; `DIV`/`//`
    * keep both engines in integer arithmetic at any magnitude.
    */
  val qPackSequences: QueryDef = QueryDef.sql(
    "q_pack_sequences",
    """SELECT doc_id, lang, n_tokens,
      |  CAST(cum // 512 AS BIGINT) AS bin,
      |  CAST(cum % 512 AS BIGINT) AS bin_offset
      |FROM (
      |  SELECT doc_id, lang,
      |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
      |    coalesce(sum(len(string_split_regex(trim(text), '\s+')))
      |      OVER (PARTITION BY lang ORDER BY doc_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin,
    doc = "token-budget sequence packing (training-data batch layout)") { (s, dir) =>
    import graft.text.SequencePacking
    val toks = t(s, dir, "documents").select(col("doc_id"), col("lang"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    SequencePacking.packContiguous(toks, "doc_id", "n_tokens", "lang", 512L)
      .select("doc_id", "lang", "n_tokens", "bin", "bin_offset")
      .orderBy("doc_id")
  }

  /** PII redaction over planted contact strings: the corpus text is
    * salted in-plan with an email, a phone and an IP, then scrubbed;
    * the oracle plants and scrubs identically (same RE2-safe patterns,
    * 'g' flag where DuckDB is single-match by default). The redacted
    * text itself is the compared value — the strongest possible check.
    */
  val qTextRedact: QueryDef = QueryDef.sql(
    "q_text_redact",
    """SELECT doc_id,
      |  regexp_replace(
      |    regexp_replace(
      |      regexp_replace(
      |        text || ' reach a@b.io or 555-123-4567 via 10.0.0.1',
      |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |      '\d{3}[-.]\d{3}[-.]\d{4}', '[PHONE]', 'g'),
      |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '[IP]', 'g') AS redacted
      |FROM documents WHERE doc_id < 50
      |ORDER BY doc_id""".stripMargin,
    doc = "PII redaction: email/phone/IP scrubbing (training-data text ops)") { (s, dir) =>
    t(s, dir, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"),
        TextAnalysis.redactPii(
          concat(col("text"),
            lit(" reach a@b.io or 555-123-4567 via 10.0.0.1")))
          .as("redacted"))
      .orderBy("doc_id")
  }

  /** The WHOLE curation flow as one verified plan — redact → quality
    * filter → fingerprint dedup → weighted mixture → sequence packing:
    * every stage is an operator already proven alone; this query pins
    * their composition end-to-end (column flow, filter interactions,
    * window-over-filtered-input semantics). The 100 TB shape: two
    * window shuffles (norm-dedup, lang-rank) + one shard window —
    * everything else is per-row expression work on the scan.
    */
  val qCuratePipeline: QueryDef = QueryDef.sql(
    "q_curate_pipeline",
    """WITH red AS (
      |  SELECT doc_id, lang,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(text,
      |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |        '\d{3}[-.]\d{3}[-.]\d{4}', '[PHONE]', 'g'),
      |      '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '[IP]', 'g') AS rtext
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, lang, rtext,
      |    regexp_replace(regexp_replace(lower(rtext), '[[:punct:]]', '', 'g'),
      |      '\s+', ' ', 'g') AS norm,
      |    least(length(rtext) / 500.0, 1.0) * 0.25 +
      |    greatest(0.0, 1.0 - (CASE WHEN length(rtext) = 0 THEN 0.0
      |      ELSE (length(rtext) - length(regexp_replace(rtext, '[[:punct:]]', '', 'g')))
      |           / CAST(length(rtext) AS DOUBLE) END) * 5.0) * 0.25 +
      |    (CASE WHEN length(regexp_replace(trim(rtext), '\s+', '', 'g'))
      |        / CAST(len(string_split_regex(trim(rtext), '\s+')) AS DOUBLE)
      |        BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.25 +
      |    least(len(list_filter(string_split_regex(lower(trim(rtext)), '\s+'),
      |        tk -> tk IN ('the','a','an','and','or','of','to','in','is','are',
      |                    'was','it','that','this','for','on','with','as','at','by')))
      |      / CAST(len(string_split_regex(lower(trim(rtext)), '\s+')) AS DOUBLE)
      |      * 4.0, 1.0) * 0.25 AS quality
      |  FROM red),
      |selected AS (
      |  SELECT doc_id, lang, rtext FROM (
      |    SELECT doc_id, lang, rtext,
      |      row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
      |    FROM feats WHERE round(quality, 6) >= 0.5)
      |  WHERE rn = 1),
      |mixed AS (
      |  SELECT doc_id, lang, rtext FROM (
      |    SELECT doc_id, lang, rtext,
      |      row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      |    FROM selected)
      |  WHERE (lang = 'de' AND rn <= 12) OR (lang = 'en' AND rn <= 30)
      |     OR (lang = 'es' AND rn <= 6) OR (lang = 'fr' AND rn <= 9)
      |     OR (lang = 'zh' AND rn <= 3)),
      |toks AS (
      |  SELECT doc_id, lang,
      |    len(string_split_regex(trim(rtext), '\s+')) AS n_tokens
      |  FROM mixed)
      |SELECT doc_id, lang, n_tokens,
      |  CAST(cum // 256 AS BIGINT) AS bin,
      |  CAST(cum % 256 AS BIGINT) AS bin_offset
      |FROM (
      |  SELECT doc_id, lang, n_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM toks)
      |ORDER BY doc_id""".stripMargin,
    doc = "full curation pipeline: redact+quality+dedup+mixture+pack (training-data ops)") { (s, dir) =>
    import graft.dedup.Dedup
    import graft.profile.Sampling
    import graft.text.SequencePacking
    val weights = Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.15,
      "es" -> 0.1, "zh" -> 0.05)
    // Materialize the redacted corpus BEFORE the quality filter: the
    // optimizer pushes the filter through the projection, substituting
    // the 3-regex redact chain into every rtext reference of the
    // composite quality predicate (~8 evaluations per row — the
    // executed Filter shows eight inlined regexp_replace chains).
    // The checkpoint makes rtext a stored leaf: one redact pass, then
    // the filter reads a column. Measured at 10×: 3.0 s → 0.7 s.
    val red = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.redactPii(col("text")).as("rtext"))
      .localCheckpoint(true)
    val scored = red
      .withColumn("quality", TextAnalysis.qualityScore(col("rtext")))
      .filter(round(col("quality"), 6) >= 0.5)
      .drop("quality")
    val deduped = Dedup.exactTextDedup(scored, "rtext", "doc_id")
    val mixed = Sampling.mixtureSample(deduped, "lang", "doc_id", weights, 60)
    val toks = mixed.select(col("doc_id"), col("lang"),
      TextAnalysis.tokenCount(col("rtext")).cast("long").as("n_tokens"))
    SequencePacking.packContiguous(toks, "doc_id", "n_tokens", "lang", 256L)
      .select("doc_id", "lang", "n_tokens", "bin", "bin_offset")
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: every training doc's word-3-gram
    * overlap with the eval slice (doc_id % 50 == 0 plays the held-out
    * benchmark). n=3 because the synthetic corpus has a tiny
    * vocabulary; real corpora use 8–13 — same plan either way:
    * broadcast the eval gram set, scan the corpus once, one count
    * shuffle on doc_id.
    */
  val qDecontaminate: QueryDef = QueryDef.sql(
    "q_decontaminate",
    """WITH g AS (
      |  SELECT doc_id,
      |    string_split_regex(lower(trim(text)), '[\s[:punct:]]+') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(CASE WHEN len(toks) < 3
      |    THEN [array_to_string(toks, ' ')]
      |    ELSE list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> array_to_string(toks[i:i+2], ' '))) END) AS gram
      |  FROM g),
      |ev AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 50 = 0),
      |shared AS (
      |  SELECT s.doc_id, count(*) AS n_shared FROM sh s JOIN ev USING (gram)
      |  WHERE s.doc_id % 50 <> 0 GROUP BY 1)
      |SELECT d.doc_id, coalesce(n_shared, 0) AS n_shared,
      |  coalesce(n_shared, 0) > 0 AS contaminated
      |FROM documents d LEFT JOIN shared USING (doc_id)
      |WHERE d.doc_id % 50 <> 0 ORDER BY doc_id""".stripMargin,
    doc = "eval-set decontamination: word n-gram overlap report (training-data ops)") { (s, dir) =>
    import graft.text.Decontaminate
    val docs = t(s, dir, "documents")
    Decontaminate.contaminationReport(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0),
      "doc_id", "text", n = 3)
      .orderBy("doc_id")
  }

  /** TF-IDF top terms per document — the classic salience scorer a
    * text pipeline runs for keyword extraction: token explode → tf per
    * (doc, token) → df per token → join + one window rank per doc.
    * Shuffles on (doc,token), token, and doc — all keyed, nothing
    * quadratic; the doc-count scalar rides a broadcast.
    */
  val qTfidf: QueryDef = QueryDef.sql(
    "q_tfidf",
    """WITH d AS (
      |  SELECT doc_id,
      |    string_split_regex(lower(trim(text)), '[\s[:punct:]]+') AS tk
      |  FROM documents WHERE doc_id < 100),
      |tok AS (SELECT doc_id, unnest(tk) AS token FROM d),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM d)
      |SELECT doc_id, token, tf,
      |  CAST(round(tf * ln(n / CAST(df AS DOUBLE)), 6) AS DOUBLE) AS tfidf
      |FROM (
      |  SELECT t.doc_id, t.token, t.tf, f.df, n.n,
      |    row_number() OVER (PARTITION BY t.doc_id
      |      ORDER BY t.tf * ln(n.n / CAST(f.df AS DOUBLE)) DESC, t.token) AS rn
      |  FROM tf t JOIN df f USING (token) CROSS JOIN n)
      |WHERE rn <= 5 AND doc_id < 20
      |ORDER BY doc_id, tfidf DESC, token""".stripMargin,
    doc = "TF-IDF top-5 salient terms per doc (text analytics)") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"),
        split(lower(trim(col("text"))), "[\\s\\p{Punct}]+").as("tk"))
    val tok = d.select(col("doc_id"), explode(col("tk")).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy("token").agg(countDistinct("doc_id").as("df"))
    val n = d.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf_raw").desc, col("token"))
    tf.join(dfreq, "token").crossJoin(broadcast(n))
      .withColumn("tfidf_raw",
        col("tf") * log(col("n") / col("df").cast("double")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5 && col("doc_id") < 20)
      .select(col("doc_id"), col("token"), col("tf"),
        round(col("tfidf_raw"), 6).cast("double").as("tfidf"))
      .orderBy(col("doc_id"), col("tfidf").desc, col("token"))
  }

  /** C4/Gopher-style quality rules ([[graft.text.QualityRules]]): word
    * shape, symbol density, bullet/ellipsis structure, duplicate-line
    * and top-bigram repetition, and the composite keep gate — every
    * feature re-stated verbatim in the oracle, thresholds applied to
    * the RAW values on both sides (each feature is one exact integer
    * sum and one IEEE division, so raw doubles are bit-identical).
    * Only the top-bigram stat shuffles (keyed (doc, bigram) count with
    * map-side combine); everything else rides the scan.
    */
  val qQualityRules: QueryDef = QueryDef.sql(
    "q_quality_rules",
    """WITH base AS (
      |  SELECT doc_id, text,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS ws,
      |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
      |                l -> l <> '') AS ls
      |  FROM documents),
      |feat AS (
      |  SELECT doc_id,
      |    CAST(len(ws) AS BIGINT) AS n_words,
      |    CASE WHEN len(ws) = 0 THEN 0.0
      |      ELSE list_aggregate(list_transform(ws, w -> length(w)), 'sum')
      |           / CAST(len(ws) AS DOUBLE) END AS mean_word_len,
      |    ((length(text) - length(replace(text, '#', '')))
      |      + (length(text) - length(replace(text, '...', ''))) / 3.0
      |      + (length(text) - length(replace(text, '…', ''))))
      |      / CAST(greatest(len(ws), 1) AS DOUBLE) AS symbol_ratio,
      |    CASE WHEN len(ws) = 0 THEN 0.0
      |      ELSE len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
      |           / CAST(len(ws) AS DOUBLE) END AS alpha_word_frac,
      |    CASE WHEN len(ls) = 0 THEN 0.0
      |      ELSE len(list_filter(ls, l -> left(l, 1) IN ('-', '*', '•')))
      |           / CAST(len(ls) AS DOUBLE) END AS bullet_line_frac,
      |    CASE WHEN len(ls) = 0 THEN 0.0
      |      ELSE len(list_filter(ls, l -> ends_with(l, '...') OR ends_with(l, '…')))
      |           / CAST(len(ls) AS DOUBLE) END AS ellipsis_line_frac,
      |    CASE WHEN len(ls) = 0 THEN 0.0
      |      ELSE (len(ls) - len(list_distinct(ls))) / CAST(len(ls) AS DOUBLE)
      |      END AS dup_line_frac,
      |    CASE WHEN coalesce(list_aggregate(list_transform(ls, l -> length(l)), 'sum'), 0) = 0
      |      THEN 0.0
      |      ELSE (list_aggregate(list_transform(ls, l -> length(l)), 'sum')
      |            - list_aggregate(list_transform(list_distinct(ls), l -> length(l)), 'sum'))
      |           / CAST(list_aggregate(list_transform(ls, l -> length(l)), 'sum') AS DOUBLE)
      |      END AS dup_line_char_frac,
      |    CASE WHEN len(ws) = 0 THEN 0
      |      ELSE list_aggregate(list_transform(ws, w -> length(w)), 'sum')
      |      END AS wchars
      |  FROM base),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ws)),
      |    i -> ws[i] || ' ' || ws[i+1])) AS g
      |  FROM base WHERE len(ws) >= 2),
      |bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |topb AS (SELECT doc_id, max(c * length(g)) AS top_chars FROM bc GROUP BY 1),
      |raw AS (
      |  SELECT f.*,
      |    coalesce(CAST(top_chars AS DOUBLE) / CAST(wchars AS DOUBLE), 0.0)
      |      AS top_bigram_char_frac
      |  FROM feat f LEFT JOIN topb USING (doc_id))
      |SELECT doc_id, n_words,
      |  CAST(round(mean_word_len, 6) AS DOUBLE) AS mean_word_len,
      |  CAST(round(symbol_ratio, 6) AS DOUBLE) AS symbol_ratio,
      |  CAST(round(alpha_word_frac, 6) AS DOUBLE) AS alpha_word_frac,
      |  CAST(round(bullet_line_frac, 6) AS DOUBLE) AS bullet_line_frac,
      |  CAST(round(ellipsis_line_frac, 6) AS DOUBLE) AS ellipsis_line_frac,
      |  CAST(round(dup_line_frac, 6) AS DOUBLE) AS dup_line_frac,
      |  CAST(round(dup_line_char_frac, 6) AS DOUBLE) AS dup_line_char_frac,
      |  CAST(round(top_bigram_char_frac, 6) AS DOUBLE) AS top_bigram_char_frac,
      |  (n_words BETWEEN 50 AND 100000
      |   AND mean_word_len BETWEEN 3.0 AND 10.0
      |   AND symbol_ratio < 0.1 AND alpha_word_frac > 0.8
      |   AND bullet_line_frac < 0.9 AND ellipsis_line_frac < 0.3
      |   AND dup_line_frac < 0.3 AND dup_line_char_frac < 0.3
      |   AND top_bigram_char_frac < 0.2) AS keep
      |FROM raw ORDER BY doc_id""".stripMargin,
    doc = "C4/Gopher-style quality rules + keep gate (training-data text ops)") { (s, dir) =>
    import graft.text.QualityRules
    QualityRules.qualityStats(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_words"),
        round(col("mean_word_len"), 6).cast("double").as("mean_word_len"),
        round(col("symbol_ratio"), 6).cast("double").as("symbol_ratio"),
        round(col("alpha_word_frac"), 6).cast("double").as("alpha_word_frac"),
        round(col("bullet_line_frac"), 6).cast("double").as("bullet_line_frac"),
        round(col("ellipsis_line_frac"), 6).cast("double").as("ellipsis_line_frac"),
        round(col("dup_line_frac"), 6).cast("double").as("dup_line_frac"),
        round(col("dup_line_char_frac"), 6).cast("double").as("dup_line_char_frac"),
        round(col("top_bigram_char_frac"), 6).cast("double").as("top_bigram_char_frac"),
        col("keep"))
      .orderBy("doc_id")
  }

  /** URL canonicalization + dedup ([[graft.text.UrlNormalize]]): five
    * planted variants of each page URL — verbatim, SHOUTED host, an
    * explicit `:443` + trailing slash, `utm_*` tracking + a PHPSESSID
    * session-id param (both on the IA/CC strip list), and
    * unordered real params + fragment — are canonicalized in-plan; the
    * first four collapse to one canonical form (dedup keeps the lowest
    * doc_id), the fifth keeps its sorted real query and stays distinct.
    * The canonical STRING is the compared value; the oracle restates
    * every regex/array step verbatim.
    */
  val qUrlDedup: QueryDef = QueryDef.sql(
    "q_url_dedup",
    """WITH u AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 5 AS INT)
      |      WHEN 0 THEN 'https://example.com/page/' || CAST(doc_id % 50 AS VARCHAR)
      |      WHEN 1 THEN 'HTTPS://EXAMPLE.COM/page/' || CAST(doc_id % 50 AS VARCHAR)
      |      WHEN 2 THEN 'https://example.com:443/page/' || CAST(doc_id % 50 AS VARCHAR) || '/'
      |      WHEN 3 THEN 'https://example.com/page/' || CAST(doc_id % 50 AS VARCHAR)
      |                  || '?utm_source=feed&PHPSESSID=a1b2c3&utm_campaign=x'
      |      ELSE 'https://example.com/page/' || CAST(doc_id % 50 AS VARCHAR)
      |           || '?b=2&a=1#top'
      |    END AS url
      |  FROM documents WHERE doc_id < 200),
      |parts AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
      |    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hp,
      |    regexp_replace(regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '') AS pth,
      |    regexp_extract(url, '\?([^#]*)', 1) AS q
      |  FROM u),
      |c AS (
      |  SELECT doc_id,
      |    sch || '://' ||
      |    CASE WHEN sch = 'https' THEN regexp_replace(hp, ':443$', '')
      |         WHEN sch = 'http' THEN regexp_replace(hp, ':80$', '')
      |         ELSE hp END || pth ||
      |    CASE WHEN len(list_filter(string_split(q, '&'),
      |           p -> p <> '' AND NOT starts_with(p, 'utm_')
      |             AND NOT regexp_matches(p,
      |               '(?i)^(jsessionid|phpsessid|sid|aspsessionid[a-z0-9]*)(=|$)')))
      |         = 0 THEN ''
      |         ELSE '?' || array_to_string(list_sort(list_filter(
      |           string_split(q, '&'),
      |           p -> p <> '' AND NOT starts_with(p, 'utm_')
      |             AND NOT regexp_matches(p,
      |               '(?i)^(jsessionid|phpsessid|sid|aspsessionid[a-z0-9]*)(=|$)'))),
      |           '&') END AS canon
      |  FROM parts)
      |SELECT doc_id, canon,
      |  row_number() OVER (PARTITION BY canon ORDER BY doc_id) = 1 AS keep
      |FROM c ORDER BY doc_id""".stripMargin,
    doc = "URL canonicalization + dedup over planted variants (web-corpus ops)") { (s, dir) =>
    import graft.text.UrlNormalize
    import org.apache.spark.sql.expressions.Window
    val page = (col("doc_id") % 50).cast("string")
    val url = when(col("doc_id") % 5 === 0,
      concat(lit("https://example.com/page/"), page))
      .when(col("doc_id") % 5 === 1,
        concat(lit("HTTPS://EXAMPLE.COM/page/"), page))
      .when(col("doc_id") % 5 === 2,
        concat(lit("https://example.com:443/page/"), page, lit("/")))
      .when(col("doc_id") % 5 === 3,
        concat(lit("https://example.com/page/"), page,
          lit("?utm_source=feed&PHPSESSID=a1b2c3&utm_campaign=x")))
      .otherwise(concat(lit("https://example.com/page/"), page,
        lit("?b=2&a=1#top")))
    t(s, dir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), UrlNormalize.canonicalize(url).as("canon"))
      .withColumn("keep",
        row_number().over(
          Window.partitionBy(col("canon")).orderBy(col("doc_id"))) === 1)
      .orderBy("doc_id")
  }

  /** Duplicate word-3-gram character fraction
    * ([[graft.text.QualityRules.dupNgramCharFraction]]) — the
    * Gopher-family repetition measure that catches phrase-level
    * looping the bigram max misses. n=3 because the synthetic corpus
    * has a tiny vocabulary (real corpora use 5–10; identical plan).
    * Docs with fewer than 3 words surface as 0.0 via the left join.
    */
  val qQualityRepetition: QueryDef = QueryDef.sql(
    "q_quality_repetition",
    """WITH w AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS ws
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
      |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
      |  FROM w WHERE len(ws) >= 3),
      |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
      |f AS (
      |  SELECT doc_id,
      |    sum((c - 1) * length(g)) / CAST(sum(c * length(g)) AS DOUBLE)
      |      AS frac
      |  FROM c GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(round(coalesce(frac, 0.0), 6) AS DOUBLE) AS dup_ngram_char_frac,
      |  coalesce(frac, 0.0) > 0.3 AS repetitive
      |FROM documents d LEFT JOIN f USING (doc_id)
      |ORDER BY doc_id""".stripMargin,
    doc = "duplicate word-3-gram char fraction (Gopher-family repetition)") { (s, dir) =>
    import graft.text.QualityRules
    val docs = t(s, dir, "documents")
    val dup = QualityRules.dupNgramCharFraction(docs, "doc_id", "text", n = 3)
    docs.select(col("doc_id"))
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("dup_ngram_char_frac"), lit(0.0)), 6)
          .cast("double").as("dup_ngram_char_frac"),
        (coalesce(col("dup_ngram_char_frac"), lit(0.0)) > 0.3)
          .as("repetitive"))
      .orderBy("doc_id")
  }

  /** Token-window chunking ([[graft.text.Chunker]]): 64-token chunks
    * with 16-token overlap (stride 48) — the splitter feeding context
    * windows / passage retrieval. Map-only (explode is the sole row
    * multiplier, no shuffle). The chunk TEXT is the compared value;
    * the oracle mirrors the start sequence and inclusive list slices.
    */
  val qChunkTokens: QueryDef = QueryDef.sql(
    "q_chunk_tokens",
    """WITH w AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS ws
      |  FROM documents WHERE doc_id < 100),
      |n AS (
      |  SELECT doc_id, ws, len(ws) AS n,
      |    CASE WHEN len(ws) <= 64 THEN 1
      |         ELSE 1 + CAST(ceil((len(ws) - 64) / CAST(48 AS DOUBLE)) AS INT)
      |    END AS nc
      |  FROM w),
      |c AS (SELECT doc_id, unnest(range(0, nc)) AS ci, ws, n FROM n)
      |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
      |  array_to_string(ws[ci*48 + 1 : ci*48 + 64], ' ') AS chunk_text,
      |  CAST(greatest(least(64, n - ci*48), 0) AS INT) AS n_tokens
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    doc = "token-window chunking with overlap (context/passage splitter)") { (s, dir) =>
    graft.text.Chunker.chunkByTokens(
        t(s, dir, "documents").filter(col("doc_id") < 100),
        "doc_id", "text", maxTokens = 64, overlap = 16)
      .orderBy("doc_id", "chunk_idx")
  }

  /** Reproducible train/val/test split
    * ([[graft.profile.Sampling.deterministicSplit]]): Knuth
    * multiplicative hash bucket in 16-bit limbs — every intermediate
    * fits signed 64-bit, so the DuckDB oracle computes the IDENTICAL
    * bucket with plain BIGINT arithmetic (full value equality, not a
    * proportions contract). Stable across runs/engines/partitionings;
    * re-running on a grown corpus never moves an existing id.
    */
  val qSplitHash: QueryDef = QueryDef.sql(
    "q_split_hash",
    """SELECT doc_id, bucket,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      |FROM (
      |  SELECT doc_id,
      |    ((((x // 65536) * 2654435761) % 4294967296) * 65536
      |      + (x % 65536) * 2654435761) % 4294967296 % 100 AS bucket
      |  FROM (SELECT doc_id,
      |          ((doc_id % 4294967296) + 4294967296) % 4294967296 AS x
      |        FROM documents))
      |ORDER BY doc_id""".stripMargin,
    doc = "deterministic hash split train/val/test (reproducible splits)") { (s, dir) =>
    import graft.profile.Sampling
    Sampling.deterministicSplit(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select(col("doc_id"),
        Sampling.hashBucket(col("doc_id")).as("bucket"), col("split"))
      .orderBy("doc_id")
  }

  /** One-pass corpus report ([[graft.text.CorpusReport]]): volume,
    * token mass, language spread, exact-dup rate and quality pass rate
    * as ONE aggregation over ONE scan — the curator's before/after
    * dashboard row. Every metric reuses a formula already mirrored and
    * hash-verified by its own query above; this pins their composition
    * into a single plan.
    */
  val qCorpusReport: QueryDef = QueryDef.sql(
    "q_corpus_report",
    """WITH f AS (
      |  SELECT lang,
      |    CASE WHEN trim(text) = '' THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS toks,
      |    length(regexp_replace(trim(text), '\s+', '', 'g')) AS chars,
      |    regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'),
      |      '\s+', ' ', 'g') AS norm,
      |    least(length(text) / 500.0, 1.0) * 0.25 +
      |    greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
      |      ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
      |           / CAST(length(text) AS DOUBLE) END) * 5.0) * 0.25 +
      |    (CASE WHEN length(regexp_replace(trim(text), '\s+', '', 'g'))
      |        / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
      |        BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.25 +
      |    least(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |        tk -> tk IN ('the','a','an','and','or','of','to','in','is','are',
      |                    'was','it','that','this','for','on','with','as','at','by')))
      |      / CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE)
      |      * 4.0, 1.0) * 0.25 AS quality
      |  FROM documents)
      |SELECT count(*) AS n_docs,
      |  CAST(sum(toks) AS BIGINT) AS total_tokens,
      |  CAST(CASE WHEN sum(toks) = 0 THEN 0.0
      |    ELSE round(sum(chars) / CAST(sum(toks) AS DOUBLE), 6) END AS DOUBLE)
      |    AS mean_token_len,
      |  count(DISTINCT lang) AS n_langs,
      |  CAST(round(1.0 - count(DISTINCT norm) / CAST(count(*) AS DOUBLE), 6)
      |    AS DOUBLE) AS dup_rate,
      |  CAST(round(count(CASE WHEN round(quality, 6) >= 0.5 THEN 1 END)
      |    / CAST(count(*) AS DOUBLE), 6) AS DOUBLE) AS quality_pass_rate
      |FROM f""".stripMargin,
    doc = "one-pass corpus statistics report (curation dashboard row)") { (s, dir) =>
    graft.text.CorpusReport.summary(t(s, dir, "documents"), "text", "lang")
  }

  /** Curation v2 — this session's operators composed as ONE verified
    * plan: C4/Gopher keep gate → normalized-fingerprint dedup →
    * 64/16 token-window chunking → deterministic hash split. The
    * oracle restates all four stages (the quality CTEs verbatim from
    * q_quality_rules, dedup as the rn=1 window, chunking as the
    * slide-grid fan-out, the split as the limb-hash arithmetic) — so
    * the stage COMPOSITION is hash-verified end-to-end, the way
    * q_curate_pipeline pins the v1 flow.
    */
  val qCurateV2: QueryDef = QueryDef.sql(
    "q_curate_v2",
    """WITH base AS (
      |  SELECT doc_id, text,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS ws,
      |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
      |                l -> l <> '') AS ls
      |  FROM documents),
      |feat AS (
      |  SELECT doc_id,
      |    CAST(len(ws) AS BIGINT) AS n_words,
      |    CASE WHEN len(ws) = 0 THEN 0.0
      |      ELSE list_aggregate(list_transform(ws, w -> length(w)), 'sum')
      |           / CAST(len(ws) AS DOUBLE) END AS mean_word_len,
      |    ((length(text) - length(replace(text, '#', '')))
      |      + (length(text) - length(replace(text, '...', ''))) / 3.0
      |      + (length(text) - length(replace(text, '…', ''))))
      |      / CAST(greatest(len(ws), 1) AS DOUBLE) AS symbol_ratio,
      |    CASE WHEN len(ws) = 0 THEN 0.0
      |      ELSE len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
      |           / CAST(len(ws) AS DOUBLE) END AS alpha_word_frac,
      |    CASE WHEN len(ls) = 0 THEN 0.0
      |      ELSE len(list_filter(ls, l -> left(l, 1) IN ('-', '*', '•')))
      |           / CAST(len(ls) AS DOUBLE) END AS bullet_line_frac,
      |    CASE WHEN len(ls) = 0 THEN 0.0
      |      ELSE len(list_filter(ls, l -> ends_with(l, '...') OR ends_with(l, '…')))
      |           / CAST(len(ls) AS DOUBLE) END AS ellipsis_line_frac,
      |    CASE WHEN len(ls) = 0 THEN 0.0
      |      ELSE (len(ls) - len(list_distinct(ls))) / CAST(len(ls) AS DOUBLE)
      |      END AS dup_line_frac,
      |    CASE WHEN coalesce(list_aggregate(list_transform(ls, l -> length(l)), 'sum'), 0) = 0
      |      THEN 0.0
      |      ELSE (list_aggregate(list_transform(ls, l -> length(l)), 'sum')
      |            - list_aggregate(list_transform(list_distinct(ls), l -> length(l)), 'sum'))
      |           / CAST(list_aggregate(list_transform(ls, l -> length(l)), 'sum') AS DOUBLE)
      |      END AS dup_line_char_frac,
      |    CASE WHEN len(ws) = 0 THEN 0
      |      ELSE list_aggregate(list_transform(ws, w -> length(w)), 'sum')
      |      END AS wchars
      |  FROM base),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ws)),
      |    i -> ws[i] || ' ' || ws[i+1])) AS g
      |  FROM base WHERE len(ws) >= 2),
      |bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |topb AS (SELECT doc_id, max(c * length(g)) AS top_chars FROM bc GROUP BY 1),
      |kept AS (
      |  SELECT f.doc_id FROM feat f LEFT JOIN topb USING (doc_id)
      |  WHERE n_words BETWEEN 50 AND 100000
      |    AND mean_word_len BETWEEN 3.0 AND 10.0
      |    AND symbol_ratio < 0.1 AND alpha_word_frac > 0.8
      |    AND bullet_line_frac < 0.9 AND ellipsis_line_frac < 0.3
      |    AND dup_line_frac < 0.3 AND dup_line_char_frac < 0.3
      |    AND coalesce(CAST(top_chars AS DOUBLE) / CAST(wchars AS DOUBLE), 0.0) < 0.2),
      |sel AS (
      |  SELECT doc_id, text FROM (
      |    SELECT d.doc_id, d.text,
      |      row_number() OVER (
      |        PARTITION BY regexp_replace(regexp_replace(lower(d.text),
      |          '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')
      |        ORDER BY d.doc_id) AS rn
      |    FROM documents d JOIN kept USING (doc_id))
      |  WHERE rn = 1),
      |w AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS ws
      |  FROM sel),
      |n AS (
      |  SELECT doc_id, ws, len(ws) AS n,
      |    CASE WHEN len(ws) <= 64 THEN 1
      |         ELSE 1 + CAST(ceil((len(ws) - 64) / CAST(48 AS DOUBLE)) AS INT)
      |    END AS nc
      |  FROM w),
      |c AS (SELECT doc_id, unnest(range(0, nc)) AS ci, n FROM n),
      |sp AS (
      |  SELECT doc_id,
      |    ((((x // 65536) * 2654435761) % 4294967296) * 65536
      |      + (x % 65536) * 2654435761) % 4294967296 % 100 AS bucket
      |  FROM (SELECT doc_id,
      |          ((doc_id % 4294967296) + 4294967296) % 4294967296 AS x
      |        FROM sel))
      |SELECT c.doc_id, CAST(ci AS INT) AS chunk_idx,
      |  CAST(greatest(least(64, n - ci*48), 0) AS INT) AS n_tokens,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      |FROM c JOIN sp ON c.doc_id = sp.doc_id
      |ORDER BY c.doc_id, chunk_idx""".stripMargin,
    doc = "curation v2: quality rules + dedup + chunking + hash split as one plan") { (s, dir) =>
    import graft.dedup.Dedup
    import graft.profile.Sampling
    import graft.text.{Chunker, QualityRules}
    val docs = t(s, dir, "documents")
    val kept = QualityRules.qualityStats(docs, "doc_id", "text")
      .filter(col("keep")).select("doc_id")
    val sel = Dedup.exactTextDedup(docs.join(kept, "doc_id")
      .select("doc_id", "text"), "text", "doc_id")
    val chunks = Chunker.chunkByTokens(sel, "doc_id", "text",
      maxTokens = 64, overlap = 16)
    Sampling.deterministicSplit(chunks, "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"), col("split"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Vocabulary encoding ([[graft.text.Vocab]]): top-200 corpus vocab
    * by (freq desc, token), then each doc's first tokens become the
    * id sequence (OOV → 0) — order preserved through the positional
    * explode/reassembly. The id STRING is compared, so both the
    * ranking and the per-position lookups are hash-verified.
    */
  val qVocabEncode: QueryDef = QueryDef.sql(
    "q_vocab_encode",
    """WITH tok AS (
      |  SELECT doc_id, t.token, t.pos FROM documents,
      |    LATERAL (SELECT unnest(string_split_regex(lower(trim(text)),
      |        '[\s[:punct:]]+')) AS token,
      |      generate_subscripts(string_split_regex(lower(trim(text)),
      |        '[\s[:punct:]]+'), 1) AS pos) t
      |  WHERE t.token <> ''),
      |vocab AS (
      |  SELECT token, row_number() OVER (ORDER BY n DESC, token) AS id
      |  FROM (SELECT token, count(*) AS n FROM tok GROUP BY token
      |        ORDER BY n DESC, token LIMIT 200)),
      |enc AS (
      |  SELECT tok.doc_id, tok.pos, coalesce(v.id, 0) AS tid
      |  FROM tok LEFT JOIN vocab v USING (token))
      |SELECT doc_id,
      |  array_to_string(list_transform(
      |    list_sort(list({'pos': pos, 'tid': tid})), r -> r.tid), ',') AS ids
      |FROM enc WHERE doc_id < 50
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    doc = "fixed-vocab token-id encoding, order-preserving (training-data ops)") { (s, dir) =>
    import graft.text.Vocab
    val docs = t(s, dir, "documents")
    val vocab = Vocab.build(docs, "text", size = 200)
    Vocab.encode(docs.filter(col("doc_id") < 50), vocab, "doc_id", "text")
      .select(col("doc_id"), array_join(col("ids"), ",").as("ids"))
      .orderBy("doc_id")
  }

  /** Unigram-LM mean NLL ([[graft.text.UnigramLm]]): each doc scored
    * against the corpus's own token distribution — the cheap stand-in
    * for CCNet-style LM quality filtering. The oracle rebuilds the
    * model and the per-doc mean from raw text; per-token −ln p is
    * decimal-cast before summing on BOTH sides so the sums are
    * order-independent and engine-identical, and blank docs come back
    * (0, null) through the same keyed left join the Spark side uses
    * (the row-preservation contract).
    */
  val qTextUnigramNll: QueryDef = QueryDef.sql(
    "q_text_unigram_nll",
    """WITH tk AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents WHERE trim(text) <> ''),
      |model AS (SELECT token, count(*) AS cnt FROM tk GROUP BY token),
      |tot AS (SELECT count(*) AS total FROM tk),
      |nll AS (
      |  SELECT t.doc_id, count(*) AS n_tokens,
      |    sum(CAST(-ln(m.cnt / CAST(tot.total AS DOUBLE))
      |        AS DECIMAL(20,10))) AS s
      |  FROM tk t JOIN model m USING (token) CROSS JOIN tot
      |  GROUP BY t.doc_id)
      |SELECT d.doc_id,
      |  coalesce(n.n_tokens, 0) AS n_tokens,
      |  CAST(round(CAST(n.s AS DOUBLE) / n.n_tokens, 6) AS DOUBLE)
      |    AS mean_nll
      |FROM documents d LEFT JOIN nll n ON d.doc_id = n.doc_id
      |ORDER BY d.doc_id""".stripMargin,
    doc = "unigram-LM mean NLL per doc (CCNet-style quality proxy)") { (s, dir) =>
    graft.text.UnigramLm.meanNll(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Trained logistic-regression quality classifier
    * ([[graft.text.QualityClassifier]]): 3 full-batch GD iterations
    * from w = 0 on (stopword ratio, punct ratio, log length) with weak
    * label lang = 'en', then every doc scored under the LEARNED model.
    * The oracle replays training as a CTE chain — per iteration one
    * aggregate with decimal-cast gradient sums, identical double
    * update arithmetic — so the weights, not just the scores, must
    * agree bit-for-bit across engines. The fastText-style learned
    * quality filter as a verifiable distributed query.
    */
  val qQualityClassifier: QueryDef = {
    val iters = 3
    val x1 = """len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      tk -> tk IN ('the','a','an','and','or','of','to','in','is','are',
      |                  'was','it','that','this','for','on','with','as','at','by')))
      |      / CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE)""".stripMargin
    val x2 = """CASE WHEN length(text) = 0 THEN 0.0
      |      ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
      |           / CAST(length(text) AS DOUBLE) END""".stripMargin
    val x3 = "ln(1.0 + CAST(length(text) AS DOUBLE))"
    def zSql(w: String, f: String) =
      s"$w.b + $w.w1*$f.x1 + $w.w2*$f.x2 + $w.w3*$f.x3"
    def gradSql(i: Int): String = {
      val sig = s"1.0/(1.0+exp(-(${zSql("w", "feat")})))"
      val terms = Seq("sb" -> s"($sig - y)", "s1" -> s"($sig - y) * feat.x1",
        "s2" -> s"($sig - y) * feat.x2", "s3" -> s"($sig - y) * feat.x3")
        .map { case (n, e) =>
          s"CAST(sum(CAST($e AS DECIMAL(28,12))) AS DOUBLE) AS $n" }
        .mkString(",\n      |    ")
      s"""g$i AS (
        |  SELECT
        |    $terms
        |  FROM feat CROSS JOIN w${i - 1} w)""".stripMargin
    }
    def stepSql(i: Int): String =
      s"""w$i AS (
        |  SELECT w.b - 1.0 * (g.sb / nn.n) AS b,
        |    w.w1 - 1.0 * (g.s1 / nn.n) AS w1,
        |    w.w2 - 1.0 * (g.s2 / nn.n) AS w2,
        |    w.w3 - 1.0 * (g.s3 / nn.n) AS w3
        |  FROM w${i - 1} w CROSS JOIN g$i g CROSS JOIN nn)""".stripMargin
    val iterSql = (1 to iters).map(i => gradSql(i) + ",\n" + stepSql(i))
      .mkString(",\n")
    QueryDef.sql(
      "q_quality_classifier",
      s"""WITH feat AS (
        |  SELECT doc_id,
        |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
        |    $x1 AS x1,
        |    $x2 AS x2,
        |    $x3 AS x3
        |  FROM documents),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM feat),
        |w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
        |$iterSql
        |SELECT f.doc_id, CAST(f.y AS INT) AS label,
        |  CAST(round(1.0/(1.0+exp(-(${zSql("w", "f")}))), 6) AS DOUBLE)
        |    AS score
        |FROM feat f CROSS JOIN w$iters w
        |ORDER BY f.doc_id""".stripMargin,
      doc = "logistic-regression quality classifier, 3 GD iterations replayed by the oracle (learned curation)") { (s, dir) =>
      graft.text.QualityClassifier.trainAndScore(
          t(s, dir, "documents"), "doc_id", "text",
          col("lang") === "en", iters = iters, lr = 1.0)
        .orderBy("doc_id")
    }
  }

  /** Bigram-LM mean NLL with add-k smoothing
    * ([[graft.text.UnigramLm.bigramMeanNll]]) — the sequence-aware
    * twin of q_text_unigram_nll: P(v|u) = (c(u,v)+k)/(c(u·)+k·V) with
    * prefix counts in the denominator (conditionals normalize) and
    * corpus vocab size V. The oracle rebuilds bigrams with the proven
    * list-comprehension shingle idiom, recomputes the identical counts
    * and the identical double arithmetic, decimal-casts each −ln p
    * before the per-doc sum, and preserves short docs as (0, null)
    * through the same keyed left join.
    */
  val qTextBigramNll: QueryDef = QueryDef.sql(
    "q_text_bigram_nll",
    """WITH tk AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |  FROM documents WHERE trim(text) <> ''),
      |pr AS (
      |  SELECT doc_id,
      |    unnest([array_to_string(w[i:i+1], ' ')
      |            FOR i IN range(1, greatest(len(w), 2))]) AS bg
      |  FROM tk WHERE len(w) >= 2),
      |pru AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS u FROM pr),
      |c2 AS (SELECT bg, count(*) AS c2 FROM pru GROUP BY bg),
      |c1 AS (SELECT u, count(*) AS c1 FROM pru GROUP BY u),
      |vv AS (
      |  SELECT count(DISTINCT token) AS v FROM (
      |    SELECT unnest(w) AS token FROM tk)),
      |nll AS (
      |  SELECT p.doc_id, count(*) AS n_bigrams,
      |    sum(CAST(-ln((CAST(c2.c2 AS DOUBLE) + 0.5) /
      |      (CAST(c1.c1 AS DOUBLE) + 0.5 * CAST(vv.v AS DOUBLE)))
      |      AS DECIMAL(20,10))) AS s
      |  FROM pru p JOIN c2 USING (bg) JOIN c1 USING (u) CROSS JOIN vv
      |  GROUP BY p.doc_id)
      |SELECT d.doc_id,
      |  coalesce(n.n_bigrams, 0) AS n_bigrams,
      |  CAST(round(CAST(n.s AS DOUBLE) / n.n_bigrams, 6) AS DOUBLE)
      |    AS mean_nll
      |FROM documents d LEFT JOIN nll n ON d.doc_id = n.doc_id
      |ORDER BY d.doc_id""".stripMargin,
    doc = "add-k bigram-LM mean NLL per doc (sequence-aware quality proxy)") { (s, dir) =>
    graft.text.UnigramLm.bigramMeanNll(t(s, dir, "documents"),
        "doc_id", "text", k = 0.5)
      .orderBy("doc_id")
  }

  /** Shannon entropy of each source's token distribution — the corpus
    * diversity screen (low entropy = templated/boilerplate source,
    * high = diverse natural text; the [[qCorpusDivergence]] sibling
    * that needs no reference corpus). One token count shuffle, one
    * per-source reduce, O(sources) output; each −p·ln p term is
    * decimal-cast before the sum.
    */
  val qSourceEntropy: QueryDef = QueryDef.sql(
    "q_source_entropy",
    """WITH tk AS (
      |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents WHERE trim(text) <> ''),
      |c AS (SELECT source, token, count(*) AS cnt FROM tk GROUP BY 1, 2),
      |tot AS (
      |  SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY source)
      |SELECT t.source, t.n AS n_tokens, count(*) AS vocab,
      |  CAST(round(CAST(sum(CAST(
      |    -(c.cnt / CAST(t.n AS DOUBLE)) * ln(c.cnt / CAST(t.n AS DOUBLE))
      |    AS DECIMAL(20,12))) AS DOUBLE), 6) AS DOUBLE) AS entropy
      |FROM c JOIN tot t USING (source)
      |GROUP BY t.source, t.n
      |ORDER BY t.source""".stripMargin,
    doc = "per-source token Shannon entropy (corpus diversity profiling)") { (s, dir) =>
    val tk = t(s, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("source"),
        explode(graft.text.TextAnalysis.words(col("text"))).as("token"))
    val c = tk.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val tot = c.groupBy(col("source")).agg(sum(col("cnt")).as("n"))
    val p = col("cnt") / col("n").cast("double")
    c.join(tot, Seq("source"))
      .groupBy(col("source"), col("n"))
      .agg(count(lit(1)).as("vocab"),
        round(sum((-p * log(p)).cast("decimal(20,12)")).cast("double"), 6)
          .cast("double").as("entropy"))
      .select(col("source"), col("n").as("n_tokens"), col("vocab"),
        col("entropy"))
      .orderBy("source")
  }

  /** BM25 retrieval ([[graft.text.Bm25]]): top-10 docs for a fixed
    * 3-term topic probe. The oracle restates the exact scoring
    * arithmetic — same operation order, same double literals folded
    * the same IEEE way, per-term contribution decimal-cast before the
    * per-doc sum — and selects the top 10 by the RAW double score
    * (doc_id tie-break) before rounding, exactly as the Spark side
    * does. Final output re-sorted by doc_id on both sides.
    */
  val qTextBm25: QueryDef = QueryDef.sql(
    "q_text_bm25",
    """WITH d AS (SELECT doc_id, trim(text) AS t FROM documents),
      |stats AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN t = '' THEN 0
      |      ELSE len(string_split_regex(t, '\s+')) END) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) AS avgdl
      |  FROM d),
      |tk AS (
      |  SELECT doc_id, len(string_split_regex(t, '\s+')) AS dl,
      |    unnest(string_split_regex(t, '\s+')) AS token
      |  FROM d WHERE t <> ''),
      |q AS (SELECT * FROM tk WHERE token IN ('vector', 'stream', 'merge')),
      |tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM q GROUP BY 1, 2, 3),
      |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM q GROUP BY 1),
      |scored AS (
      |  SELECT t.doc_id, count(*) AS matched_terms,
      |    sum(CAST(
      |      ln(1.0 + (CAST(s.n AS DOUBLE) - f.df + 0.5)
      |          / (CAST(f.df AS DOUBLE) + 0.5))
      |        * (CAST(t.tf AS DOUBLE) * (1.2 + 1.0))
      |        / (CAST(t.tf AS DOUBLE) + 1.2 *
      |           ((1.0 - 0.75) + 0.75 * CAST(t.dl AS DOUBLE) / s.avgdl))
      |      AS DECIMAL(20,10))) AS s
      |  FROM tf t JOIN df f USING (token) CROSS JOIN stats s
      |  GROUP BY t.doc_id),
      |top AS (
      |  SELECT doc_id, matched_terms, CAST(s AS DOUBLE) AS raw
      |  FROM scored ORDER BY raw DESC, doc_id LIMIT 10)
      |SELECT doc_id, matched_terms,
      |  CAST(round(raw, 6) AS DOUBLE) AS bm25
      |FROM top ORDER BY doc_id""".stripMargin,
    doc = "BM25 top-10 retrieval for a fixed topic probe") { (s, dir) =>
    graft.text.Bm25.topDocs(t(s, dir, "documents"), "doc_id", "text",
        Seq("vector", "stream", "merge"))
      .orderBy("doc_id")
  }

  /** DSIR importance weights ([[graft.text.Dsir]]): every doc scored
    * for target-likeness against the `doc_id % 10 = 0` slice as the
    * target corpus. The oracle rebuilds both Laplace-smoothed gram
    * models (unigrams + bigrams, exact string features) and every
    * weight from raw text; per-gram contributions are decimal-cast
    * before the per-doc sum on BOTH sides; blank docs come back
    * (0, 0.0) through the same keyed left join (row preservation).
    */
  val qDsirWeights: QueryDef = QueryDef.sql(
    "q_dsir_weights",
    """WITH d AS (SELECT doc_id, trim(text) AS t FROM documents),
      |raw_g AS (
      |  SELECT doc_id, unnest(list_concat(tk,
      |    list_transform(range(len(tk) - 1),
      |      i -> tk[i + 1] || ' ' || tk[i + 2]))) AS g
      |  FROM (SELECT doc_id, string_split_regex(t, '\s+') AS tk
      |        FROM d WHERE t <> '')),
      |tgt_g AS (SELECT g FROM raw_g WHERE doc_id % 10 = 0),
      |rc AS (SELECT g, count(*) AS rc FROM raw_g GROUP BY 1),
      |tc AS (SELECT g, count(*) AS tc FROM tgt_g GROUP BY 1),
      |m AS (
      |  SELECT coalesce(r.g, t.g) AS g,
      |    coalesce(r.rc, 0) AS rc, coalesce(t.tc, 0) AS tc
      |  FROM rc r FULL OUTER JOIN tc t ON r.g = t.g),
      |tot AS (SELECT CAST(sum(rc) AS BIGINT) AS rtot,
      |  CAST(sum(tc) AS BIGINT) AS ttot, count(*) AS v FROM m),
      |lam AS (
      |  SELECT g,
      |    ln((CAST(tc AS DOUBLE) + 1.0)
      |        / (CAST(ttot AS DOUBLE) + 1.0 * CAST(v AS DOUBLE)))
      |    - ln((CAST(rc AS DOUBLE) + 1.0)
      |        / (CAST(rtot AS DOUBLE) + 1.0 * CAST(v AS DOUBLE))) AS lambda
      |  FROM m CROSS JOIN tot),
      |pd AS (SELECT doc_id, g, count(*) AS c FROM raw_g GROUP BY 1, 2),
      |w AS (
      |  SELECT p.doc_id, CAST(sum(p.c) AS BIGINT) AS n_grams,
      |    sum(CAST(CAST(p.c AS DOUBLE) * l.lambda AS DECIMAL(20,10))) AS s
      |  FROM pd p JOIN lam l USING (g) GROUP BY 1)
      |SELECT d0.doc_id,
      |  coalesce(w.n_grams, 0) AS n_grams,
      |  coalesce(CAST(round(CAST(w.s AS DOUBLE), 6) AS DOUBLE), 0.0)
      |    AS dsir_weight
      |FROM documents d0 LEFT JOIN w USING (doc_id)
      |ORDER BY doc_id""".stripMargin,
    doc = "DSIR importance weights vs a target slice (data selection)") { (s, dir) =>
    val docs = t(s, dir, "documents")
    graft.text.Dsir.importanceWeights(
        docs, docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Cross-document duplicated-span report ([[graft.text.SpanDedup]]):
    * per doc, the fraction of its distinct word 5-grams that occur in
    * ≥ 2 documents. The oracle re-derives the gram sets (truncating
    * list slices mirror Spark's `slice`; docs shorter than 5 tokens
    * collapse to one whole-doc gram on both engines), the gram
    * doc-frequencies, and the per-doc ratio; blank docs come back
    * (0, 0, null) through the same keyed left join.
    */
  val qSpanDupReport: QueryDef = QueryDef.sql(
    "q_span_dup_report",
    """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |           FROM documents WHERE trim(text) <> ''),
      |dg AS (SELECT DISTINCT doc_id, g FROM (
      |  SELECT doc_id, unnest([array_to_string(tk[i:i+4], ' ')
      |    FOR i IN range(1, greatest(len(tk) - 4, 1) + 1)]) AS g FROM d)),
      |dfr AS (SELECT g, count(*) AS df FROM dg GROUP BY g),
      |per AS (SELECT doc_id, count(*) AS n_grams,
      |          count(*) FILTER (df > 1) AS n_dup_grams
      |        FROM dg JOIN dfr USING (g) GROUP BY doc_id)
      |SELECT d0.doc_id,
      |  coalesce(p.n_grams, 0) AS n_grams,
      |  coalesce(p.n_dup_grams, 0) AS n_dup_grams,
      |  CASE WHEN p.n_grams > 0 THEN CAST(round(
      |    CAST(p.n_dup_grams AS DOUBLE) / CAST(p.n_grams AS DOUBLE), 6)
      |    AS DOUBLE) END AS dup_frac
      |FROM documents d0 LEFT JOIN per p USING (doc_id)
      |ORDER BY d0.doc_id""".stripMargin,
    doc = "cross-doc duplicated 5-gram span fractions (Lee et al. dedup signal)") { (s, dir) =>
    graft.text.SpanDedup.dupSpanReport(t(s, dir, "documents"),
        "doc_id", "text", n = 5)
      .orderBy("doc_id")
  }

  /** Fuzzy (containment-scored) decontamination: the fraction of each
    * training doc's distinct 3-grams that appear in the eval slice,
    * thresholded at 0.5 — the score fuzzy decontamination acts on
    * where the binary any-overlap rule over-flags. Same broadcast +
    * single-scan + one-keyed-agg plan as [[qDecontaminate]].
    */
  val qDecontaminateFuzzy: QueryDef = QueryDef.sql(
    "q_decontaminate_fuzzy",
    """WITH g AS (
      |  SELECT doc_id,
      |    string_split_regex(lower(trim(text)), '[\s[:punct:]]+') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(CASE WHEN len(toks) < 3
      |    THEN [array_to_string(toks, ' ')]
      |    ELSE list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> array_to_string(toks[i:i+2], ' '))) END) AS gram
      |  FROM g),
      |ev AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 50 = 0),
      |tr AS (
      |  SELECT s.doc_id, count(*) AS n_grams, count(ev.gram) AS n_shared
      |  FROM sh s LEFT JOIN ev ON s.gram = ev.gram
      |  WHERE s.doc_id % 50 <> 0 GROUP BY 1)
      |SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
      |  coalesce(n_shared, 0) AS n_shared,
      |  CAST(round(coalesce(n_shared, 0) / greatest(coalesce(n_grams, 0), 1), 6)
      |    AS DOUBLE) AS containment,
      |  coalesce(n_shared, 0) / greatest(coalesce(n_grams, 0), 1) >= 0.5
      |    AS contaminated
      |FROM documents d LEFT JOIN tr ON d.doc_id = tr.doc_id
      |WHERE d.doc_id % 50 <> 0 ORDER BY d.doc_id""".stripMargin,
    doc = "containment-scored fuzzy decontamination vs eval slice (training-data ops)") { (s, dir) =>
    import graft.text.Decontaminate
    val docs = t(s, dir, "documents")
    Decontaminate.containmentReport(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0),
      "doc_id", "text", n = 3, threshold = 0.5)
      .orderBy("doc_id")
  }

  /** Keep-first exact-substring removal (Lee et al. ExactSubstr): all
    * non-canonical occurrences of corpus-duplicated 5-grams excised
    * token-by-token, text reassembled. Oracle recomputes the identical
    * edit in SQL — packed `doc·10⁶+pos` keys make the canonical pick a
    * plain min in both engines, so even the rebuilt STRINGS must hash
    * equal.
    */
  val qSpanRemove: QueryDef = QueryDef.sql(
    "q_span_remove",
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents WHERE trim(text) <> ''),
      |pos AS (
      |  SELECT doc_id, tk, len(tk) AS ntk,
      |    unnest(range(1, greatest(len(tk) - 4, 1) + 1)) AS pos
      |  FROM d),
      |occ AS (
      |  SELECT doc_id, ntk, pos, array_to_string(tk[pos:pos+4], ' ') AS g,
      |    doc_id * 1000000 + pos AS key
      |  FROM pos),
      |gs AS (SELECT g, count(*) AS nocc, min(key) AS canon FROM occ GROUP BY 1),
      |rem AS (SELECT o.* FROM occ o JOIN gs USING (g)
      |        WHERE nocc > 1 AND key <> canon),
      |cov0 AS (SELECT doc_id, ntk, pos, unnest(range(0, 5)) AS k FROM rem),
      |cov AS (SELECT DISTINCT doc_id, pos + k AS ti FROM cov0
      |        WHERE pos + k <= ntk),
      |tok0 AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS ti FROM d),
      |tok AS (SELECT doc_id, ti, tk[ti] AS tokv FROM tok0),
      |kept AS (SELECT t.* FROM tok t LEFT JOIN cov c
      |         ON t.doc_id = c.doc_id AND t.ti = c.ti WHERE c.ti IS NULL),
      |reb AS (SELECT doc_id, count(*) AS n_tokens_kept,
      |        string_agg(tokv, ' ' ORDER BY ti) AS new_text
      |        FROM kept GROUP BY 1)
      |SELECT d0.doc_id, coalesce(n_tokens_kept, 0) AS n_tokens_kept,
      |  coalesce(new_text, '') AS new_text
      |FROM documents d0 LEFT JOIN reb ON d0.doc_id = reb.doc_id
      |ORDER BY d0.doc_id""".stripMargin,
    doc = "keep-first exact-substring span removal, rebuilt text oracle-matched (training-data ops)") { (s, dir) =>
    import graft.text.SpanDedup
    SpanDedup.removeDuplicateSpans(t(s, dir, "documents"), "doc_id", "text",
        n = 5)
      .orderBy("doc_id")
  }

  /** BPE merge-candidate scoring ([[graft.text.Vocab.bpePairCounts]]):
    * the top adjacent character pairs by corpus-weighted within-word
    * frequency — iteration 1 of Sennrich-style BPE tokenizer training
    * (the argmax of this table IS the first merge rule). The pair
    * explosion runs over the distinct-word table with its frequencies,
    * not the corpus scan, so at 100 TB the exploded row count is
    * |distinct words|·avg_len, orders below corpus tokens. Ordered by
    * (n desc, pair) — the exact merge-priority order.
    */
  val qBpePairs: QueryDef = QueryDef.sql(
    "q_bpe_pairs",
    """WITH words AS (
      |  SELECT unnest(string_split_regex(lower(trim(text)),
      |    '[\s[:punct:]]+')) AS w
      |  FROM documents),
      |wf AS (
      |  SELECT w, count(*) AS f FROM words WHERE length(w) >= 2 GROUP BY w),
      |pr AS (
      |  SELECT substr(w, CAST(t.i AS INT), 2) AS pair, f
      |  FROM wf, LATERAL (SELECT unnest(range(1, length(w))) AS i) t)
      |SELECT pair, CAST(sum(f) AS BIGINT) AS n FROM pr GROUP BY pair
      |ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    doc = "BPE merge-candidate pair scoring, distinct-word weighted (tokenizer training)") { (s, dir) =>
    graft.text.Vocab.bpePairCounts(t(s, dir, "documents"), "text")
      .orderBy(col("n").desc, col("pair")).limit(20)
  }

  /** Weight-balanced sharding ([[graft.text.SequencePacking
    * .balancedShards]]): the corpus cut into 8 contiguous spans of
    * near-equal total chars — equal-WEIGHT dataloader shards where
    * q_split_hash gives equal COUNTS. The engine computes the
    * exclusive prefix sum distributed (range partition → local window
    * → P-row broadcast offsets; no corpus-wide single-partition
    * window); the oracle states the same integral shard arithmetic
    * over a plain window cumsum. Per-shard manifest output makes any
    * boundary drift hash-fail.
    */
  val qShardBalanced: QueryDef = QueryDef.sql(
    "q_shard_balanced",
    """WITH w AS (
      |  SELECT doc_id, n_chars,
      |    sum(n_chars) OVER (ORDER BY doc_id) AS cum
      |  FROM documents),
      |t AS (SELECT sum(n_chars) AS total FROM documents)
      |SELECT CAST(LEAST(((cum - n_chars) * 8) // total, 7) AS BIGINT)
      |    AS shard,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM w, t
      |GROUP BY shard
      |ORDER BY shard""".stripMargin,
    doc = "weight-balanced contiguous sharding via distributed prefix sum (training-data ops)") { (s, dir) =>
    import graft.text.SequencePacking
    SequencePacking.balancedShards(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", nShards = 8)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("chars"))
      .orderBy("shard")
  }

  /** Class-based TF-IDF (BERTopic's c-TF-IDF): treat each `source`
    * as one pseudo-document, score term t in class c as
    * tf_{t,c} · ln(1 + A / f_t) with A = average tokens per class and
    * f_t the corpus-wide term frequency — the cluster-labeling step of
    * topic modeling over a clustered corpus (what [[qTfidf]] is to
    * documents, this is to classes). Top-5 salient terms per class.
    *
    * Scale shape: the token explosion happens once; class-term counts
    * map-side combine on (source, token); corpus frequencies and the
    * scalar A are one more aggregate each, broadcast back — output is
    * O(classes · 5). The per-class window ranks |vocab| rows per
    * class, shuffled on the class key.
    */
  val qCtfidf: QueryDef = QueryDef.sql(
    "q_ctfidf",
    """WITH tok AS (
      |  SELECT source, unnest(string_split_regex(lower(trim(text)),
      |    '[\s[:punct:]]+')) AS token
      |  FROM documents),
      |tokf AS (SELECT source, token FROM tok WHERE token <> ''),
      |ctf AS (SELECT source, token, count(*) AS tf FROM tokf GROUP BY 1, 2),
      |ft AS (SELECT token, count(*) AS ft FROM tokf GROUP BY 1),
      |a AS (SELECT count(*) / CAST((SELECT count(DISTINCT source) FROM tokf)
      |               AS DOUBLE) AS a FROM tokf)
      |SELECT source, token, tf,
      |  CAST(round(score_raw, 6) AS DOUBLE) AS score
      |FROM (
      |  SELECT c.source, c.token, c.tf,
      |    c.tf * ln(1 + a.a / f.ft) AS score_raw,
      |    row_number() OVER (PARTITION BY c.source
      |      ORDER BY c.tf * ln(1 + a.a / f.ft) DESC, c.token) AS rn
      |  FROM ctf c JOIN ft f USING (token) CROSS JOIN a)
      |WHERE rn <= 5
      |ORDER BY source, score DESC, token""".stripMargin,
    doc = "c-TF-IDF top-5 salient terms per class/cluster (topic labeling)") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val tok = t(s, dir, "documents")
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "[\\s\\p{Punct}]+")).as("token"))
      .filter(col("token") =!= "")
    val ctf = tok.groupBy("source", "token").agg(count(lit(1)).as("tf"))
    val ft = tok.groupBy("token").agg(count(lit(1)).as("ft"))
    val a = tok.agg((count(lit(1)) /
      countDistinct("source").cast("double")).as("a"))
    val w = Window.partitionBy("source")
      .orderBy(col("score_raw").desc, col("token"))
    ctf.join(ft, "token").crossJoin(broadcast(a))
      .withColumn("score_raw",
        col("tf") * log(lit(1) + col("a") / col("ft")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("source"), col("token"), col("tf"),
        round(col("score_raw"), 6).cast("double").as("score"))
      .orderBy(col("source"), col("score").desc, col("token"))
  }

  /** Data-mixing diagnostics: per-source KL divergence of the token
    * distribution from the whole-corpus distribution —
    * KL(P_src ‖ P_corpus) = Σ_t p·ln(p/q). The quantitative "how
    * different is this slice" a mixture designer reads next to DSIR
    * weights. Every source token is by construction in the corpus, so
    * q > 0 and the sum is finite. Each double term is decimal-cast
    * BEFORE summing (identical doubles in both engines → identical
    * decimals → order-independent exact sum); counts themselves are
    * exact. Shape: one token explosion, two count aggregates, one
    * broadcast-back join — output O(sources).
    */
  val qCorpusDivergence: QueryDef = QueryDef.sql(
    "q_corpus_divergence",
    """WITH tok AS (
      |  SELECT source, unnest(string_split_regex(lower(trim(text)),
      |    '[\s[:punct:]]+')) AS token
      |  FROM documents),
      |tokf AS (SELECT source, token FROM tok WHERE token <> ''),
      |st AS (SELECT source, token, count(*) AS c FROM tokf GROUP BY 1, 2),
      |stot AS (SELECT source, count(*) AS n FROM tokf GROUP BY 1),
      |ct AS (SELECT token, count(*) AS cc FROM tokf GROUP BY 1),
      |ctot AS (SELECT count(*) AS cn FROM tokf)
      |SELECT st.source, min(stot.n) AS n_tokens,
      |  CAST(round(CAST(sum(CAST(
      |    (st.c / CAST(stot.n AS DOUBLE)) *
      |    ln((st.c / CAST(stot.n AS DOUBLE)) /
      |       (ct.cc / CAST(ctot.cn AS DOUBLE)))
      |    AS DECIMAL(20,12))) AS DOUBLE), 6) AS DOUBLE) AS kl
      |FROM st JOIN stot USING (source) JOIN ct USING (token) CROSS JOIN ctot
      |GROUP BY st.source
      |ORDER BY source""".stripMargin,
    doc = "per-source KL divergence from corpus token distribution (mixture diagnostics)") { (s, dir) =>
    val tok = t(s, dir, "documents")
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "[\\s\\p{Punct}]+")).as("token"))
      .filter(col("token") =!= "")
    val st = tok.groupBy("source", "token").agg(count(lit(1)).as("c"))
    val stot = tok.groupBy("source").agg(count(lit(1)).as("n"))
    val ct = tok.groupBy("token").agg(count(lit(1)).as("cc"))
    val ctot = tok.agg(count(lit(1)).as("cn"))
    val p = col("c") / col("n").cast("double")
    val q = col("cc") / col("cn").cast("double")
    st.join(broadcast(stot), "source").join(ct, "token")
      .crossJoin(broadcast(ctot))
      .groupBy(col("source"))
      .agg(min(col("n")).as("n_tokens"),
        round(sum((p * log(p / q)).cast("decimal(20,12)")).cast("double"), 6)
          .cast("double").as("kl"))
      .orderBy("source")
  }

  /** Exact edit-distance similarity join over the corpus vocabulary
    * ([[graft.text.EditDistJoin]]): every word pair within Levenshtein
    * distance 2 — the spelling-variant/OCR-noise detector behind vocab
    * normalization. The engine's q-gram inverted index + length/count
    * filters + codegen levenshtein verify must reproduce the naive
    * quadratic oracle EXACTLY — a recall proof for the pruning rules,
    * the same contract idiom as q_setsim_prefix.
    */
  val qEditdistJoin: QueryDef = QueryDef.sql(
    "q_editdist_join",
    """WITH w AS (
      |  SELECT DISTINCT unnest(string_split_regex(lower(trim(text)),
      |    '[\s[:punct:]]+')) AS w
      |  FROM documents),
      |ww AS (SELECT w FROM w WHERE w != '')
      |SELECT a.w AS wa, b.w AS wb,
      |  levenshtein(a.w, b.w) AS dist
      |FROM ww a JOIN ww b ON a.w < b.w
      |WHERE levenshtein(a.w, b.w) <= 2
      |ORDER BY wa, wb""".stripMargin,
    doc = "Ed-Join: q-gram-filtered exact edit-distance pairs over the vocabulary") { (s, dir) =>
    val words = t(s, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "[\\s\\p{Punct}]+"))
        .as("w"))
      .filter(col("w") =!= "")
    graft.text.EditDistJoin.join(words, "w", d = 2, q = 2)
      .orderBy("wa", "wb")
  }

  /** Lexical-diversity profile per source: token mass, vocabulary
    * size, type-token ratio, hapax-legomenon share, and
    * frequency-weighted mean word length — the corpus-health metrics
    * that flag template spam (low TTR) and OCR noise (high hapax
    * share). One token explosion, map-side-combined (source, token)
    * counts, then an O(vocabulary) rollup; all ratios are integer
    * divisions evaluated in identical double trees.
    */
  val qLexicalDiversity: QueryDef = QueryDef.sql(
    "q_lexical_diversity",
    """WITH tok AS (
      |  SELECT source, unnest(string_split_regex(lower(trim(text)),
      |    '[\s[:punct:]]+')) AS w
      |  FROM documents),
      |tc AS (
      |  SELECT source, w, count(*) AS c FROM tok WHERE w != ''
      |  GROUP BY source, w)
      |SELECT source,
      |  CAST(sum(c) AS BIGINT) AS n_tokens,
      |  count(*) AS n_types,
      |  round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr,
      |  round(CAST(count(CASE WHEN c = 1 THEN 1 END) AS DOUBLE)
      |    / count(*), 6) AS hapax_ratio,
      |  round(CAST(sum(length(w) * c) AS DOUBLE) / sum(c), 6)
      |    AS mean_word_len
      |FROM tc GROUP BY source ORDER BY source""".stripMargin,
    doc = "type-token ratio, hapax share, mean word length per source") { (s, dir) =>
    val tc = t(s, dir, "documents")
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "[\\s\\p{Punct}]+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    tc.groupBy("source").agg(
        sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        round(count(lit(1)).cast("double") / sum(col("c")), 6).as("ttr"),
        round(count(when(col("c") === 1, 1)).cast("double")
          / count(lit(1)), 6).as("hapax_ratio"),
        round(sum(length(col("w")) * col("c")).cast("double")
          / sum(col("c")), 6).as("mean_word_len"))
      .orderBy("source")
  }

  /** Jaro-Winkler fuzzy matching over the vocabulary via the NATIVE
    * [[graft.plans.JaroWinklerSim]] codegen expression — Spark ships
    * only levenshtein; this adds the name-matching scalar entity
    * resolution actually uses, oracle-checked against DuckDB's own
    * jaro_winkler_similarity to 6 decimals (both sides filter on the
    * ROUNDED score so boundary pairs cannot flip). The vocabulary
    * cross pair-grid here is broadcast-bounded; at corpus scale the
    * pair GENERATION belongs to the q-gram/prefix pruners
    * (q_editdist_join, q_setsim_prefix) and this function is the
    * in-scan verifier.
    */
  val qJaroWinkler: QueryDef = QueryDef.sql(
    "q_jaro_winkler",
    """WITH w AS (
      |  SELECT DISTINCT unnest(string_split_regex(lower(trim(text)),
      |    '[\s[:punct:]]+')) AS w
      |  FROM documents),
      |ww AS (SELECT w FROM w WHERE w != '')
      |SELECT a.w AS wa, b.w AS wb,
      |  round(jaro_winkler_similarity(a.w, b.w), 6) AS jw
      |FROM ww a JOIN ww b ON a.w < b.w
      |WHERE round(jaro_winkler_similarity(a.w, b.w), 6) >= 0.72
      |ORDER BY wa, wb""".stripMargin,
    doc = "native Jaro-Winkler scorer vs DuckDB's builtin (entity resolution verifier)") { (s, dir) =>
    val words = t(s, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "[\\s\\p{Punct}]+"))
        .as("w"))
      .filter(col("w") =!= "").distinct()
    val a = words.select(col("w").as("wa"))
    val b = words.select(col("w").as("wb"))
    a.join(broadcast(b), col("wa") < col("wb"))
      .withColumn("jw",
        round(call_function("jaro_winkler", col("wa"), col("wb")), 6))
      .filter(col("jw") >= 0.72)
      .orderBy("wa", "wb")
  }

  /** Vocabulary coverage (top-p mass) per source: the smallest
    * frequency-ranked vocabulary prefix covering 90% of the source's
    * token mass, plus the coverage the top-10 types alone give — the
    * tokenizer-sizing metric (how much vocab does this source actually
    * need?). Per-source rank/cumsum windows are keyed by source over
    * the type table (bounded by vocabulary, not corpus); ties rank
    * deterministically by token.
    */
  val qVocabCoverage: QueryDef = QueryDef.sql(
    "q_vocab_coverage",
    """WITH tc AS (
      |  SELECT source, w, count(*) AS c FROM (
      |    SELECT source, unnest(string_split_regex(lower(trim(text)),
      |      '[\s[:punct:]]+')) AS w
      |    FROM documents)
      |  WHERE w != '' GROUP BY source, w),
      |r AS (
      |  SELECT source, w, c,
      |    sum(c) OVER (PARTITION BY source ORDER BY c DESC, w) AS cum,
      |    sum(c) OVER (PARTITION BY source) AS total,
      |    row_number() OVER (PARTITION BY source ORDER BY c DESC, w)
      |      AS rk
      |  FROM tc)
      |SELECT source,
      |  CAST(max(total) AS BIGINT) AS n_tokens,
      |  count(*) AS n_types,
      |  CAST(min(CASE WHEN cum * 10 >= total * 9 THEN rk END) AS BIGINT)
      |    AS types_for_p90,
      |  round(CAST(max(CASE WHEN rk <= 10 THEN cum END) AS DOUBLE)
      |    / max(total), 6) AS top10_coverage
      |FROM r GROUP BY source ORDER BY source""".stripMargin,
    doc = "smallest vocab prefix covering 90% token mass per source (tokenizer sizing)") { (s, dir) =>
    val tc = t(s, dir, "documents")
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "[\\s\\p{Punct}]+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val rankW = Window.partitionBy(col("source"))
      .orderBy(col("c").desc, col("w"))
    val cumW = rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col("source"))
    val r = tc
      .withColumn("cum", sum(col("c")).over(cumW))
      .withColumn("total", sum(col("c")).over(totW))
      .withColumn("rk", row_number().over(rankW))
    r.groupBy("source").agg(
        max(col("total")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        min(when(col("cum") * 10 >= col("total") * 9, col("rk")))
          .cast("long").as("types_for_p90"),
        round(max(when(col("rk") <= 10, col("cum"))).cast("double")
          / max(col("total")), 6).as("top10_coverage"))
      .orderBy("source")
  }

  /** Out-of-vocabulary rate per source against the global top-20
    * vocabulary — the tokenizer-fit check before training on a new
    * source mix (a source whose tokens keep missing the shared vocab
    * will fragment into long byte sequences). The vocab is one
    * bounded aggregation broadcast back; the OOV pass is a left
    * anti-ish membership flag, integer-ratio doubles.
    */
  val qOovRate: QueryDef = QueryDef.sql(
    "q_oov_rate",
    """WITH tok AS (
      |  SELECT source, w FROM (
      |    SELECT source, unnest(string_split_regex(lower(trim(text)),
      |      '[\s[:punct:]]+')) AS w
      |    FROM documents)
      |  WHERE w != ''),
      |vocab AS (
      |  SELECT w FROM (
      |    SELECT w, count(*) AS c,
      |      row_number() OVER (ORDER BY count(*) DESC, w) AS rk
      |    FROM tok GROUP BY w)
      |  WHERE rk <= 20)
      |SELECT source, count(*) AS n_tokens,
      |  CAST(count(CASE WHEN v.w IS NULL THEN 1 END) AS BIGINT)
      |    AS n_oov,
      |  round(CAST(count(CASE WHEN v.w IS NULL THEN 1 END) AS DOUBLE)
      |    / count(*), 6) AS oov_rate
      |FROM tok t LEFT JOIN vocab v ON t.w = v.w
      |GROUP BY source ORDER BY source""".stripMargin,
    doc = "OOV rate per source vs the global top-20 vocab (tokenizer fit)") { (s, dir) =>
    val tok = t(s, dir, "documents")
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "[\\s\\p{Punct}]+")).as("w"))
      .filter(col("w") =!= "")
    val rkW = Window.orderBy(col("c").desc, col("w"))
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(rkW))
      .filter(col("rk") <= 20)
      .select(col("w").as("vw"))
    tok.join(broadcast(vocab), col("w") === col("vw"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("vw").isNull, 1)).cast("long").as("n_oov"),
        round(count(when(col("vw").isNull, 1)).cast("double")
          / count(lit(1)), 6).as("oov_rate"))
      .orderBy("source")
  }

  /** Zipf slope of the corpus token distribution: OLS of ln(freq) on
    * ln(rank) over the frequency-ranked vocabulary (natural text sits
    * near −1; template spam flattens it, noise steepens it). The rank
    * window runs over the bounded type table; the regression is the
    * decimal-cast sufficient-statistics shape of q_trend_ols on
    * (ln rank, ln freq) pairs.
    */
  val qZipf: QueryDef = QueryDef.sql(
    "q_zipf",
    """WITH tc AS (
      |  SELECT w, count(*) AS c FROM (
      |    SELECT unnest(string_split_regex(lower(trim(text)),
      |      '[\s[:punct:]]+')) AS w
      |    FROM documents)
      |  WHERE w != '' GROUP BY w),
      |r AS (
      |  SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, w) AS DOUBLE))
      |    AS x, ln(CAST(c AS DOUBLE)) AS y
      |  FROM tc),
      |s AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy
      |  FROM r)
      |SELECT n,
      |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
      |    AS zipf_slope
      |FROM s""".stripMargin,
    doc = "Zipf slope: ln-freq vs ln-rank OLS over the vocabulary (corpus health)") { (s, dir) =>
    val tc = t(s, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "[\\s\\p{Punct}]+"))
        .as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val rkW = Window.orderBy(col("c").desc, col("w"))
    val r = tc.withColumn("x", log(row_number().over(rkW).cast("double")))
      .withColumn("y", log(col("c").cast("double")))
    val st = r.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(28,12)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(28,12)")).cast("double").as("sy"),
      sum((col("x") * col("x")).cast("decimal(28,12)")).cast("double")
        .as("sxx"),
      sum((col("x") * col("y")).cast("decimal(28,12)")).cast("double")
        .as("sxy"))
    st.select(col("n"),
      round((col("n") * col("sxy") - col("sx") * col("sy"))
        / (col("n") * col("sxx") - col("sx") * col("sx")), 6)
        .as("zipf_slope"))
  }

  /** Subtitle cue extraction ([[graft.text.Subtitles]]): the text
    * sidecar of a video corpus as rows. Exact oracle over the time
    * arithmetic and whole texts: SRT cues at 1500-4000 /
    * 4200-6900 (two-line text) / 3723004-3725006 ms (the skipped
    * counter pins monotone-not-sequential handling); VTT cues at
    * 1500-4000 (identifier + settings dropped) / 130250-132000 ms
    * (short-form times), with the NOTE block skipped; junk pins the
    * flagged fallback. A time-parse, block-split, or format-sniff
    * regression hash-fails.
    */
  val qSubtitleCues: QueryDef = QueryDef.sql(
    "q_subtitle_cues",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(1500 AS BIGINT), CAST(4000 AS BIGINT),
      |   CAST(2500 AS BIGINT), 'srt', 'Hello there.', true),
      |  (1, 1, CAST(4200 AS BIGINT), CAST(6900 AS BIGINT),
      |   CAST(2700 AS BIGINT), 'srt', 'Two lines' || chr(10) || 'of text.', true),
      |  (1, 2, CAST(3723004 AS BIGINT), CAST(3725006 AS BIGINT),
      |   CAST(2002 AS BIGINT), 'srt', 'Counter skipped.', true),
      |  (2, 0, CAST(1500 AS BIGINT), CAST(4000 AS BIGINT),
      |   CAST(2500 AS BIGINT), 'vtt', 'Hello again.', true),
      |  (2, 1, CAST(130250 AS BIGINT), CAST(132000 AS BIGINT),
      |   CAST(1750 AS BIGINT), 'vtt', 'Short-form times.', true),
      |  (3, -1, NULL, NULL, NULL, NULL, NULL, false))
      |  AS t(asset_id, cue_idx, start_ms, end_ms, duration_ms, format,
      |       text, parsed)
      |ORDER BY asset_id, cue_idx""".stripMargin,
    doc = "SRT/WebVTT subtitle cue extraction: timed transcript rows " +
      "(training-data text ops; the video corpus's text sidecar)") {
    (s, dir) =>
    import graft.text.Subtitles
    import s.implicits._
    val srtDoc = Seq(
      "1", "00:00:01,500 --> 00:00:04,000", "Hello there.", "",
      "2", "00:00:04,200 --> 00:00:06,900", "Two lines", "of text.", "",
      "4", "01:02:03,004 --> 01:02:05,006", "Counter skipped.", ""
    ).mkString("\n")
    val vttDoc = Seq(
      "WEBVTT - sidecar", "",
      "NOTE", "a comment block", "",
      "intro", "00:00:01.500 --> 00:00:04.000 align:start", "Hello again.",
      "", "02:10.250 --> 02:12.000", "Short-form times.", ""
    ).mkString("\n")
    val docs = Seq((1L, srtDoc), (2L, vttDoc), (3L, "just prose"))
      .toDF("id", "doc")
    Subtitles.extractCues(docs, "id", "doc")(s)
      .select(col("asset_id"), col("cue_idx"),
        when(col("parsed"), col("start_ms")).as("start_ms"),
        when(col("parsed"), col("end_ms")).as("end_ms"),
        when(col("parsed"), col("duration_ms")).as("duration_ms"),
        when(col("parsed"), col("format")).as("format"),
        when(col("parsed"), col("text")).as("text"),
        col("parsed"))
      .orderBy("asset_id", "cue_idx")
  }

  private def warcFixture: (Array[Byte], Array[Byte]) = {
    import graft.io.Warc
    val body1 = ("<html><head><title>A &amp; B</title></head><body>" +
      "<p>Hello crawl.</p><p>Second para.</p></body></html>")
      .getBytes("UTF-8")
    val body2 = "<html><body><div>Other page</div></body></html>"
      .getBytes("UTF-8")
    val plain = Warc.encodeSynthetic(Seq(
      ("warcinfo", "", "application/warc-fields",
        "software: graft\r\n".getBytes("ISO-8859-1")),
      ("request", "http://a.example/",
        "application/http; msgtype=request",
        "GET / HTTP/1.1\r\nHost: a.example\r\n\r\n".getBytes("ISO-8859-1")),
      ("response", "http://a.example/",
        "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/html; charset=utf-8")), body1)),
      ("response", "http://b.example/x",
        "application/http; msgtype=response",
        Warc.httpResponse(404, "Not Found",
          Seq(("Content-Type", "text/html")),
          "<html><body>gone</body></html>".getBytes("UTF-8"))),
      ("response", "http://c.example/",
        "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/html")), body2))))
    // the Common Crawl shape: one gzip member per record
    val records = Warc.recordIndex(plain).get.map(r =>
      java.util.Arrays.copyOfRange(plain, r.byteStart.toInt,
        (r.byteStart + r.byteLen).toInt))
    (plain, Warc.gzipPerRecord(records))
  }

  /** WARC record indexing ([[graft.io.Warc]]): the Common Crawl
    * container. Byte-exact oracle hand-derived from the header
    * arithmetic (CRLF framing, Content-Length content, HTTP head →
    * body split): five records at 0/147/357/695/954, response
    * bodies at 590/920/1171. Asset 2 is the SAME archive as
    * member-per-record gzip — spans address the uncompressed stream,
    * so its rows are identical (the documented contract); junk pins
    * the flagged fallback. A framing, header-parse, gzip, or
    * HTTP-split regression hash-fails.
    */
  val qWarcRecords: QueryDef = QueryDef.sql(
    "q_warc_records",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(0 AS BIGINT), CAST(147 AS BIGINT), 'warcinfo', '',
      |   CAST(17 AS BIGINT), -1, CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), true),
      |  (1, 1, CAST(147 AS BIGINT), CAST(210 AS BIGINT), 'request',
      |   'http://a.example/',
      |   CAST(35 AS BIGINT), -1, CAST(353 AS BIGINT), CAST(0 AS BIGINT), true),
      |  (1, 2, CAST(357 AS BIGINT), CAST(338 AS BIGINT), 'response',
      |   'http://a.example/',
      |   CAST(160 AS BIGINT), 200, CAST(590 AS BIGINT), CAST(101 AS BIGINT), true),
      |  (1, 3, CAST(695 AS BIGINT), CAST(259 AS BIGINT), 'response',
      |   'http://b.example/x',
      |   CAST(81 AS BIGINT), 404, CAST(920 AS BIGINT), CAST(30 AS BIGINT), true),
      |  (1, 4, CAST(954 AS BIGINT), CAST(268 AS BIGINT), 'response',
      |   'http://c.example/',
      |   CAST(91 AS BIGINT), 200, CAST(1171 AS BIGINT), CAST(47 AS BIGINT), true),
      |  (2, 0, CAST(0 AS BIGINT), CAST(147 AS BIGINT), 'warcinfo', '',
      |   CAST(17 AS BIGINT), -1, CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), true),
      |  (2, 1, CAST(147 AS BIGINT), CAST(210 AS BIGINT), 'request',
      |   'http://a.example/',
      |   CAST(35 AS BIGINT), -1, CAST(353 AS BIGINT), CAST(0 AS BIGINT), true),
      |  (2, 2, CAST(357 AS BIGINT), CAST(338 AS BIGINT), 'response',
      |   'http://a.example/',
      |   CAST(160 AS BIGINT), 200, CAST(590 AS BIGINT), CAST(101 AS BIGINT), true),
      |  (2, 3, CAST(695 AS BIGINT), CAST(259 AS BIGINT), 'response',
      |   'http://b.example/x',
      |   CAST(81 AS BIGINT), 404, CAST(920 AS BIGINT), CAST(30 AS BIGINT), true),
      |  (2, 4, CAST(954 AS BIGINT), CAST(268 AS BIGINT), 'response',
      |   'http://c.example/',
      |   CAST(91 AS BIGINT), 200, CAST(1171 AS BIGINT), CAST(47 AS BIGINT), true),
      |  (3, -1, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, false))
      |  AS t(asset_id, record_idx, byte_start, byte_len, warc_type,
      |       target_uri, content_len, http_status, body_start, body_len,
      |       indexed)
      |ORDER BY asset_id, record_idx""".stripMargin,
    doc = "WARC record index: byte spans + routing headers + HTTP " +
      "body splits, gzip-transparent (the Common Crawl front door)") {
    (s, dir) =>
    import s.implicits._
    import graft.io.Warc
    val (plain, gz) = warcFixture
    val assets = Seq((1L, plain), (2L, gz), (3L, Array[Byte](9, 9, 9)))
      .toDF("id", "bytes")
    Warc.extractRecords(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("record_idx"),
        when(col("indexed"), col("byte_start")).as("byte_start"),
        when(col("indexed"), col("byte_len")).as("byte_len"),
        when(col("indexed"), col("warc_type")).as("warc_type"),
        when(col("indexed"), col("target_uri")).as("target_uri"),
        when(col("indexed"), col("content_len")).as("content_len"),
        when(col("indexed"), col("http_status")).as("http_status"),
        when(col("indexed"), col("body_start")).as("body_start"),
        when(col("indexed"), col("body_len")).as("body_len"),
        col("indexed"))
      .orderBy("asset_id", "record_idx")
  }

  /** The crawl-to-training-text composition ([[graft.io.Warc
    * .extractHtmlPages]] + [[graft.text.HtmlText]]): gunzip → record
    * index → 2xx HTML responses → body slice → tag/entity/whitespace
    * extraction, in one call. Exact oracle over the extracted
    * strings: the title drops from body text and decodes its entity
    * (`A &amp; B`), block tags become line breaks, the 404 record is
    * excluded, and the gzipped asset yields the identical pages.
    * Junk pins the flagged fallback. Any regression in the WARC
    * walk, HTTP split, or an extraction rule hash-fails.
    */
  val qWarcHtmlText: QueryDef = QueryDef.sql(
    "q_warc_html_text",
    """SELECT * FROM (VALUES
      |  (1, 2, 'http://a.example/', 200, 'A & B',
      |   'Hello crawl.' || chr(10) || 'Second para.', 25, true),
      |  (1, 4, 'http://c.example/', 200, '', 'Other page', 10, true),
      |  (2, 2, 'http://a.example/', 200, 'A & B',
      |   'Hello crawl.' || chr(10) || 'Second para.', 25, true),
      |  (2, 4, 'http://c.example/', 200, '', 'Other page', 10, true),
      |  (3, -1, NULL, NULL, NULL, NULL, NULL, false),
      |  (4, 0, 'http://l.example/', 200, '', 'café prêt', 9, true))
      |  AS t(asset_id, record_idx, target_uri, http_status, title,
      |       text, n_chars, extracted)
      |ORDER BY asset_id, record_idx""".stripMargin,
    doc = "WARC -> HTML -> training text in one composed call " +
      "(the Common-Crawl-to-corpus path; feeds quality/dedup/langid)") {
    (s, dir) =>
    import s.implicits._
    import graft.io.Warc
    val (plain, gz) = warcFixture
    // a NON-UTF-8 page: the HTTP charset parameter must drive the
    // decode (as UTF-8 these bytes would become U+FFFD)
    val latin = Warc.encodeSynthetic(Seq(
      ("response", "http://l.example/",
        "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/html; charset=ISO-8859-1")),
          "<html><body><p>café prêt</p></body></html>"
            .getBytes("ISO-8859-1")))))
    val assets = Seq((1L, plain), (2L, gz), (3L, Array[Byte](9, 9, 9)),
      (4L, latin)).toDF("id", "bytes")
    Warc.extractHtmlPages(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("record_idx"),
        when(col("extracted"), col("target_uri")).as("target_uri"),
        when(col("extracted"), col("http_status")).as("http_status"),
        when(col("extracted"), col("title")).as("title"),
        when(col("extracted"), col("text")).as("text"),
        when(col("extracted"), col("n_chars")).as("n_chars"),
        col("extracted"))
      .orderBy("asset_id", "record_idx")
  }

  private def wdsShard: Array[Byte] = graft.io.Tar.encodeSynthetic(Seq(
    ("0001.jpg", Array.fill[Byte](700)(0x11), 1700000000L),
    ("0001.txt", Array.fill[Byte](40)(0x22), 1700000000L),
    ("0001.json", Array.fill[Byte](25)(0x33), 1700000000L),
    ("0002.jpg", Array.fill[Byte](512)(0x44), 1700000001L),
    ("0002.txt", Array.fill[Byte](30)(0x55), 1700000001L)))

  /** Gzip member indexing ([[graft.io.GzipMembers]]): the
    * parallel-split key for `.warc.gz`-shaped archives — compressed
    * member spans are the ranged-fetch units a fan-out hands to
    * workers. The oracle pins the DETERMINISTIC columns (member
    * count, uncompressed lengths, trailing-CRC validity); the
    * compressed offsets are deflate-encoder output (JDK-dependent)
    * and are round-trip-verified in GzipMembersSpec instead — each
    * span must slice back to an independently inflatable member.
    */
  val qGzipMembers: QueryDef = QueryDef.sql(
    "q_gzip_members",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(147 AS BIGINT), true),
      |  (1, 1, CAST(210 AS BIGINT), true),
      |  (1, 2, CAST(338 AS BIGINT), true),
      |  (1, 3, CAST(259 AS BIGINT), true),
      |  (1, 4, CAST(268 AS BIGINT), true),
      |  (2, -1, NULL, false))
      |  AS t(asset_id, member_idx, uncomp_len, indexed)
      |ORDER BY asset_id, member_idx""".stripMargin,
    doc = "gzip member index: uncompressed lengths + tiling from the " +
      "member walk (the .warc.gz parallel-split key; comp offsets " +
      "are spec-verified round-trip)") {
    (s, dir) =>
    import s.implicits._
    import graft.io.GzipMembers
    val (_, gz) = warcFixture
    val assets = Seq((1L, gz), (2L, Array[Byte](9, 9, 9)))
      .toDF("id", "bytes")
    GzipMembers.extractMembers(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("member_idx"),
        when(col("indexed"), col("uncomp_len")).as("uncomp_len"),
        col("indexed"))
      .orderBy("asset_id", "member_idx")
  }

  /** TAR member indexing ([[graft.io.Tar]]): the WebDataset
    * training-shard container. Byte-exact oracle from the 512-block
    * arithmetic: member data at 512/2048/3072/4096/5120 (700 B pads
    * to 1024, the exact-512 member pads zero); the key/ext split
    * (`0001` + `jpg`) is the WebDataset grouping rule. Asset 2 pins
    * the GNU long-name entry ('L' header+data precede the member,
    * shifting it to 1536 with the FULL >100-char name carried);
    * junk pins the flagged fallback. A checksum, octal-size,
    * padding, or long-name regression hash-fails.
    */
  val qTarIndex: QueryDef = QueryDef.sql(
    "q_tar_index",
    """SELECT * FROM (VALUES
      |  (1, 0, '0001.jpg', '0001', 'jpg', CAST(512 AS BIGINT),
      |   CAST(700 AS BIGINT), true),
      |  (1, 1, '0001.txt', '0001', 'txt', CAST(2048 AS BIGINT),
      |   CAST(40 AS BIGINT), true),
      |  (1, 2, '0001.json', '0001', 'json', CAST(3072 AS BIGINT),
      |   CAST(25 AS BIGINT), true),
      |  (1, 3, '0002.jpg', '0002', 'jpg', CAST(4096 AS BIGINT),
      |   CAST(512 AS BIGINT), true),
      |  (1, 4, '0002.txt', '0002', 'txt', CAST(5120 AS BIGINT),
      |   CAST(30 AS BIGINT), true),
      |  (2, 0, 'shards/' || repeat('x', 110) || '/42.jpg',
      |   'shards/' || repeat('x', 110) || '/42', 'jpg',
      |   CAST(1536 AS BIGINT), CAST(20 AS BIGINT), true),
      |  (3, -1, NULL, NULL, NULL, NULL, NULL, false))
      |  AS t(asset_id, entry_idx, name, sample_key, ext, data_start,
      |       data_len, indexed)
      |ORDER BY asset_id, entry_idx""".stripMargin,
    doc = "TAR member index with the WebDataset key/ext split " +
      "(training-shard container; spans are the member fetch ranges)") {
    (s, dir) =>
    import s.implicits._
    import graft.io.Tar
    val longName = "shards/" + ("x" * 110) + "/42.jpg"
    val assets = Seq(
      (1L, wdsShard),
      (2L, Tar.encodeSynthetic(Seq(
        (longName, Array.fill[Byte](20)(0x66), 1700000002L)))),
      (3L, Array[Byte](9, 9, 9))
    ).toDF("id", "bytes")
    Tar.extractEntries(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("entry_idx"),
        when(col("indexed"), col("name")).as("name"),
        when(col("indexed"), col("sample_key")).as("sample_key"),
        when(col("indexed"), col("ext")).as("ext"),
        when(col("indexed"), col("data_start")).as("data_start"),
        when(col("indexed"), col("data_len")).as("data_len"),
        col("indexed"))
      .orderBy("asset_id", "entry_idx")
  }

  /** WebDataset sample assembly: `groupBy(sample_key)` over the TAR
    * index IS the convention's pairing rule — one row per training
    * sample with its member count, total bytes and sorted extension
    * list. Exact oracle over the grouped facts (sample 0001 = jpg+
    * json+txt, 765 B; 0002 = jpg+txt, 542 B). A key-split or
    * grouping regression hash-fails.
    */
  val qWebdatasetSamples: QueryDef = QueryDef.sql(
    "q_webdataset_samples",
    """SELECT * FROM (VALUES
      |  (1, '0001', 3, CAST(765 AS BIGINT), 'jpg,json,txt'),
      |  (1, '0002', 2, CAST(542 AS BIGINT), 'jpg,txt'))
      |  AS t(asset_id, sample_key, n_members, total_bytes, exts)
      |ORDER BY asset_id, sample_key""".stripMargin,
    doc = "WebDataset sample pairing over the TAR index: one row per " +
      "image-text training sample (multimodal training-shard ops)") {
    (s, dir) =>
    import s.implicits._
    import graft.io.Tar
    val assets = Seq((1L, wdsShard)).toDF("id", "bytes")
    Tar.extractEntries(assets, "id", "bytes")(s)
      .filter(col("indexed") && col("typeflag") === "0")
      .groupBy(col("asset_id"), col("sample_key"))
      .agg(count(lit(1)).cast("int").as("n_members"),
        sum(col("data_len")).as("total_bytes"),
        concat_ws(",", sort_array(collect_list(col("ext")))).as("exts"))
      .orderBy("asset_id", "sample_key")
  }

  /** TFRecord indexing ([[graft.io.TfRecord]]): the other dominant
    * training-shard format beside WebDataset tars. Byte-exact oracle
    * from the framing arithmetic (12-byte head + payload + 4-byte
    * CRC): payloads 100/3/250 sit at 12/128/147; both masked
    * CRC32Cs validate per record (the strict walk's contract — a
    * corrupt length cannot send the walk into payload bytes). Junk
    * pins the flagged fallback. A framing, CRC-mask, or tiling
    * regression hash-fails.
    */
  val qTfrecordIndex: QueryDef = QueryDef.sql(
    "q_tfrecord_index",
    """SELECT * FROM (VALUES
      |  (1, 0, CAST(12 AS BIGINT), CAST(100 AS BIGINT), true),
      |  (1, 1, CAST(128 AS BIGINT), CAST(3 AS BIGINT), true),
      |  (1, 2, CAST(147 AS BIGINT), CAST(250 AS BIGINT), true),
      |  (2, -1, NULL, NULL, false))
      |  AS t(asset_id, record_idx, data_start, data_len, indexed)
      |ORDER BY asset_id, record_idx""".stripMargin,
    doc = "TFRecord framing index: payload spans + masked-CRC32C " +
      "validation (training-shard container)") {
    (s, dir) =>
    import s.implicits._
    import graft.io.TfRecord
    val assets = Seq(
      (1L, TfRecord.encodeSynthetic(Seq(
        Array.tabulate[Byte](100)(i => ((i * 7) & 0x7f).toByte),
        Array.tabulate[Byte](3)(i => i.toByte),
        Array.tabulate[Byte](250)(i => ((i * 31) & 0x7f).toByte)))),
      (2L, Array[Byte](9, 9, 9))
    ).toDF("id", "bytes")
    TfRecord.extractRecords(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("record_idx"),
        when(col("indexed"), col("data_start")).as("data_start"),
        when(col("indexed"), col("data_len")).as("data_len"),
        col("indexed"))
      .orderBy("asset_id", "record_idx")
  }

  /** ZIP central-directory indexing ([[graft.io.ZipIndex]]):
    * document corpora (and DOCX/EPUB) are zips, and the
    * end-of-file central directory makes ZIP the family's most
    * seek-friendly container. The fixture is written by the JDK's
    * OWN ZipOutputStream (a real external encoder); the oracle pins
    * the encoder-independent columns (names, methods, sizes) and
    * ZipIndexSpec round-trips every span back to exact/inflatable
    * content (data offsets are writer-layout details, not oracle
    * constants). Junk pins the flagged fallback.
    */
  val qZipIndex: QueryDef = QueryDef.sql(
    "q_zip_index",
    """SELECT * FROM (VALUES
      |  (1, 0, '0001.txt', 0, CAST(100 AS BIGINT), CAST(100 AS BIGINT), true),
      |  (1, 1, 'sub/0002.bin', 0, CAST(3 AS BIGINT), CAST(3 AS BIGINT), true),
      |  (1, 2, '0003.dat', 0, CAST(250 AS BIGINT), CAST(250 AS BIGINT), true),
      |  (2, -1, NULL, NULL, NULL, NULL, false))
      |  AS t(asset_id, entry_idx, name, method, comp_len, uncomp_len,
      |       indexed)
      |ORDER BY asset_id, entry_idx""".stripMargin,
    doc = "ZIP central-directory member index (document/shard " +
      "container; spans are spec-verified round-trip)") {
    (s, dir) =>
    import s.implicits._
    import graft.io.ZipIndex
    val zipBytes = {
      val out = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(out)
      Seq(("0001.txt", 100), ("sub/0002.bin", 3), ("0003.dat", 250))
        .foreach { case (name, n) =>
          val data = Array.tabulate[Byte](n)(i => ((i * 7) & 0x7f).toByte)
          val e = new java.util.zip.ZipEntry(name)
          e.setTime(1700000000000L)
          e.setMethod(java.util.zip.ZipEntry.STORED)
          e.setSize(n.toLong); e.setCompressedSize(n.toLong)
          val c = new java.util.zip.CRC32(); c.update(data)
          e.setCrc(c.getValue)
          z.putNextEntry(e); z.write(data); z.closeEntry()
        }
      z.close()
      out.toByteArray
    }
    val assets = Seq((1L, zipBytes), (2L, Array[Byte](9, 9, 9)))
      .toDF("id", "bytes")
    ZipIndex.extractEntries(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("entry_idx"),
        when(col("indexed"), col("name")).as("name"),
        when(col("indexed"), col("method")).as("method"),
        when(col("indexed"), col("comp_len")).as("comp_len"),
        when(col("indexed"), col("uncomp_len")).as("uncomp_len"),
        col("indexed"))
      .orderBy("asset_id", "entry_idx")
  }

  /** The BOOK-corpus composition ([[graft.io.ZipIndex
    * .extractHtmlMembers]]): an EPUB is a zip of XHTML — zip index →
    * HTML members → inflate → HtmlText, in one call, the books twin
    * of q_warc_html_text. The fixture is an epub-shaped zip written
    * by the JDK's OWN ZipOutputStream (mimetype + container.xml
    * skipped as non-HTML; two DEFLATED chapters extracted). Exact
    * oracle over titles and texts; junk pins the flagged fallback.
    */
  val qEpubText: QueryDef = QueryDef.sql(
    "q_epub_text",
    """SELECT * FROM (VALUES
      |  (1, 3, 'OEBPS/ch1.xhtml', 'Chapter One',
      |   'It began at sea.' || chr(10) || 'The wind held.', 31, true),
      |  (1, 4, 'OEBPS/ch2.xhtml', 'Chapter Two', 'Land came slowly.',
      |   17, true),
      |  (2, -1, NULL, NULL, NULL, NULL, false))
      |  AS t(asset_id, entry_idx, name, title, text, n_chars,
      |       extracted)
      |ORDER BY asset_id, entry_idx""".stripMargin,
    doc = "EPUB/zip-of-HTML -> training text in one composed call " +
      "(the book-corpus path; feeds quality/dedup/langid)") {
    (s, dir) =>
    import s.implicits._
    import graft.io.ZipIndex
    def ch(title: String, paras: Seq[String]): String =
      s"<html><head><title>$title</title></head><body>" +
        paras.map(p => s"<p>$p</p>").mkString + "</body></html>"
    val epub = {
      val out = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(out)
      def put(name: String, data: Array[Byte], stored: Boolean): Unit = {
        val e = new java.util.zip.ZipEntry(name)
        e.setTime(1700000000000L)
        if (stored) {
          e.setMethod(java.util.zip.ZipEntry.STORED)
          e.setSize(data.length.toLong)
          e.setCompressedSize(data.length.toLong)
          val c = new java.util.zip.CRC32(); c.update(data)
          e.setCrc(c.getValue)
        }
        z.putNextEntry(e); z.write(data); z.closeEntry()
      }
      // the real EPUB shape: STORED mimetype first, then metadata
      put("mimetype", "application/epub+zip".getBytes("UTF-8"),
        stored = true)
      put("META-INF/container.xml",
        "<container version=\"1.0\"/>".getBytes("UTF-8"), stored = false)
      put("OEBPS/style.css", "p { margin: 0 }".getBytes("UTF-8"),
        stored = false)
      put("OEBPS/ch1.xhtml", ch("Chapter One",
        Seq("It began at sea.", "The wind held.")).getBytes("UTF-8"),
        stored = false)
      put("OEBPS/ch2.xhtml", ch("Chapter Two",
        Seq("Land came slowly.")).getBytes("UTF-8"), stored = false)
      z.close()
      out.toByteArray
    }
    val assets = Seq((1L, epub), (2L, Array[Byte](9, 9, 9)))
      .toDF("id", "bytes")
    ZipIndex.extractHtmlMembers(assets, "id", "bytes")(s)
      .select(col("asset_id"), col("entry_idx"),
        when(col("extracted"), col("name")).as("name"),
        when(col("extracted"), col("title")).as("title"),
        when(col("extracted"), col("text")).as("text"),
        when(col("extracted"), col("n_chars")).as("n_chars"),
        col("extracted"))
      .orderBy("asset_id", "entry_idx")
  }

  /** The END-TO-END crawl curation composition: WARC bytes →
    * [[graft.io.Warc.extractHtmlPages]] → the text operators
    * (token counting + language ID) in ONE plan — a user goes from a
    * Common Crawl shard to language-routed, token-counted training
    * rows without leaving the engine. Exact oracle: the extracted
    * sentences' whitespace token counts (13/12), char counts
    * (57/59), and the stopword language votes (en 7-0, de 0-7),
    * hand-derived independently. Any regression across the WARC
    * walk, HTML extraction, tokenizer, or langid lexicons
    * hash-fails in one place.
    */
  val qWarcCurate: QueryDef = QueryDef.sql(
    "q_warc_curate",
    """SELECT * FROM (VALUES
      |  (0, 'http://en.example/', 13, 57, 'en'),
      |  (1, 'http://de.example/', 12, 59, 'de'))
      |  AS t(record_idx, target_uri, n_tokens, n_chars, lang_pred)
      |ORDER BY record_idx""".stripMargin,
    doc = "WARC -> HTML -> tokens + language ID in one composed plan " +
      "(the crawl-shard-to-curated-rows path)") {
    (s, dir) =>
    import s.implicits._
    import graft.io.Warc
    def page(uri: String, sentence: String): (String, String, String,
        Array[Byte]) =
      ("response", uri, "application/http; msgtype=response",
        Warc.httpResponse(200, "OK", Seq(("Content-Type", "text/html")),
          s"<html><body><p>$sentence</p></body></html>".getBytes("UTF-8")))
    val shard = Warc.encodeSynthetic(Seq(
      page("http://en.example/",
        "The cat and the dog run with the ball. It is that simple."),
      page("http://de.example/",
        "Der Hund und die Katze sind nicht ein Problem mit der Zeit.")))
    val assets = Seq((1L, shard)).toDF("id", "bytes")
    Warc.extractHtmlPages(assets, "id", "bytes")(s).toDF
      .select(col("record_idx"), col("target_uri"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars"),
        TextAnalysis.languageId(col("text")).as("lang_pred"))
      .orderBy("record_idx")
  }

  /** End-to-end HYDRATION gate ([[graft.io.SpanFetch]] — the one
    * operator that moves data bytes): a WebDataset shard written to
    * DISK → [[graft.io.Tar.extractEntriesByPath]] member spans
    * (header-only walk over the path) → [[graft.io.SpanFetch
    * .fetchSpans]] ranged reads → decode of the FETCHED bytes
    * ([[graft.multimodal.ImageDims]] on the image member, UTF-8 on
    * the captions) plus a byte-exact comparison against the encoded
    * member contents. Oracle by construction: the PNG is the JDK
    * ImageIO encoder's own 31x17 output (dims pin the decode, not
    * the writer's byte layout); caption texts are the literal member
    * contents ('Caf'||CHR(233) pins multi-byte UTF-8 across the
    * fetch boundary); `len_ok` pins that EXACTLY the span's length
    * came back. Rows 100-102 pin the three refusal postures as
    * flagged rows, never task kills: a span above `maxSpanBytes`
    * (cap 1 MiB here, the corrupt-index OOM guard), an unreadable
    * path, and a read past EOF. A span-arithmetic, reader-routing,
    * cap, or fetch-boundary regression hash-fails.
    */
  val qSpanFetch: QueryDef = QueryDef.sql(
    "q_span_fetch",
    """SELECT * FROM (VALUES
      |  (CAST(0 AS BIGINT), 'png', true, true, 31, 17, '', true),
      |  (CAST(1 AS BIGINT), 'txt', true, true, -1, -1,
      |   'hello span fetch', true),
      |  (CAST(2 AS BIGINT), 'txt', true, true, -1, -1,
      |   CAST('Caf' || CHR(233) || ' crawl' AS VARCHAR), true),
      |  (CAST(100 AS BIGINT), 'oversize', false, false, -1, -1, '',
      |   false),
      |  (CAST(101 AS BIGINT), 'missing', false, false, -1, -1, '',
      |   false),
      |  (CAST(102 AS BIGINT), 'eof', false, false, -1, -1, '', false))
      |  AS t(span_id, kind, fetched, len_ok, width, height, text,
      |       bytes_match)
      |ORDER BY span_id""".stripMargin,
    doc = "End-to-end shard hydration: path-walked member spans -> " +
      "SpanFetch ranged reads -> decoded bytes, with oversize/" +
      "unreadable/out-of-range refusals as flagged rows") {
    (s, dir) =>
    import s.implicits._
    import graft.io.{SpanFetch, Tar}
    // the shard on DISK: the fetch must cross a real storage boundary
    val png: Array[Byte] = {
      val img = new java.awt.image.BufferedImage(31, 17,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 31).foreach(x => (0 until 17).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "png", out))
      out.toByteArray
    }
    val txt1 = "hello span fetch".getBytes("UTF-8")
    val txt2 = "Café crawl".getBytes("UTF-8")
    val shard = Tar.encodeSynthetic(Seq(
      ("0001.png", png, 1700000000L),
      ("0001.txt", txt1, 1700000000L),
      ("0002.txt", txt2, 1700000001L)))
    val tmp = java.nio.file.Files.createTempDirectory("span_fetch_gate")
    val shardPath = tmp.resolve("shard.tar")
    java.nio.file.Files.write(shardPath, shard)
    val path = shardPath.toString
    // member spans from the header-only walk over the PATH
    val memberSpans = Tar.extractEntriesByPath(
        Seq((1L, path)).toDF("id", "path"), "id", "path")(s)
      .filter(col("indexed") && col("typeflag") === "0")
      .select(col("entry_idx").cast("long").as("span_id"),
        lit(path).as("path"), col("data_start"), col("data_len"))
    val refusals = Seq(
      (100L, path, 0L, (1L << 20) + 1),        // above the cap
      (101L, tmp.resolve("missing.tar").toString, 0L, 10L), // unreadable
      (102L, path, 1L << 30, 10L))             // past EOF
      .toDF("span_id", "path", "data_start", "data_len")
    val fetched = SpanFetch.fetchSpans(memberSpans.unionByName(refusals),
      "span_id", "path", "data_start", "data_len",
      maxSpanBytes = 1L << 20)(s)
    // decode the FETCHED bytes and pin them against the encoded
    // members; the fixture's span_id -> (kind, expected) map is a
    // few hundred bytes of task closure
    val expected: Map[Long, (String, Array[Byte])] = Map(
      0L -> ("png", png), 1L -> ("txt", txt1), 2L -> ("txt", txt2),
      100L -> ("oversize", Array.empty[Byte]),
      101L -> ("missing", Array.empty[Byte]),
      102L -> ("eof", Array.empty[Byte]))
    fetched.map { f =>
      val (kind, exp) = expected(f.id)
      val bytesMatch = f.fetched && exp.nonEmpty &&
        java.util.Arrays.equals(exp, f.bytes)
      val dims =
        if (f.fetched) graft.multimodal.ImageDims.dims(f.bytes) else None
      val text =
        if (f.fetched && kind == "txt")
          new String(f.bytes, java.nio.charset.StandardCharsets.UTF_8)
        else ""
      (f.id, kind, f.fetched,
        f.fetched && f.bytes.length.toLong == f.byte_len,
        dims.map(_.width).getOrElse(-1), dims.map(_.height).getOrElse(-1),
        text, bytesMatch)
    }.toDF("span_id", "kind", "fetched", "len_ok", "width", "height",
      "text", "bytes_match")
      .orderBy("span_id")
  }

  /** CDX INDEX gate ([[graft.io.WarcCdx]] — the Common Crawl access
    * pattern's index half): a per-record `.warc.gz` AND its
    * uncompressed twin walk to CDX rows — SURT urlkeys, 14-digit
    * `WARC-Date` timestamps, payload mime (bare type, params off),
    * HTTP status, base32 block digests, gzip-member/raw-record spans
    * — and every row survives a CDXJ serialize → `parseCdxj`
    * round-trip inside the SAME plan. Oracle: hand-derived SURT/
    * timestamp/mime/status literals, IDENTICAL field rows for both
    * carriages (compressed vs plain — oracle-pinned parity), a
    * corrupt asset as the flagged row, `digest_ok` pinning the
    * 32-char base32 BLOCK digest shape (the digest VALUE is pinned
    * end-to-end by q_warc_hydrate's fetch-and-recompute match), and
    * `payload_digest_ok` pinning the PAYLOAD digest semantics — the
    * request record's empty entity body digests to the published
    * SHA-1("") base32 vector (a hand-derivable constant), response
    * payload digests are well-formed and differ from the block
    * digest (the body is a strict subset of the content block).
    */
  val qWarcCdx: QueryDef = QueryDef.sql(
    "q_warc_cdx",
    """SELECT * FROM (VALUES
      |  (CAST(1 AS BIGINT), 0, 'com,example)/a/b?a=1&b=2',
      |   '20240305060708',
      |   'http://www.Example.COM:80/A/B?b=2&a=1&utm_x=9#frag',
      |   'text/html', 200, 'response', true, true, true, true, true),
      |  (CAST(1 AS BIGINT), 1, 'com,example)/a/b', '20240305060708',
      |   'http://www.example.com/a/b', 'application/http', -1,
      |   'request', true, true, true, true, true),
      |  (CAST(1 AS BIGINT), 2, 'org,test,sub:8443)/x', '20240305060709',
      |   'https://sub.test.org:8443/X', 'text/plain', 200, 'response',
      |   true, true, true, true, true),
      |  (CAST(2 AS BIGINT), 0, 'com,example)/a/b?a=1&b=2',
      |   '20240305060708',
      |   'http://www.Example.COM:80/A/B?b=2&a=1&utm_x=9#frag',
      |   'text/html', 200, 'response', true, true, true, true, true),
      |  (CAST(2 AS BIGINT), 1, 'com,example)/a/b', '20240305060708',
      |   'http://www.example.com/a/b', 'application/http', -1,
      |   'request', true, true, true, true, true),
      |  (CAST(2 AS BIGINT), 2, 'org,test,sub:8443)/x', '20240305060709',
      |   'https://sub.test.org:8443/X', 'text/plain', 200, 'response',
      |   true, true, true, true, true),
      |  (CAST(3 AS BIGINT), -1, '', '', '', '', -1, '', false, true,
      |   false, false, true))
      |  AS t(asset_id, record_idx, urlkey, timestamp, url, mime,
      |       status, warc_type, digest_ok, payload_digest_ok, parsed,
      |       indexed, cdxj_ok)
      |ORDER BY asset_id, record_idx""".stripMargin,
    doc = "WARC -> CDX index rows (SURT urlkey, timestamp, mime, " +
      "status, digest, member spans) on gzip + plain carriages, with " +
      "an in-plan CDXJ round-trip") { (s, dir) =>
    import s.implicits._
    import graft.io.{Warc, WarcCdx}
    def resp(uri: String, date: String, body: String, ct: String,
        status: Int): Array[Byte] =
      Warc.encodeSyntheticHeaders(Seq((Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:uuid:$uri>",
        "WARC-Date" -> date,
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        Warc.httpResponse(status, "OK",
          Seq("Content-Type" -> s"$ct; charset=utf-8"),
          body.getBytes("UTF-8")))))
    val recs = Seq(
      resp("http://www.Example.COM:80/A/B?b=2&a=1&utm_x=9#frag",
        "2024-03-05T06:07:08Z", "<html><body><p>Hello</p></body></html>",
        "text/html", 200),
      Warc.encodeSyntheticHeaders(Seq((Seq(
        "WARC-Type" -> "request",
        "WARC-Record-ID" -> "<urn:uuid:req>",
        "WARC-Date" -> "2024-03-05T06:07:08Z",
        "WARC-Target-URI" -> "http://www.example.com/a/b",
        "Content-Type" -> "application/http; msgtype=request"),
        "GET /a/b HTTP/1.1\r\nHost: h\r\n\r\n".getBytes("ISO-8859-1")))),
      resp("https://sub.test.org:8443/X", "2024-03-05T06:07:09Z",
        "plain text here", "text/plain", 200))
    val assets = Seq((1L, Warc.gzipPerRecord(recs)),
      (2L, recs.reduce(_ ++ _)), (3L, Array[Byte](9, 9, 9)))
      .toDF("id", "bytes")
    val cdx = WarcCdx.extractCdx(assets, "id", "bytes")(s)
    // CDXJ round-trip INSIDE the plan: serialize each row, parse the
    // line back, compare the fields that survive the text form
    val lines = cdx.map(r => (r.asset_id, r.record_idx,
      WarcCdx.cdxjLine(r, "shard.warc.gz")))
      .toDF("l_asset", "l_idx", "line")
    val back = WarcCdx.parseCdxj(lines, "line")
    val cdxjOk = back.select(col("l_asset"), col("l_idx"),
      col("urlkey").as("p_urlkey"), col("timestamp").as("p_ts"),
      col("url").as("p_url"), col("mime").as("p_mime"),
      col("status").as("p_status"), col("digest").as("p_digest"),
      col("offset").as("p_offset"), col("length").as("p_length"))
    cdx.toDF.join(cdxjOk, col("asset_id") === col("l_asset") &&
        col("record_idx") === col("l_idx"))
      .select(col("asset_id"), col("record_idx"), col("urlkey"),
        col("timestamp"), col("url"), col("mime"), col("status"),
        col("warc_type"), col("digest").rlike("^[A-Z2-7]{32}$")
          .as("digest_ok"),
        // the request's empty entity body pins the payload digest
        // VALUE (SHA-1("") in base32 — a published constant); response
        // payloads are well-formed and differ from the block digest
        when(col("warc_type") === "request", col("payload_digest") ===
            "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
          .when(col("parsed"),
            col("payload_digest").rlike("^[A-Z2-7]{32}$") &&
              col("payload_digest") =!= col("digest"))
          .otherwise(col("payload_digest") === "")
          .as("payload_digest_ok"),
        col("parsed"), col("indexed"),
        (col("p_urlkey") === col("urlkey") &&
          col("p_ts") === col("timestamp") &&
          col("p_url") === col("url") && col("p_mime") === col("mime") &&
          col("p_status") === col("status") &&
          // the CDXJ digest field is the PAYLOAD digest (CC layout)
          col("p_digest") === col("payload_digest") &&
          col("p_offset") === col("offset") &&
          col("p_length") === col("length")).as("cdxj_ok"))
      .orderBy("asset_id", "record_idx")
  }

  /** CDX-driven HYDRATION gate (the consumption half of the Common
    * Crawl pattern): a `.warc.gz` on DISK → [[graft.io.WarcCdx
    * .extractCdxByPath]] (streaming index build over the path) → a
    * FILTER ON THE INDEX (`mime = 'text/html' AND status = 200` —
    * pruning which bytes ever move) → [[graft.io.WarcCdx
    * .hydrateByCdx]] ranged fetches of ONLY the two matching gzip
    * members → inflate → single-record parse → HTML title/text.
    * Oracle: exactly the 2 selected records' rows (the 404, the GIF
    * and the request never fetch — row count IS the pruning proof),
    * hand-derived urlkey/title/text literals, `digest_match` pinning
    * that the BLOCK digest RECOMPUTED from fetched bytes equals the
    * index's (end-to-end byte integrity across the fetch boundary),
    * `payload_match` pinning the same for the PAYLOAD digest — the
    * check that works against published Common Crawl indexes, whose
    * rows carry the payload digest — plus an out-of-range span as
    * the flagged refusal row.
    */
  val qWarcHydrate: QueryDef = QueryDef.sql(
    "q_warc_hydrate",
    """SELECT * FROM (VALUES
      |  (CAST(0 AS BIGINT), 'example,en)/page', 'http://en.example/page',
      |   200, 'text/html', 'Alpha', 'The quick start.', true, true, true),
      |  (CAST(4 AS BIGINT), 'example,de)/seite',
      |   'http://de.example/seite', 200, 'text/html', 'Beta',
      |   'Zweite Seite gut.', true, true, true),
      |  (CAST(99 AS BIGINT), '', '', -1, '', '', '', false, false,
      |   false))
      |  AS t(record_idx, urlkey, url, status, mime, title, text,
      |       digest_match, payload_match, hydrated)
      |ORDER BY record_idx""".stripMargin,
    doc = "CDX index on disk -> filter the index -> ranged-fetch ONLY " +
      "matching gzip members -> inflate + parse + HTML text, digest-" +
      "verified across the fetch") { (s, dir) =>
    import s.implicits._
    import graft.io.{Warc, WarcCdx}
    def html(uri: String, date: String, title: String, body: String)
        : Array[Byte] =
      Warc.encodeSyntheticHeaders(Seq((Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:uuid:$uri>",
        "WARC-Date" -> date,
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        Warc.httpResponse(200, "OK",
          Seq("Content-Type" -> "text/html; charset=utf-8"),
          (s"<html><head><title>$title</title></head><body><p>$body" +
            "</p></body></html>").getBytes("UTF-8")))))
    val notFound = Warc.encodeSyntheticHeaders(Seq((Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:gone>",
      "WARC-Date" -> "2024-03-05T06:07:10Z",
      "WARC-Target-URI" -> "http://en.example/gone",
      "Content-Type" -> "application/http; msgtype=response"),
      Warc.httpResponse(404, "Not Found",
        Seq("Content-Type" -> "text/html"),
        "<html><body>gone</body></html>".getBytes("UTF-8")))))
    val gif = Warc.encodeSyntheticHeaders(Seq((Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:gif>",
      "WARC-Date" -> "2024-03-05T06:07:11Z",
      "WARC-Target-URI" -> "http://en.example/logo.gif",
      "Content-Type" -> "application/http; msgtype=response"),
      Warc.httpResponse(200, "OK",
        Seq("Content-Type" -> "image/gif"),
        Array[Byte]('G', 'I', 'F', '8', '9', 'a', 1, 0, 1, 0)))))
    val request = Warc.encodeSyntheticHeaders(Seq((Seq(
      "WARC-Type" -> "request",
      "WARC-Record-ID" -> "<urn:uuid:req>",
      "WARC-Date" -> "2024-03-05T06:07:08Z",
      "WARC-Target-URI" -> "http://en.example/page",
      "Content-Type" -> "application/http; msgtype=request"),
      "GET /page HTTP/1.1\r\nHost: h\r\n\r\n".getBytes("ISO-8859-1"))))
    val gz = Warc.gzipPerRecord(Seq(
      html("http://en.example/page", "2024-03-05T06:07:08Z", "Alpha",
        "The quick start."),
      request, notFound, gif,
      html("http://de.example/seite", "2024-03-05T06:07:12Z", "Beta",
        "Zweite Seite gut.")))
    val tmp = java.nio.file.Files.createTempDirectory("warc_hydrate_gate")
    val shardPath = tmp.resolve("shard.warc.gz")
    java.nio.file.Files.write(shardPath, gz)
    val path = shardPath.toString
    val cdx = WarcCdx.extractCdxByPath(
      Seq((1L, path)).toDF("id", "path"), "id", "path")(s)
    // filter the INDEX; only matching members' bytes ever move
    val wanted = cdx.filter(r => r.parsed && r.mime == "text/html" &&
        r.status == 200)
      .toDF.withColumn("fpath", lit(path))
    val refusal = Seq((99L, path, 1L << 30, 10L))
      .toDF("record_idx", "fpath", "offset", "length")
    val hydrated = WarcCdx.hydrateByCdx(
      wanted.select(col("record_idx").cast("long").as("record_idx"),
        col("fpath"), col("offset"), col("length")).unionByName(refusal),
      "record_idx", "fpath", "offset", "length")(s)
    // digest integrity: the index's digest vs the digest recomputed
    // from the FETCHED bytes (left join: the refusal row has neither)
    val idxDigest = cdx.toDF.select(
      col("record_idx").cast("long").as("j_idx"),
      col("digest").as("idx_digest"),
      col("payload_digest").as("idx_payload"),
      col("urlkey").as("idx_urlkey"))
    hydrated.toDF.join(idxDigest, col("id") === col("j_idx"), "left")
      .select(col("id").as("record_idx"),
        coalesce(when(col("hydrated"), col("idx_urlkey")), lit(""))
          .as("urlkey"),
        col("url"), col("status"), col("mime"), col("title"), col("text"),
        coalesce(col("digest") === col("idx_digest") && col("hydrated"),
          lit(false)).as("digest_match"),
        coalesce(col("payload_digest") === col("idx_payload") &&
          col("hydrated"), lit(false)).as("payload_match"),
        col("hydrated"))
      .orderBy("record_idx")
  }

  /** WET sidecar gate ([[graft.io.WarcSidecars]] — the text-extract
    * shard Common Crawl publishes beside every archive): a synthetic
    * `.warc.gz` → `wetGz` → the engine's OWN CDX walk over the
    * emitted shard (round-trip: the sidecar is a well-formed
    * per-record-gzipped WARC) joined with the decoded record bodies.
    * Oracle: hand-derived rows — the warcinfo's exact warc-fields
    * body (deterministic by construction: content-addressed ids,
    * source-derived date), one conversion per 2xx HTML page with the
    * extracted text as its literal body, urlkeys of the ORIGINAL
    * pages, `text/plain` mime, and `digest_ok` pinning block =
    * payload digest (a conversion's content block IS its payload).
    * The gif and the request produce no conversion — the row count
    * IS the page-rule proof. */
  val qWarcWet: QueryDef = QueryDef.sql(
    "q_warc_wet",
    """SELECT * FROM (VALUES
      |  (0, 'warcinfo', 'application/warc-fields', '',
      |   'software: graft.WarcSidecars' || CHR(13) || CHR(10) ||
      |   'format: WARC File Format 1.0' || CHR(13) || CHR(10) ||
      |   'extractedFrom: shard.warc.gz' || CHR(13) || CHR(10),
      |   true, true),
      |  (1, 'conversion', 'text/plain', 'example,en)/page',
      |   'The quick start.', true, true),
      |  (2, 'conversion', 'text/plain', 'example,de)/seite',
      |   'Zweite Seite gut.', true, true))
      |  AS t(record_idx, warc_type, mime, urlkey, text, digest_ok,
      |       parsed)
      |ORDER BY record_idx""".stripMargin,
    doc = "WET sidecar generation: archive -> conversion records " +
      "with extracted text, round-tripped through the engine's own " +
      "CDX walk") { (s, dir) =>
    import s.implicits._
    import graft.io.{Warc, WarcCdx, WarcSidecars}
    val wet = WarcSidecars.wetGz(sidecarFixture, "shard.warc.gz").get
    val texts = Seq((1L, wet)).toDF("id", "bytes")
      .as[(Long, Array[Byte])]
      .flatMap { case (_, b) =>
        val u = Warc.gunzipAll(b).getOrElse(b)
        Warc.recordIndex(u).get.map(r => (r.recordIdx,
          new String(u, r.contentStart.toInt, r.contentLen.toInt,
            "UTF-8")))
      }.toDF("t_idx", "text")
    WarcCdx.extractCdx(Seq((1L, wet)).toDF("id", "bytes"),
        "id", "bytes")(s)
      .toDF.join(texts, col("record_idx") === col("t_idx"))
      .select(col("record_idx"), col("warc_type"), col("mime"),
        col("urlkey"), col("text"),
        (col("digest").rlike("^[A-Z2-7]{32}$") &&
          col("digest") === col("payload_digest")).as("digest_ok"),
        col("parsed"))
      .orderBy("record_idx")
  }

  /** WAT sidecar gate (the metadata-JSON shard): the same archive →
    * `watGz` → the shard walked by the engine and every envelope
    * parsed IN-PLAN with `from_json` (codegen'd — the emitted JSON
    * must be machine-readable, not merely string-shaped). Oracle:
    * one metadata record per SOURCE record with hand-derived HTTP
    * status/mime/title (the request has no HTTP metadata, the gif no
    * HTML metadata — nulls pin the envelope's conditional structure),
    * the container filename, and `offset_match` pinning that each
    * envelope's Container span equals the source CDX row's gzip-
    * member span — the WAT points back at the ranged-fetch unit. */
  val qWarcWat: QueryDef = QueryDef.sql(
    "q_warc_wat",
    """SELECT * FROM (VALUES
      |  (0, 'warcinfo', CAST(NULL AS INT), CAST(NULL AS VARCHAR),
      |   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), false),
      |  (1, 'metadata', 200, 'text/html', 'Alpha', 'shard.warc.gz',
      |   true),
      |  (2, 'metadata', NULL, NULL, NULL, 'shard.warc.gz', true),
      |  (3, 'metadata', 200, 'image/gif', NULL, 'shard.warc.gz', true),
      |  (4, 'metadata', 200, 'text/html', 'Beta', 'shard.warc.gz',
      |   true))
      |  AS t(record_idx, warc_type, status, mime, title, filename,
      |       offset_match)
      |ORDER BY record_idx""".stripMargin,
    doc = "WAT sidecar generation: archive -> metadata records whose " +
      "JSON envelopes parse in-plan and span back to the source's " +
      "gzip members") { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.types._
    import graft.io.{Warc, WarcCdx, WarcSidecars}
    val wat = WarcSidecars.watGz(sidecarFixture, "shard.warc.gz").get
    val bodies = Seq((1L, wat)).toDF("id", "bytes")
      .as[(Long, Array[Byte])]
      .flatMap { case (_, b) =>
        val u = Warc.gunzipAll(b).getOrElse(b)
        Warc.recordIndex(u).get.map(r => (r.recordIdx, r.warcType,
          new String(u, r.contentStart.toInt, r.contentLen.toInt,
            "UTF-8")))
      }.toDF("record_idx", "warc_type", "body")
    val httpSchema = StructType(Seq(
      StructField("Response-Message", StructType(Seq(
        StructField("Status", StringType)))),
      StructField("Content-Type", StringType),
      StructField("HTML-Metadata", StructType(Seq(
        StructField("Head", StructType(Seq(
          StructField("Title", StringType)))))))))
    val schema = StructType(Seq(
      StructField("Envelope", StructType(Seq(
        StructField("Payload-Metadata", StructType(Seq(
          StructField("Actual-Content-Type", StringType),
          StructField("HTTP-Response-Metadata", httpSchema))))))),
      StructField("Container", StructType(Seq(
        StructField("Filename", StringType),
        StructField("Offset", StringType),
        StructField("Length", StringType))))))
    val j = from_json(col("body"), schema)
    val http = j("Envelope")("Payload-Metadata")("HTTP-Response-Metadata")
    val parsed = bodies.select(col("record_idx"), col("warc_type"),
      http("Response-Message")("Status").try_cast("int").as("status"),
      http("Content-Type").as("mime"),
      http("HTML-Metadata")("Head")("Title").as("title"),
      j("Container")("Filename").as("filename"),
      j("Container")("Offset").try_cast("long").as("c_offset"))
    // each envelope's container span must point at the SOURCE
    // archive's gzip member — join against the source CDX rows
    val src = WarcCdx.extractCdx(
        Seq((1L, sidecarFixture)).toDF("id", "bytes"), "id", "bytes")(s)
      .toDF.select((col("record_idx") + 1).as("s_idx"),
        col("offset").as("s_offset"))
    parsed.join(src, col("record_idx") === col("s_idx"), "left")
      .select(col("record_idx"), col("warc_type"), col("status"),
        col("mime"), col("title"), col("filename"),
        coalesce(col("c_offset") === col("s_offset"), lit(false))
          .as("offset_match"))
      .orderBy("record_idx")
  }

  /** The shared WET/WAT gate fixture: two 2xx HTML pages, a request,
    * and a 2xx GIF — per-record-gzipped (the CC shape). Built once;
    * both gates and their oracles hand-derive from these literals. */
  private def sidecarFixture: Array[Byte] = {
    import graft.io.Warc
    def html(uri: String, date: String, title: String, body: String)
        : Array[Byte] =
      Warc.encodeSyntheticHeaders(Seq((Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:uuid:$uri>",
        "WARC-Date" -> date,
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        Warc.httpResponse(200, "OK",
          Seq("Content-Type" -> "text/html; charset=utf-8"),
          (s"<html><head><title>$title</title></head><body><p>$body" +
            "</p></body></html>").getBytes("UTF-8")))))
    Warc.gzipPerRecord(Seq(
      html("http://en.example/page", "2024-03-05T06:07:08Z", "Alpha",
        "The quick start."),
      Warc.encodeSyntheticHeaders(Seq((Seq(
        "WARC-Type" -> "request",
        "WARC-Record-ID" -> "<urn:uuid:req>",
        "WARC-Date" -> "2024-03-05T06:07:08Z",
        "WARC-Target-URI" -> "http://en.example/page",
        "Content-Type" -> "application/http; msgtype=request"),
        "GET /page HTTP/1.1\r\nHost: h\r\n\r\n".getBytes("ISO-8859-1")))),
      Warc.encodeSyntheticHeaders(Seq((Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> "<urn:uuid:gif>",
        "WARC-Date" -> "2024-03-05T06:07:11Z",
        "WARC-Target-URI" -> "http://en.example/logo.gif",
        "Content-Type" -> "application/http; msgtype=response"),
        Warc.httpResponse(200, "OK",
          Seq("Content-Type" -> "image/gif"),
          Array[Byte]('G', 'I', 'F', '8', '9', 'a', 1, 0, 1, 0))))),
      html("http://de.example/seite", "2024-03-05T06:07:12Z", "Beta",
        "Zweite Seite gut.")))
  }

  /** The robots gate fixtures. A: a named `graftbot` group (prefix,
    * nested allow, wildcard+anchor, catch-all allow) above a
    * disallow-everything `*` group; B: a foreign named group above a
    * `*` group graftbot falls back to; C: two same-agent groups that
    * must MERGE (RFC 9309 §2.2.1). Both gates and their oracles
    * hand-derive from these literals. */
  private val robotsFixtureA: String =
    """# policy for a.example
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/ok/
      |Disallow: /*.tmp$
      |Allow: /
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  private val robotsFixtureB: String =
    """User-agent: otherbot
      |Disallow: /
      |
      |USER-AGENT: *
      |ALLOW: /pub
      |disallow: /
      |""".stripMargin

  private val robotsFixtureC: String =
    "User-agent: graftbot\nDisallow: /a\n\n" +
      "User-agent: graftbot\nAllow: /a/b\n"

  /** robots.txt parse + group selection gate ([[graft.text.Robots]]):
    * three in-plan robots texts → [[graft.text.Robots.parseRules]] →
    * the rules governing crawler token `graftbot`. Oracle: the
    * hand-derived rule rows — A's named group beats its `*` group
    * (which never appears), B falls back to `*` (mixed-case keys
    * parse), C's two same-agent groups BOTH survive (merge), and each
    * row pins the translated RE2/Java regex and the pattern-length
    * priority the filter gate folds on. */
  val qRobotsRules: QueryDef = QueryDef.sql(
    "q_robots_rules",
    """SELECT * FROM (VALUES
      |  ('a.example', 0, 0, false, '/private/', '^/private/', 9),
      |  ('a.example', 0, 1, true, '/private/ok/', '^/private/ok/', 12),
      |  ('a.example', 0, 2, false, '/*.tmp$', '^/.*\.tmp$', 7),
      |  ('a.example', 0, 3, true, '/', '^/', 1),
      |  ('b.example', 1, 0, true, '/pub', '^/pub', 4),
      |  ('b.example', 1, 1, false, '/', '^/', 1),
      |  ('c.example', 0, 0, false, '/a', '^/a', 2),
      |  ('c.example', 1, 0, true, '/a/b', '^/a/b', 4))
      |  AS t(host, group_idx, rule_idx, allow, pattern, regex,
      |       priority)
      |ORDER BY host, group_idx, rule_idx""".stripMargin,
    doc = "robots.txt parsing + RFC 9309 group selection for a " +
      "crawler token (crawl-curation ops)") { (s, dir) =>
    import s.implicits._
    import graft.text.Robots
    Robots.rulesFor(
      Robots.parseRules(Seq(
        ("a.example", robotsFixtureA), ("b.example", robotsFixtureB),
        ("c.example", robotsFixtureC)).toDF("host", "txt"),
        "host", "txt")(s),
      "graftbot")
      .orderBy("host", "group_idx", "rule_idx")
  }

  /** Retroactive robots filtering gate
    * ([[graft.text.Robots.filterTargets]] — which archived URLs would
    * the policy have excluded for `graftbot`): a URL corpus derived
    * from `documents` (three hosts × six path shapes) against the A/B
    * fixtures, host `d.example` carrying no robots at all. Oracle:
    * the selected rules restated as VALUES, matched with the SAME
    * anchored regexes, longest-pattern-then-allow precedence via a
    * window — hosts without rules (or without matches) default to
    * allowed with a NULL matched pattern. Pins the wildcard+`$` rule
    * catching `.tmp` but not `.tmp.bak`, the nested allow overriding
    * its disallow prefix, and the `*`-group fallback host. */
  val qRobotsFilter: QueryDef = QueryDef.sql(
    "q_robots_filter",
    """WITH u AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'a.example'
      |         WHEN 1 THEN 'b.example' ELSE 'd.example' END AS host,
      |    CASE CAST((doc_id // 3) % 6 AS INT)
      |      WHEN 0 THEN '/index.html'
      |      WHEN 1 THEN '/private/doc' || CAST(doc_id AS VARCHAR)
      |      WHEN 2 THEN '/private/ok/x'
      |      WHEN 3 THEN '/files/a.tmp'
      |      WHEN 4 THEN '/files/a.tmp.bak'
      |      ELSE '/pub/data' END AS target
      |  FROM documents WHERE doc_id < 240),
      |r(host, allow, pattern, rx, prio) AS (VALUES
      |  ('a.example', false, '/private/', '^/private/', 9),
      |  ('a.example', true,  '/private/ok/', '^/private/ok/', 12),
      |  ('a.example', false, '/*.tmp$', '^/.*\.tmp$', 7),
      |  ('a.example', true,  '/', '^/', 1),
      |  ('b.example', true,  '/pub', '^/pub', 4),
      |  ('b.example', false, '/', '^/', 1)),
      |m AS (
      |  SELECT u.doc_id, r.allow, r.pattern,
      |    row_number() OVER (PARTITION BY u.doc_id
      |      ORDER BY r.prio DESC, r.allow DESC, r.pattern) AS rn
      |  FROM u JOIN r ON u.host = r.host
      |    AND regexp_matches(u.target, r.rx))
      |SELECT u.doc_id, u.host, u.target,
      |  coalesce(m.allow, true) AS allowed,
      |  m.pattern AS matched_pattern
      |FROM u LEFT JOIN m ON u.doc_id = m.doc_id AND m.rn = 1
      |ORDER BY u.doc_id""".stripMargin,
    doc = "retroactive robots.txt URL filtering: longest-match " +
      "verdict per URL, one row per URL (crawl-curation ops)") {
    (s, dir) =>
    import s.implicits._
    import graft.text.Robots
    val rules = Robots.parseRules(Seq(
      ("a.example", robotsFixtureA), ("b.example", robotsFixtureB))
      .toDF("host", "txt"), "host", "txt")(s)
    val host3 = (col("doc_id") % 3).cast("int")
    val shape = (expr("doc_id div 3") % 6).cast("int")
    val urls = t(s, dir, "documents").filter(col("doc_id") < 240)
      .select(col("doc_id"),
        when(host3 === 0, "a.example").when(host3 === 1, "b.example")
          .otherwise("d.example").as("host"),
        when(shape === 0, lit("/index.html"))
          .when(shape === 1,
            concat(lit("/private/doc"), col("doc_id").cast("string")))
          .when(shape === 2, lit("/private/ok/x"))
          .when(shape === 3, lit("/files/a.tmp"))
          .when(shape === 4, lit("/files/a.tmp.bak"))
          .otherwise(lit("/pub/data")).as("target"))
    Robots.filterTargets(urls, "host", "target", rules, "graftbot")
      .select(col("doc_id"), col("host"), col("target"),
        col("allowed"), col("matched_pattern"))
      .orderBy("doc_id")
  }

  /** The revisit gate fixture: crawl 1 holds page Alpha + page Other;
    * crawl 2 re-captures Alpha BYTE-IDENTICALLY (same payload, later
    * date) and adds page Beta. Per-record-gzipped, fixed dates. */
  private def revisitFixtures: (Array[Byte], Array[Byte]) = {
    import graft.io.Warc
    def page(uri: String, date: String, title: String, body: String)
        : Array[Byte] =
      Warc.encodeSyntheticHeaders(Seq((Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:uuid:$uri@$date>",
        "WARC-Date" -> date,
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        Warc.httpResponse(200, "OK",
          Seq("Content-Type" -> "text/html; charset=utf-8"),
          (s"<html><head><title>$title</title></head><body><p>$body" +
            "</p></body></html>").getBytes("UTF-8")))))
    // Alpha's body is big and poorly compressible so the revisit's
    // truncation beats its header growth even through gzip
    val filler = (1 to 300)
      .map(i => ((i * 2654435761L) % 100000).toString).mkString(" ")
    (Warc.gzipPerRecord(Seq(
      page("http://en.example/page", "2024-03-05T06:07:08Z", "Alpha",
        filler),
      page("http://en.example/other", "2024-03-05T06:07:09Z", "Other",
        "Unrelated."))),
      Warc.gzipPerRecord(Seq(
        page("http://en.example/page", "2024-03-12T06:07:08Z", "Alpha",
          filler),
        page("http://de.example/seite", "2024-03-12T06:07:09Z", "Beta",
          "Neue Seite."))))
  }

  /** WARC revisit dedup gate ([[graft.io.WarcRevisit]] — ISO 28500
    * §6.7.2, the archive-side payload dedup convention): two crawls
    * indexed in-plan → [[graft.io.WarcRevisit.revisitPlan]] →
    * crawl 2 REWRITTEN (its re-capture of Alpha becomes a revisit
    * record) → the rewritten archive walked by the engine's own CDX
    * pass → [[graft.io.WarcRevisit.resolveRevisits]] joins the
    * revisit back to crawl 1's capture. Oracle: hand-derived — the
    * re-capture surfaces as `revisit` with the ORIGINAL payload
    * digest declared (`payload_match` pins the revisit-aware CDX
    * digest convention), a shorter member (`truncated`), and a
    * resolution landing on crawl 1's member span (`offset_match`);
    * the new page passes through byte-identical and unresolved. */
  val qWarcRevisit: QueryDef = QueryDef.sql(
    "q_warc_revisit",
    """SELECT * FROM (VALUES
      |  (0, 'revisit', 'example,en)/page', true, true, true, true),
      |  (1, 'response', 'example,de)/seite', true, false, false,
      |   false))
      |  AS t(record_idx, warc_type, urlkey, payload_match, truncated,
      |       resolved, offset_match)
      |ORDER BY record_idx""".stripMargin,
    doc = "WARC revisit dedup: plan -> archive rewrite -> revisit-" +
      "aware CDX walk -> resolution to the original capture's span") {
    (s, dir) =>
    import s.implicits._
    import graft.io.{WarcCdx, WarcRevisit}
    val (a1, a2) = revisitFixtures
    val srcCdx = WarcCdx.extractCdx(
      Seq((1L, a1), (2L, a2)).toDF("id", "bytes"), "id", "bytes")(s)
      .toDF
    val plan = WarcRevisit.revisitPlan(srcCdx)
    val rewritten = WarcRevisit.rewriteRevisits(
      Seq((2L, a2, "b.warc.gz")).toDF("id", "bytes", "filename"),
      "id", "bytes", "filename", plan)(s)
    val walked = WarcCdx.extractCdx(
      rewritten.toDF.select(col("asset_id").as("id"), col("bytes")),
      "id", "bytes")(s).toDF
    val res = WarcRevisit.resolveRevisits(
      srcCdx.filter(col("asset_id") === 1).unionByName(walked))
      .select(col("record_idx").as("r_idx"), col("resolved"),
        col("refers_to_offset"))
    val origA1 = srcCdx.filter(col("asset_id") === 1 &&
      col("record_idx") === 0)
      .select(col("offset").as("a1_offset"))
    val origA2 = srcCdx.filter(col("asset_id") === 2)
      .select(col("record_idx").as("o_idx"),
        col("payload_digest").as("o_digest"),
        col("length").as("o_length"))
    walked.join(origA2, col("record_idx") === col("o_idx"))
      .join(res, col("record_idx") === col("r_idx"), "left")
      .crossJoin(broadcast(origA1))
      .select(col("record_idx"), col("warc_type"), col("urlkey"),
        (col("payload_digest") === col("o_digest"))
          .as("payload_match"),
        (col("length") < col("o_length")).as("truncated"),
        coalesce(col("resolved"), lit(false)).as("resolved"),
        coalesce(col("refers_to_offset") === col("a1_offset"),
          lit(false)).as("offset_match"))
      .orderBy("record_idx")
  }

  /** Link-extraction gate ([[graft.io.Warc.extractHtmlLinks]] — the
    * CC WAT `Links` list as rows): one in-plan page exercising every
    * carriage (a `<base href>` that redirects resolution, a
    * root-relative stylesheet link, absolute/relative/entity-bearing
    * anchors, an `img`), plus a link-free page proving silence.
    * Oracle: the hand-derived rows — document order, CC path labels,
    * raw entity-decoded hrefs, and RFC 3986 resolutions against the
    * base. */
  val qWarcLinks: QueryDef = QueryDef.sql(
    "q_warc_links",
    """SELECT * FROM (VALUES
      |  (0, 0, 'LINK@/href', '/css/site.css',
      |   'http://base.example/css/site.css'),
      |  (0, 1, 'A@/href', 'https://other.example/abs',
      |   'https://other.example/abs'),
      |  (0, 2, 'A@/href', '../up?a=1&b=2',
      |   'http://base.example/up?a=1&b=2'),
      |  (0, 3, 'IMG@/src', 'img/logo.png',
      |   'http://base.example/app/img/logo.png'))
      |  AS t(record_idx, link_idx, path, href, resolved)
      |ORDER BY record_idx, link_idx""".stripMargin,
    doc = "HTML outlink extraction with base-href resolution (the " +
      "CC WAT Links convention; crawl-graph ops)") { (s, dir) =>
    import s.implicits._
    import graft.io.Warc
    val html = "<html><head><base href=\"http://base.example/app/\">" +
      "<link rel=\"stylesheet\" href=\"/css/site.css\"></head><body>" +
      "<a href=\"https://other.example/abs\">x</a>" +
      "<a href=\"../up?a=1&amp;b=2\">y</a>" +
      "<img src=\"img/logo.png\"></body></html>"
    val b = Warc.encodeSynthetic(Seq(
      ("response", "http://en.example/dir/page",
        "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/html")), html.getBytes("UTF-8"))),
      ("response", "http://en.example/bare",
        "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/html")),
          "<html><body><p>no links</p></body></html>"
            .getBytes("UTF-8")))))
    Warc.extractHtmlLinks(Seq((1L, b)).toDF("id", "bytes"),
        "id", "bytes")(s)
      .toDF.filter(col("extracted"))
      .select(col("record_idx"), col("link_idx"), col("path"),
        col("href"), col("resolved"))
      .orderBy("record_idx", "link_idx")
  }

  /** Host-graph gate ([[graft.io.CrawlGraph.hostEdges]] — the
    * link-structure artifact behind domain-rank curation): a
    * two-page crawl whose links cross hosts, stay on-host, and
    * include a non-fetchable `mailto:` → canonical host edges with
    * counts. Oracle: the three hand-derived edges (the SHOUTED host
    * and explicit `:80` collapse into `en.example`, the self-loop
    * survives, the mailto drops). */
  val qCrawlHostgraph: QueryDef = QueryDef.sql(
    "q_crawl_hostgraph",
    """SELECT * FROM (VALUES
      |  ('de.example', 'other.example', 1),
      |  ('en.example', 'en.example', 1),
      |  ('en.example', 'other.example', 2))
      |  AS t(src_host, dst_host, n_links)
      |ORDER BY src_host, dst_host""".stripMargin,
    doc = "crawl host graph from extracted links: canonical hosts, " +
      "edge counts (crawl-graph ops)") { (s, dir) =>
    import s.implicits._
    import graft.io.{CrawlGraph, Warc}
    def page(uri: String, body: String) = Warc.encodeSynthetic(Seq(
      ("response", uri, "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/html")),
          s"<html><body>$body</body></html>".getBytes("UTF-8")))))
    val b1 = page("http://EN.example/a",
      "<a href=\"https://other.example/x\">1</a>" +
        "<a href=\"https://other.example/y\">2</a>" +
        "<a href=\"/local\">3</a>" +
        "<a href=\"mailto:a@b\">4</a>")
    val b2 = page("http://de.example:80/s",
      "<a href=\"https://other.example/z\">1</a>")
    val links = Warc.extractHtmlLinks(
      Seq((1L, b1), (2L, b2)).toDF("id", "bytes"), "id", "bytes")(s)
      .toDF.filter(col("extracted"))
    CrawlGraph.hostEdges(links)
      .select(col("src_host"), col("dst_host"),
        col("n_links").cast("int").as("n_links"))
      .orderBy("src_host", "dst_host")
  }

  /** The crawl → policy → retro-filter loop, end to end in one plan
    * ([[graft.io.Warc.extractRobots]] → [[graft.text.Robots]]): one
    * archive carries a host's `/robots.txt` capture (an ordinary 2xx
    * response record), a DECOY at `/foo/robots.txt` (just a file —
    * RFC 9309 §2.3 wants the root), and three pages; the policy is
    * parsed OUT OF THE CRAWL and applied back to the crawl's own
    * pages. Oracle: hand-derived verdicts — the en.example pages
    * split by the disallow prefix, the de.example page (no robots
    * captured) defaults to allowed with a NULL pattern, and the
    * decoy's disallow-everything never applies (its presence in the
    * row set would flip q_robots_crawl's en.example rows). */
  val qRobotsCrawl: QueryDef = QueryDef.sql(
    "q_robots_crawl",
    """SELECT * FROM (VALUES
      |  ('http://de.example/open', true, CAST(NULL AS VARCHAR)),
      |  ('http://en.example/private/doc', false, '/private/'),
      |  ('http://en.example/pub', true, '/'))
      |  AS t(url, allowed, matched_pattern)
      |ORDER BY url""".stripMargin,
    doc = "retroactive robots filtering from the crawl's own " +
      "robots.txt captures, end to end (crawl-curation ops)") {
    (s, dir) =>
    import s.implicits._
    import graft.io.Warc
    import graft.text.Robots
    def pg(uri: String, body: String) = Warc.encodeSynthetic(Seq(
      ("response", uri, "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/html")),
          s"<html><body><p>$body</p></body></html>"
            .getBytes("UTF-8")))))
    def txt(uri: String, body: String) = Warc.encodeSynthetic(Seq(
      ("response", uri, "application/http; msgtype=response",
        Warc.httpResponse(200, "OK",
          Seq(("Content-Type", "text/plain")),
          body.getBytes("UTF-8")))))
    val archive =
      txt("http://en.example/robots.txt",
        "User-agent: *\nDisallow: /private/\nAllow: /\n") ++
        txt("http://en.example/foo/robots.txt",
          "User-agent: *\nDisallow: /\n") ++
        pg("http://en.example/private/doc", "secret") ++
        pg("http://en.example/pub", "open") ++
        pg("http://de.example/open", "elsewhere")
    val df = Seq((1L, archive)).toDF("id", "bytes")
    val rules = Robots.parseRules(
      Warc.extractRobots(df, "id", "bytes")(s).toDF
        .filter(col("extracted")), "host", "txt")(s)
    Robots.filterUrls(
      Warc.extractHtmlPages(df, "id", "bytes")(s).toDF
        .filter(col("extracted"))
        .select(col("target_uri").as("url")),
      "url", rules, "graftbot")
      .select(col("url"), col("allowed"), col("matched_pattern"))
      .orderBy("url")
  }

  /** The sitemap gate fixtures: a default-namespace `urlset` (full
    * child set, an entity-bearing loc whose params the SURT key
    * sorts, a loc-less entry that must drop) and an `sm:`-prefixed
    * `sitemapindex`. */
  private val sitemapUrlset: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url><loc> https://en.example/a </loc>
      |    <lastmod>2024-03-01</lastmod><changefreq>daily</changefreq>
      |    <priority>0.8</priority></url>
      |  <url><loc>https://en.example/p?b=2&amp;a=1</loc></url>
      |  <url><lastmod>2024-01-01</lastmod></url>
      |</urlset>""".stripMargin

  private val sitemapIndex: String =
    """<sm:sitemapindex xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <sm:sitemap><sm:loc>https://en.example/sitemap1.xml.gz</sm:loc>
      |    <sm:lastmod>2024-02-02</sm:lastmod></sm:sitemap>
      |</sm:sitemapindex>""".stripMargin

  /** Sitemap parse gate ([[graft.io.Sitemaps.entries]] — the
    * sitemaps.org protocol robots `Sitemap:` lines point at): the
    * urlset and the ns-prefixed index in-plan. Oracle: hand-derived
    * rows — document order, whitespace-trimmed entity-decoded locs,
    * the loc-less entry DROPPED, absent children as empty strings,
    * and each loc's SURT urlkey (params sorted) — the join key the
    * coverage gate uses. */
  val qSitemapEntries: QueryDef = QueryDef.sql(
    "q_sitemap_entries",
    """SELECT * FROM (VALUES
      |  (1, 0, 'urlset', 'https://en.example/a', 'example,en)/a',
      |   '2024-03-01', 'daily', '0.8'),
      |  (1, 1, 'urlset', 'https://en.example/p?b=2&a=1',
      |   'example,en)/p?a=1&b=2', '', '', ''),
      |  (2, 0, 'sitemapindex', 'https://en.example/sitemap1.xml.gz',
      |   'example,en)/sitemap1.xml.gz', '2024-02-02', '', ''))
      |  AS t(asset_id, entry_idx, kind, loc, urlkey, lastmod,
      |       changefreq, priority)
      |ORDER BY asset_id, entry_idx""".stripMargin,
    doc = "sitemap urlset/sitemapindex parsing with SURT urlkeys " +
      "(crawl-curation ops)") { (s, dir) =>
    import s.implicits._
    import graft.io.Sitemaps
    Sitemaps.entries(Seq(
      (1L, sitemapUrlset.getBytes("UTF-8")),
      (2L, sitemapIndex.getBytes("UTF-8"))).toDF("id", "xml"),
      "id", "xml")(s)
      .toDF.filter(col("parsed"))
      .select(col("asset_id").cast("int").as("asset_id"),
        col("entry_idx"), col("kind"), col("loc"), col("urlkey"),
        col("lastmod"), col("changefreq"), col("priority"))
      .orderBy("asset_id", "entry_idx")
  }

  /** Coverage-audit gate ([[graft.io.Sitemaps.coverageAudit]] —
    * "which declared pages did the crawl capture?"): the urlset's
    * two locs against a CDX walk of an in-plan archive that captured
    * one of them TWICE and an undeclared page. Oracle: `/a` captured
    * with the EARLIEST 14-digit timestamp, the query-bearing loc
    * never captured (empty timestamp), one row per declared URL. */
  val qSitemapCoverage: QueryDef = QueryDef.sql(
    "q_sitemap_coverage",
    """SELECT * FROM (VALUES
      |  ('https://en.example/a', 'example,en)/a', true,
      |   '20240305060708'),
      |  ('https://en.example/p?b=2&a=1', 'example,en)/p?a=1&b=2',
      |   false, ''))
      |  AS t(loc, urlkey, captured, first_capture)
      |ORDER BY loc""".stripMargin,
    doc = "sitemap declared-vs-captured audit against the crawl's " +
      "CDX index (crawl-curation ops)") { (s, dir) =>
    import s.implicits._
    import graft.io.{Sitemaps, Warc, WarcCdx}
    def page(uri: String, date: String): Array[Byte] =
      Warc.encodeSyntheticHeaders(Seq((Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:uuid:$uri@$date>",
        "WARC-Date" -> date,
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        Warc.httpResponse(200, "OK",
          Seq("Content-Type" -> "text/html"),
          "<html><body><p>x</p></body></html>".getBytes("UTF-8")))))
    val archive = Warc.gzipPerRecord(Seq(
      page("https://en.example/a", "2024-03-05T06:07:08Z"),
      page("https://en.example/a", "2024-03-12T06:07:08Z"),
      page("https://en.example/other", "2024-03-05T06:07:09Z")))
    val cdx = WarcCdx.extractCdx(
      Seq((1L, archive)).toDF("id", "bytes"), "id", "bytes")(s).toDF
    val declared = Sitemaps.entries(
      Seq((1L, sitemapUrlset.getBytes("UTF-8"))).toDF("id", "xml"),
      "id", "xml")(s).toDF
    Sitemaps.coverageAudit(declared, cdx)
      .select(col("loc"), col("urlkey"), col("captured"),
        col("first_capture"))
      .orderBy("loc")
  }

  val all: Seq[QueryDef] = Seq(
    qWarcCdx, qWarcHydrate, qWarcWet, qWarcWat,
    qRobotsRules, qRobotsFilter, qWarcRevisit,
    qWarcLinks, qCrawlHostgraph, qRobotsCrawl,
    qSitemapEntries, qSitemapCoverage,
    qSpanFetch,
    qSubtitleCues, qWarcRecords, qWarcHtmlText, qTarIndex,
    qWebdatasetSamples, qGzipMembers, qWarcCurate, qTfrecordIndex,
    qZipIndex, qEpubText,
    qTextTokens, qTextQuality, qTextLangId, qTextFingerprint, qTokenFreq,
    qSelectPipeline, qPackSequences, qTextRedact, qCuratePipeline,
    qDecontaminate, qDecontaminateFuzzy, qTfidf, qQualityRules, qUrlDedup,
    qQualityRepetition, qChunkTokens, qSplitHash, qCorpusReport, qCurateV2,
    qVocabEncode, qTextUnigramNll, qTextBigramNll, qTextBm25, qDsirWeights,
    qQualityClassifier, qSourceEntropy, qSpanDupReport,
    qSpanRemove, qBpePairs, qShardBalanced, qCtfidf, qCorpusDivergence,
    qEditdistJoin, qLexicalDiversity, qJaroWinkler, qVocabCoverage,
    qOovRate, qZipf)

}
