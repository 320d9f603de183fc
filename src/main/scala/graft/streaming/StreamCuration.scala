package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Curation.CurationConfig
import graft.text.{Decontaminate, TextAnalysis}

/** The corpus-curation flow ([[graft.pipeline.Curation]]) as a
  * STREAMING pipeline — documents curated as they arrive instead of in
  * a rebuild-the-world batch. Stage-by-stage translation:
  *
  *  - redact + quality filter → unchanged (pure per-row expressions,
  *    streaming-safe by construction)
  *  - exact text dedup        → `dropDuplicatesWithinWatermark` on the
  *    text fingerprint: state holds one entry per distinct fingerprint
  *    seen within the watermark horizon and is evicted past it —
  *    bounded state, where the batch keep-first-id groupBy would be an
  *    unbounded stateful agg
  *  - decontamination          → the per-row broadcast-set predicate
  *    ([[graft.text.Decontaminate.contaminationPredicate]]); the batch
  *    explode→join→groupBy→anti-join shape can't run over a stream
  *    (a stream cannot anti-join an aggregate of itself)
  *  - mixture sampling + packing → deliberately NOT here: both need a
  *    global view (per-language totals, cumulative token offsets) and
  *    belong to the batch snapshot step that closes a corpus, not the
  *    arrival path. Run [[graft.pipeline.Curation.curate]] on the
  *    landed table for those.
  *
  * Output: `(idCol, langCol, textCol, n_tokens)` append stream —
  * every surviving doc exactly once (checkpointed sink contract).
  *
  * 100 TB posture: every stage is per-row expression work except the
  * dedup, whose state is hash-partitioned by fingerprint across the
  * cluster and watermark-bounded; nothing global, nothing quadratic.
  */
object StreamCuration {

  /** Curate a streaming doc source. `docs` must carry `timeCol` (the
    * arrival/event timestamp driving the dedup watermark). The dedup
    * horizon is `watermarkDelay`: a duplicate arriving later than that
    * after its twin is NOT dropped — re-dedup at corpus close catches
    * stragglers (same contract as the reference's idempotent re-ingest,
    * `data_loader.py:173-177`).
    */
  def curateStream(docs: DataFrame, cfg: CurationConfig, timeCol: String,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val redacted =
      if (cfg.redact)
        docs.withColumn(cfg.textCol, TextAnalysis.redactPii(col(cfg.textCol)))
      else docs
    val scored = redacted
      .filter(round(TextAnalysis.qualityScore(col(cfg.textCol)), 6)
        >= cfg.minQuality)
    val deduped =
      if (cfg.dedupe)
        scored
          .withColumn("__fp", TextAnalysis.fingerprint(col(cfg.textCol)))
          .withWatermark(timeCol, watermarkDelay)
          .dropDuplicatesWithinWatermark("__fp")
          .drop("__fp")
      else scored
    val clean = cfg.evalSet match {
      case Some(ev) => deduped.filter(
        // size-routed: exact broadcast set for benchmark-suite-sized
        // eval corpora, bloom (no-false-negative) above 10M grams
        !Decontaminate.contaminationPredicateAuto(ev, cfg.textCol,
          cfg.decontaminateN))
      case None => deduped
    }
    clean.select(col(cfg.idCol), col(cfg.langCol), col(cfg.textCol),
      TextAnalysis.tokenCount(col(cfg.textCol)).cast("long").as("n_tokens"))
  }
}
