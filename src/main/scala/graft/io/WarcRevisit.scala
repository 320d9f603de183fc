package graft.io

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WARC `revisit` records (ISO 28500 §6.7.2) — the archive-side
  * payload dedup convention: when a crawler re-fetches a page and the
  * payload digest matches an earlier capture, the archive stores a
  * `revisit` record (profile `…/revisit/identical-payload-digest`)
  * carrying the HTTP headers but NOT the payload, pointing back at
  * the original via `WARC-Refers-To-Target-URI`/`-Date` — at crawl
  * scale most of a weekly snapshot is unchanged, so this is where
  * most of the bytes go away.
  *
  * Three operators, all index-driven (the corpus-wide artifact is the
  * CDX DataFrame; archives are only touched per-asset):
  *  - [[revisitPlan]]: rank every response capture per payload digest
  *    (per-URL by default, the crawler convention; digest-global
  *    optional) — earliest wins, later ones become revisit
  *    candidates with their refers-to facts. ONE shuffle, on the
  *    dedup key.
  *  - [[rewriteRevisits]]: rewrite archives, converting planned
  *    duplicate responses to revisit records (headers kept in their
  *    original order and carriage; content truncated to the HTTP
  *    head; block digest recomputed over the truncated block; the
  *    ORIGINAL payload digest declared — the field wayback-style
  *    consumers join on).
  *  - [[resolveRevisits]]: the consumer side — join revisit rows of
  *    ANY deduped crawl (ours or an external one) back to the
  *    nearest-earlier matching capture's container span, so a
  *    hydration pass can fetch original payloads.
  *
  * Scale posture: the plan and resolution are pure DataFrame plans
  * over the index (never the archives); the rewrite is a per-asset
  * mapPartitions walker with the flagged-row fallback. Revisit dates
  * reconstruct from the CDX 14-digit timestamp (second resolution —
  * sub-second precision of the original `WARC-Date` is not carried,
  * documented).
  */
object WarcRevisit {

  /** The ISO 28500 §6.7.2 profile URI for payload-identical dedup. */
  val IdenticalPayloadProfile: String =
    "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"

  private def isoFromTimestamp14(ts: Column): Column =
    concat(substring(ts, 1, 4), lit("-"), substring(ts, 5, 2),
      lit("-"), substring(ts, 7, 2), lit("T"), substring(ts, 9, 2),
      lit(":"), substring(ts, 11, 2), lit(":"), substring(ts, 13, 2),
      lit("Z"))

  /** The dedup plan over a CDX DataFrame ([[WarcCdx.extractCdx]]
    * schema): parsed response rows ranked within their dedup key —
    * `(urlkey, payload_digest)` when `perUrl` (the crawler default:
    * a page only revisits ITS OWN earlier captures), bare
    * `payload_digest` otherwise (cross-URL dedup; mind that all
    * empty-payload responses share one digest) — ordered by capture
    * time, then `(asset_id, offset)` for determinism. Row 1 is
    * `canonical`; every later row carries the canonical's url, span
    * and second-resolution ISO date as its refers-to facts. */
  def revisitPlan(cdx: DataFrame, perUrl: Boolean = true): DataFrame = {
    val keys: Seq[Column] =
      if (perUrl) Seq(col("urlkey"), col("payload_digest"))
      else Seq(col("payload_digest"))
    val w = Window.partitionBy(keys: _*)
      .orderBy(col("timestamp"), col("asset_id"), col("offset"))
    cdx.filter(col("parsed") && col("warc_type") === "response" &&
        col("payload_digest") =!= "")
      .select(col("asset_id"), col("record_idx"), col("urlkey"),
        col("timestamp"), col("url"), col("payload_digest"),
        col("offset"), col("length"))
      .withColumn("canonical", row_number().over(w) === 1)
      .withColumn("refers_to_asset", first(col("asset_id")).over(w))
      .withColumn("refers_to_offset", first(col("offset")).over(w))
      .withColumn("refers_to_length", first(col("length")).over(w))
      .withColumn("refers_to_url", first(col("url")).over(w))
      .withColumn("refers_to_date",
        isoFromTimestamp14(first(col("timestamp")).over(w)))
  }

  /** One planned duplicate, as the rewrite needs it. */
  final case class DupRef(record_idx: Int, refers_to_url: String,
      refers_to_date: String)

  /** One rewritten archive; `ok = false` flags an unwalkable asset. */
  final case class RevisitRewrite(asset_id: Long, filename: String,
      bytes: Array[Byte], n_revisits: Int, ok: Boolean)

  /** Rebuild ONE record as a revisit. None when the record has no
    * parsed HTTP head (nothing to truncate at) — it stays as-is. */
  private def revisitRecord(u: Array[Byte], r: Warc.WarcRecord,
      d: DupRef): Option[Array[Byte]] = {
    if (r.bodyStart < 0) return None
    val (hs, _) = WarcSidecars.recordHeaders(u, r.byteStart.toInt)
      .getOrElse(return None)
    val head = java.util.Arrays.copyOfRange(u, r.contentStart.toInt,
      r.bodyStart.toInt)
    val payloadDigest = WarcCdx.parseSingleRecord(u, r.byteStart.toInt,
      (r.byteStart + r.byteLen).toInt).map(_.payloadDigest)
      .getOrElse(return None)
    var sawPayloadDigest = false
    val rewritten = hs.flatMap {
      case (k, _) if k.equalsIgnoreCase("Content-Length") =>
        None // the encoder re-appends it for the truncated block
      case (k, _) if k.equalsIgnoreCase("WARC-Type") =>
        Some(k -> "revisit")
      case (k, _) if k.equalsIgnoreCase("WARC-Block-Digest") =>
        Some(k -> s"sha1:${WarcCdx.sha1Base32(head, 0, head.length)}")
      case (k, _) if k.equalsIgnoreCase("WARC-Payload-Digest") =>
        sawPayloadDigest = true
        Some(k -> s"sha1:$payloadDigest") // the ORIGINAL payload's
      case kv => Some(kv)
    } ++ (if (sawPayloadDigest) Seq.empty
          else Seq("WARC-Payload-Digest" -> s"sha1:$payloadDigest")) ++
      Seq("WARC-Profile" -> IdenticalPayloadProfile,
        "WARC-Refers-To-Target-URI" -> d.refers_to_url,
        "WARC-Refers-To-Date" -> d.refers_to_date,
        "WARC-Truncated" -> "length")
    Some(Warc.encodeSyntheticHeaders(Seq((rewritten, head))))
  }

  private def rewrite(archive: Array[Byte], dups: Seq[DupRef])
      : Option[(Array[Byte], Int)] = {
    val byIdx = dups.map(d => d.record_idx -> d).toMap
    val isGz = archive.length >= 2 && (archive(0) & 0xff) == 0x1f &&
      (archive(1) & 0xff) == 0x8b
    val u = (if (isGz) Warc.gunzipAll(archive) else Some(archive))
      .getOrElse(return None)
    val recs = Warc.recordIndex(u).getOrElse(return None)
    var n = 0
    val out = recs.map { r =>
      byIdx.get(r.recordIdx) match {
        case Some(d) if r.warcType == "response" =>
          revisitRecord(u, r, d) match {
            case Some(b) => n += 1; b
            case None => java.util.Arrays.copyOfRange(u,
              r.byteStart.toInt, (r.byteStart + r.byteLen).toInt)
          }
        case _ => java.util.Arrays.copyOfRange(u, r.byteStart.toInt,
          (r.byteStart + r.byteLen).toInt)
      }
    }
    // gzip sources re-emit per-record-gzipped (the CC shape — also
    // normalizes multi-record members); plain stays plain
    Some((if (isGz) Warc.gzipPerRecord(out)
          else out.reduce(_ ++ _), n))
  }

  /** Archive rewrite over an (id, bytes, filename) corpus: planned
    * duplicates ([[revisitPlan]] rows with `canonical = false`)
    * become revisit records; everything else passes through
    * byte-identical (records re-member per-record for gzip sources).
    * The plan joins in by asset id — each task sees only ITS
    * archive's duplicate list. Unwalkable assets flag, never kill.
    * This is the BYTE seam (one archive stages per task, like
    * [[WarcSidecars.extractSidecars]]); a path-to-path streaming
    * rewrite for archives too large to stage is future work —
    * unlike the read-side twins it must also WRITE a file per
    * asset, a different sink contract. */
  def rewriteRevisits(df: DataFrame, idCol: String, bytesCol: String,
      filenameCol: String, plan: DataFrame)(
      implicit spark: SparkSession): Dataset[RevisitRewrite] = {
    import spark.implicits._
    val dups = plan.filter(!col("canonical"))
      .select(col("asset_id").as("p_asset"),
        struct(col("record_idx"), col("refers_to_url"),
          col("refers_to_date")).as("p_dup"))
      .groupBy(col("p_asset"))
      .agg(collect_list(col("p_dup")).as("p_dups"))
    df.select(col(idCol).cast("long").as("a_id"), col(bytesCol),
        col(filenameCol).cast("string"))
      .join(dups, col("a_id") === col("p_asset"), "left")
      .select(col("a_id"), col(bytesCol), col(filenameCol),
        col("p_dups"))
      .as[(Long, Array[Byte], String, Option[Seq[DupRef]])]
      .mapPartitions(_.map { case (id, bytes, filename, dsOpt) =>
        val ds = dsOpt.getOrElse(Seq.empty)
        val built =
          try Option(bytes).flatMap(rewrite(_, ds))
          catch { case scala.util.control.NonFatal(_) => None }
        built match {
          case Some((b, n)) => RevisitRewrite(id, filename, b, n,
            ok = true)
          case None => RevisitRewrite(id, filename, Array.empty[Byte],
            0, ok = false)
        }
      })
  }

  /** Resolution for CONSUMING a deduped crawl: every parsed revisit
    * row joins to the nearest-earlier response capture sharing its
    * `(urlkey, payload_digest)` (equi-keyed shuffle join; the time
    * inequality filters inside it) — `resolved = false` when the
    * original is not in the index (its archive wasn't walked).
    * Output keeps the revisit's identity plus the original's
    * container coordinates, ready for a ranged-fetch hydration. */
  def resolveRevisits(cdx: DataFrame): DataFrame = {
    val rev = cdx.filter(col("parsed") && col("warc_type") === "revisit")
      .select(col("asset_id"), col("record_idx"), col("urlkey"),
        col("timestamp"), col("url"), col("payload_digest"))
    val orig = cdx
      .filter(col("parsed") && col("warc_type") === "response")
      .select(col("urlkey").as("o_urlkey"),
        col("timestamp").as("o_timestamp"),
        col("payload_digest").as("o_digest"),
        col("asset_id").as("refers_to_asset"),
        col("record_idx").as("refers_to_record"),
        col("offset").as("refers_to_offset"),
        col("length").as("refers_to_length"))
    val w = Window.partitionBy(col("asset_id"), col("record_idx"))
      .orderBy(col("o_timestamp").desc, col("refers_to_asset"),
        col("refers_to_offset"))
    rev.join(orig, col("urlkey") === col("o_urlkey") &&
        col("payload_digest") === col("o_digest") &&
        col("o_timestamp") <= col("timestamp"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("asset_id"), col("record_idx"), col("urlkey"),
        col("timestamp"), col("url"), col("payload_digest"),
        col("refers_to_asset").isNotNull.as("resolved"),
        col("refers_to_asset"), col("refers_to_record"),
        col("refers_to_offset"), col("refers_to_length"))
  }
}
