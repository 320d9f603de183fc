package graft.text

/** SUBTITLE CUE EXTRACTION (SRT and WebVTT, public formats — WebVTT
  * is a W3C spec; SubRip's format is the de-facto standard every
  * player documents) — the text sidecar of a video corpus: paired
  * `.srt`/`.vtt` files carry the transcript a training pipeline
  * wants as ROWS (timed, ordered, per-asset), not as one opaque
  * blob. One parse turns a subtitle document into (cue_idx,
  * start_ms, end_ms, text) facts that feed the text operators —
  * quality scoring, dedup, language ID — and timeline analytics
  * (speech density, gap profiles) become plain aggregations.
  *
  * Format contracts:
  *  - SRT: blank-line-separated blocks of [counter, `HH:MM:SS,mmm
  *    --> HH:MM:SS,mmm`, text+]. Counters must be strictly
  *    increasing (real tools emit 1,2,3…; merged files may skip, so
  *    only monotonicity is required). Comma is the millisecond
  *    separator.
  *  - WebVTT: the `WEBVTT` magic line (optional BOM), then blocks;
  *    cue blocks are [optional identifier line, `HH:MM:SS.mmm -->
  *    HH:MM:SS.mmm` (hours optional; DOT separator) + optional cue
  *    settings, text+]. NOTE/STYLE/REGION blocks are skipped.
  *
  * Strictness (the sniff contract of the media family, applied to
  * text): ≥1 cue, every time line well-formed with start ≤ end,
  * SRT counters monotone, VTT magic exact. A malformed block refuses
  * the whole document (None) — subtitle files are small enough that
  * a half-parse is worse than a flagged row.
  */
object Subtitles {

  /** One cue: the text payload plus its timeline span. */
  final case class Cue(cueIdx: Int, startMs: Long, endMs: Long, text: String)

  private val SrtTime =
    """(\d{1,2}):(\d{2}):(\d{2}),(\d{3})\s*-->\s*(\d{1,2}):(\d{2}):(\d{2}),(\d{3})\s*""".r
  private val VttTimeLong =
    """(\d{1,4}):(\d{2}):(\d{2})\.(\d{3})\s*-->\s*(\d{1,4}):(\d{2}):(\d{2})\.(\d{3})(?:[ \t].*)?""".r
  private val VttTimeShort =
    """(\d{2}):(\d{2})\.(\d{3})\s*-->\s*(\d{2}):(\d{2})\.(\d{3})(?:[ \t].*)?""".r

  private def ms(h: String, m: String, s: String, f: String): Option[Long] = {
    val mm = m.toInt; val ss = s.toInt
    if (mm > 59 || ss > 59) None
    else Some(((h.toLong * 60 + mm) * 60 + ss) * 1000 + f.toInt)
  }

  private def stripBom(s: String): String =
    if (s.nonEmpty && s.charAt(0) == '\ufeff') s.substring(1) else s

  /** Split into blank-line-separated blocks of nonempty lines. */
  private def blocks(s: String): Vector[Vector[String]] = {
    val out = Vector.newBuilder[Vector[String]]
    var cur = Vector.newBuilder[String]
    var any = false
    s.split("\r\n|\n|\r", -1).foreach { line =>
      if (line.trim.isEmpty) {
        if (any) { out += cur.result(); cur = Vector.newBuilder; any = false }
      } else { cur += line; any = true }
    }
    if (any) out += cur.result()
    out.result()
  }

  /** SRT parse. None unless every block is [monotone counter, valid
    * time line, ≥1 text line] and ≥1 cue exists. */
  def parseSrt(raw: String): Option[IndexedSeq[Cue]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Cue]
    var lastCounter = 0L
    blocks(stripBom(raw)).foreach { b =>
      if (b.length < 3) return None
      val counter = b(0).trim
      if (!counter.forall(_.isDigit) || counter.isEmpty ||
          counter.length > 9) return None
      val c = counter.toLong
      if (c <= lastCounter) return None
      lastCounter = c
      val (s, e) = b(1).trim match {
        case SrtTime(h1, m1, s1, f1, h2, m2, s2, f2) =>
          (ms(h1, m1, s1, f1).getOrElse(return None),
            ms(h2, m2, s2, f2).getOrElse(return None))
        case _ => return None
      }
      if (s > e) return None
      out += Cue(out.length, s, e, b.drop(2).mkString("\n"))
    }
    if (out.isEmpty) None else Some(out.toIndexedSeq)
  }

  /** WebVTT parse. None unless the magic line is present and every
    * cue block carries a valid time line; NOTE/STYLE/REGION blocks
    * are skipped. */
  def parseVtt(raw: String): Option[IndexedSeq[Cue]] = {
    val s0 = stripBom(raw)
    val firstLine = s0.split("\r\n|\n|\r", 2)(0).trim
    if (firstLine != "WEBVTT" && !firstLine.startsWith("WEBVTT ") &&
        !firstLine.startsWith("WEBVTT\t")) return None
    val bs = blocks(s0)
    val out = scala.collection.mutable.ArrayBuffer.empty[Cue]
    def time(line: String): Option[(Long, Long)] = line match {
      case VttTimeLong(h1, m1, s1, f1, h2, m2, s2, f2) =>
        for (a <- ms(h1, m1, s1, f1); b <- ms(h2, m2, s2, f2)) yield (a, b)
      case VttTimeShort(m1, s1, f1, m2, s2, f2) =>
        for (a <- ms("0", m1, s1, f1); b <- ms("0", m2, s2, f2))
          yield (a, b)
      case _ => None
    }
    bs.zipWithIndex.foreach { case (b, bi) =>
      val head = b(0).trim
      if (bi == 0 && head.startsWith("WEBVTT")) {
        // the header block; any extra header lines are metadata
      } else if (head == "NOTE" || head.startsWith("NOTE ") ||
          head.startsWith("NOTE\t") || head == "STYLE" ||
          head == "REGION") {
        // comment/style/region blocks carry no cues — per spec the
        // keyword stands alone or (NOTE) is followed by whitespace;
        // a cue IDENTIFIER may legally start with these letters
        // ("NOTES-1") and must not be swallowed
      } else {
        // cue block: optional identifier line, then the time line
        val tIdx = if (b(0).contains("-->")) 0 else 1
        if (tIdx >= b.length) return None
        val (st, en) = time(b(tIdx).trim).getOrElse(return None)
        if (st > en) return None
        val text = b.drop(tIdx + 1).mkString("\n")
        if (text.isEmpty) return None
        out += Cue(out.length, st, en, text)
      }
    }
    if (out.isEmpty) None else Some(out.toIndexedSeq)
  }

  /** Format-sniffing parse: VTT by its magic, else SRT. Returns the
    * format tag with the cues. */
  def parse(raw: String): Option[(String, IndexedSeq[Cue])] = {
    val s = stripBom(raw)
    if (s.startsWith("WEBVTT")) parseVtt(raw).map(("vtt", _))
    else parseSrt(raw).map(("srt", _))
  }

  /** One extracted cue row; `parsed = false` flags the single
    * fallback row of a document that is neither valid SRT nor VTT. */
  final case class CueRow(asset_id: Long, cue_idx: Int, start_ms: Long,
      end_ms: Long, duration_ms: Long, format: String, text: String,
      parsed: Boolean)

  /** Cue extraction over a (id, document) corpus: one
    * format-sniffed parse per document ([[parse]]), cues out as rows
    * — the shape the text operators (quality, dedup, language ID)
    * and timeline aggregations consume. Runs as `mapPartitions`
    * (one iterator pass, the family's batch shape); unparseable
    * documents emit one flagged row, keeping the pipeline total.
    */
  def extractCues(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String)(implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[CueRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, raw) =>
          val parsed =
            try Option(raw).flatMap(parse)
            catch { case scala.util.control.NonFatal(_) => None }
          parsed match {
            case Some((fmt, cues)) => cues.iterator.map(c =>
              CueRow(id, c.cueIdx, c.startMs, c.endMs, c.endMs - c.startMs,
                fmt, c.text, parsed = true))
            case None =>
              Iterator.single(CueRow(id, -1, 0L, 0L, 0L, "", "",
                parsed = false))
          }
        }
      }
  }
}
