package graft.multimodal

import H264AnnexB.FrameSpan

/** Matroska / WebM container indexing — EBML per RFC 8794 + the
  * public Matroska element registry (matroska.org; WebM is the
  * Matroska subset). Real open-video corpora are predominantly
  * `.webm`/`.mkv`; this walks the EBML tree
  * (`Segment` → `Tracks`/`Cluster` → `SimpleBlock`/`BlockGroup`) down
  * to the block level and emits the same [[H264AnnexB.FrameSpan]]
  * shape as the MP4 family: per-frame absolute byte ranges with
  * keyframe flags, no codec parsing — the external-decoder seam's
  * access pattern.
  *
  * Semantics:
  *  - Only the FIRST video track's (`TrackType == 1`) blocks are
  *    indexed (one frame stream per asset, like [[Mp4Index]]); other
  *    tracks' blocks are skipped by their block-header track number.
  *  - `SimpleBlock` keyframe = its flags bit 0x80; `BlockGroup`
  *    keyframe = the group carries NO `ReferenceBlock` (Matroska's
  *    "no references ⇒ independently decodable" contract).
  *  - All three lacing modes (Xiph, fixed, EBML) are expanded so a
  *    laced block yields one span per laced frame — byte-exact.
  *  - Codec extradata (`CodecPrivate` — e.g. the avcC/hvcC record for
  *    AVC/HEVC-in-Matroska) is exposed by range via [[videoTrack]],
  *    the decoder seam's to re-read, like `stsd` in MP4.
  *
  * Strictness (the sniff contract of the family): the first element
  * must be the EBML header (0x1A45DFA3 — no other container starts
  * with those bytes); every element walk must tile its parent
  * EXACTLY; unknown-size (all-VINT-ones) is honored only for
  * `Segment` as the LAST top-level element — the streaming shape real
  * muxers emit — and refused anywhere else (a malformed child must
  * not swallow its siblings, the [[Mp4Index.boxes]] rule). Anything
  * else is None, never a half-parse.
  */
object MkvIndex {

  // EBML / Matroska element IDs, as stored (marker bit included)
  private val EbmlHeader = 0x1A45DFA3L
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val TrackNumber = 0xD7L
  private val TrackType = 0x83L
  private val CodecId = 0x86L
  private val CodecPrivate = 0x63A2L
  private val Cluster = 0x1F43B675L
  private val SimpleBlock = 0xA3L
  private val BlockGroup = 0xA0L
  private val Block = 0xA1L
  private val ReferenceBlock = 0xFBL
  private val AudioEl = 0xE1L
  private val SamplingFrequency = 0xB5L
  private val Channels = 0x9FL
  private val BitDepth = 0x6264L
  private val TimestampScale = 0x2AD7B1L
  private val Duration = 0x4489L
  private val Attachments = 0x1941A469L
  private val AttachedFile = 0x61A7L
  private val FileName = 0x466EL
  private val FileMimeType = 0x4660L
  private val FileData = 0x465CL
  private val FileUID = 0x46AEL
  private val FileDescription = 0x467EL
  private val CrcEl = 0xBFL
  private val VoidEl = 0xECL
  private val Chapters = 0x1043A770L
  private val EditionEntry = 0x45B9L
  private val ChapterAtom = 0xB6L
  private val ChapterUID = 0x73C4L
  private val ChapterTimeStart = 0x91L
  private val ChapterTimeEnd = 0x92L
  private val ChapterDisplay = 0x80L
  private val ChapString = 0x85L
  private val ChapLanguage = 0x437CL
  private val TagsEl = 0x1254C367L
  private val TagEl = 0x7373L
  private val TargetsEl = 0x63C0L
  private val TargetTypeValue = 0x68CAL
  private val TagTrackUID = 0x63C5L
  private val SimpleTagEl = 0x67C8L
  private val TagName = 0x45A3L
  private val TagString = 0x4487L
  private val TagBinary = 0x4485L
  private val TagLanguage = 0x447AL

  /** One parsed element: id (as stored), payload range, own first
    * byte. */
  final case class El(id: Long, payloadStart: Int, payloadEnd: Int,
      hdrStart: Int)

  /** A VINT at `i`: (value, width). Element IDs keep the marker bit
    * (the registry's convention); sizes strip it. None on a zero lead
    * byte (width > 8), width over `maxW`, or out-of-bounds bytes.
    */
  private def readVint(b: Array[Byte], i: Int, maxW: Int,
      keepMarker: Boolean): Option[(Long, Int)] = {
    if (i >= b.length) return None
    val b0 = b(i) & 0xff
    if (b0 == 0) return None
    val w = Integer.numberOfLeadingZeros(b0) - 23 // 1..8
    if (w > maxW || i + w > b.length) return None
    var v = if (keepMarker) b0.toLong else (b0 & (0xff >>> w)).toLong
    var j = 1
    while (j < w) {
      v = (v << 8) | (b(i + j) & 0xff)
      j += 1
    }
    Some((v, w))
  }

  /** Size VINT with all value bits set = "unknown size" (RFC 8794
    * §6). */
  private def isUnknownSize(v: Long, w: Int): Boolean =
    v == (1L << (7 * w)) - 1

  /** Walk one element level [start, end). Must tile EXACTLY; an
    * unknown-size element is honored only when `topLevel` and the id
    * is `Segment` (it then runs to `end` and must be last).
    */
  def elements(b: Array[Byte], start: Int, end: Int,
      topLevel: Boolean = false): Option[IndexedSeq[El]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[El]
    var i = start
    while (i < end) {
      val (id, idW) = readVint(b, i, 4, keepMarker = true)
        .getOrElse(return None)
      val (size, szW) = readVint(b, i + idW, 8, keepMarker = false)
        .getOrElse(return None)
      val payloadStart = i + idW + szW
      if (isUnknownSize(size, szW)) {
        if (!topLevel || id != Segment) return None
        out += El(id, payloadStart, end, i)
        return Some(out.toIndexedSeq) // unknown size: runs to the end
      }
      if (size > end - payloadStart) return None
      out += El(id, payloadStart, (payloadStart + size).toInt, i)
      i = (payloadStart + size).toInt
    }
    Some(out.toIndexedSeq)
  }

  private def uint(b: Array[Byte], el: El): Long = {
    var v = 0L
    var i = el.payloadStart
    while (i < el.payloadEnd) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  /** The selected video track: block-header track number, CodecID
    * string, and the CodecPrivate payload range (the out-of-band
    * extradata — avcC/hvcC for AVC/HEVC-in-Matroska). */
  final case class VideoTrack(trackNumber: Long, codecId: String,
      codecPrivate: Option[(Int, Int)])

  private def segmentKids(b: Array[Byte]): Option[IndexedSeq[El]] = {
    val top = elements(b, 0, b.length, topLevel = true)
      .getOrElse(return None)
    if (top.isEmpty || top.head.id != EbmlHeader) return None
    // the EBML header must parse as an element level too (DocType etc.)
    if (elements(b, top.head.payloadStart, top.head.payloadEnd).isEmpty)
      return None
    top.find(_.id == Segment)
      .flatMap(seg => elements(b, seg.payloadStart, seg.payloadEnd))
  }

  /** The first TrackType==1 (video) entry in `Tracks` — None when the
    * file declares no video track (an audio-only WebM must not emit
    * frames). */
  def videoTrack(b: Array[Byte]): Option[VideoTrack] =
    segmentKids(b).flatMap { kids =>
      kids.filter(_.id == Tracks).iterator
        .flatMap(t => videoTrackInTracks(b, t.payloadStart, t.payloadEnd))
        .nextOption()
    }

  /** One subtitle cue: 1-based track number, start/duration in
    * TICKS of the segment's TimestampScale (scale 10⁶ ns ⇒ ticks are
    * milliseconds — the WebM default), and the cue text's byte span
    * (S_TEXT/UTF8 payload = the raw UTF-8 cue text). */
  final case class SubtitleCue(trackNumber: Long, startTicks: Long,
      durTicks: Long, byteStart: Int, byteLen: Int)

  /** The subtitle cues of the FIRST TrackType==0x11 (subtitle) track:
    * cluster Timestamp + the block's signed 16-bit relative timestamp
    * give the start; `BlockDuration` (BlockGroup carriage — the shape
    * muxers use for subtitles, which NEED durations) gives the
    * length, −1 when absent (SimpleBlock carriage). Returns
    * (timestampScale, codecId, cues); None when the bytes are not
    * conforming Matroska, Some((_, "", empty)) for a valid file with
    * no subtitle track — the [[audioTracks]] posture. Text spans are
    * byte ranges into `b` (S_TEXT/UTF8 and S_TEXT/ASS alike carry
    * UTF-8 bytes — but the ASS payload embeds 8 dialogue metadata
    * fields before the text; [[assDialogueText]] is the strip the
    * text seam applies, keyed on the returned codecId). */
  def subtitleCues(b: Array[Byte])
      : Option[(Long, String, Seq[SubtitleCue])] = {
    val kids = segmentKids(b).getOrElse(return None)
    var track = -1L
    var codec = ""
    kids.filter(_.id == Tracks).foreach { t =>
      val entries = elements(b, t.payloadStart, t.payloadEnd)
        .getOrElse(return None)
      entries.filter(_.id == TrackEntry).foreach { entry =>
        val fields = elements(b, entry.payloadStart, entry.payloadEnd)
          .getOrElse(return None)
        val isSub = fields.find(_.id == TrackType)
          .exists(uint(b, _) == 0x11L)
        // only TEXT subtitle codecs: a bitmap track (S_VOBSUB,
        // S_HDMV/PGS) must neither decode as garbage "text" nor
        // shadow a later genuine S_TEXT track
        val codecId = fields.find(_.id == CodecId)
          .map(e => new String(b, e.payloadStart,
            e.payloadEnd - e.payloadStart, "UTF-8"))
        val isText = codecId.exists(_.startsWith("S_TEXT"))
        val num = fields.find(_.id == TrackNumber).map(uint(b, _))
        if (isSub && isText && num.isDefined && track < 0) {
          track = num.get
          codec = codecId.get
        }
      }
    }
    // a corrupt Info payload must REFUSE (the family's no-half-parse
    // rule): the default scale on a file that DECLARED one would emit
    // silently mis-scaled timestamps
    val scale = kids.filter(_.id == Info).iterator.map { info =>
      elements(b, info.payloadStart, info.payloadEnd)
        .getOrElse(return None)
        .find(_.id == TimestampScale).map(uint(b, _))
    }.flatten.nextOption().getOrElse(1000000L)
    if (track < 0) return Some((scale, "", Seq.empty))
    val out = scala.collection.mutable.ArrayBuffer.empty[SubtitleCue]
    // one UNLACED block's (relative ts, text span) for our track;
    // None = malformed, Some(None) = other track (skip)
    def blockCue(el: El): Option[Option[(Int, (Int, Int))]] = {
      val (tn, tw) = readVint(b, el.payloadStart, 8, keepMarker = false)
        .getOrElse(return None)
      val i = el.payloadStart + tw
      if (i + 3 > el.payloadEnd) return None
      if (tn != track) return Some(None)
      val rel = ((b(i) << 8) | (b(i + 1) & 0xff)).toShort.toInt
      val flags = b(i + 2) & 0xff
      // subtitle blocks are UNLACED text; a laced subtitle block is
      // out of contract for this walk — refuse rather than misparse
      if (((flags >> 1) & 0x03) != 0) return None
      Some(Some((rel, (i + 3, el.payloadEnd - (i + 3)))))
    }
    kids.filter(_.id == Cluster).foreach { cl =>
      val ckids = elements(b, cl.payloadStart, cl.payloadEnd)
        .getOrElse(return None)
      val clusterTs = ckids.find(_.id == 0xE7L).map(uint(b, _))
        .getOrElse(0L)
      ckids.foreach { el =>
        if (el.id == SimpleBlock) {
          blockCue(el).getOrElse(return None).foreach {
            case (rel, (s, l)) =>
              out += SubtitleCue(track, clusterTs + rel, -1L, s, l)
          }
        } else if (el.id == BlockGroup) {
          val gk = elements(b, el.payloadStart, el.payloadEnd)
            .getOrElse(return None)
          val dur = gk.find(_.id == 0x9BL).map(uint(b, _)).getOrElse(-1L)
          gk.filter(_.id == Block).foreach { blk =>
            blockCue(blk).getOrElse(return None).foreach {
              case (rel, (s, l)) =>
                out += SubtitleCue(track, clusterTs + rel, dur, s, l)
            }
          }
        }
      }
    }
    Some((scale, codec, out.toSeq))
  }

  /** The dialogue TEXT of one S_TEXT/ASS (or SSA) block payload.
    *
    * The Matroska codec mapping stores each cue as the ASS
    * `Dialogue:` line MINUS the Start/End fields, i.e.
    * `ReadOrder,Layer,Style,Name,MarginL,MarginR,MarginV,Effect,Text`
    * — 8 comma-delimited metadata fields before the text (which may
    * itself contain commas, so ONLY the first 8 split). Emitting the
    * raw payload would prefix every training-text row with
    * `0,0,Default,,0,0,0,,`. The ASS escapes decode too: `\N` (hard
    * line break) and `\n` (soft break) to a newline, `\h` (hard
    * space) to a space. A payload with fewer than 8 commas is out of
    * mapping — returned whole (escape-decoded), keeping the walk
    * total rather than guessing at field boundaries. */
  def assDialogueText(payload: String): String = {
    var i = 0
    var commas = 0
    while (i < payload.length && commas < 8) {
      if (payload.charAt(i) == ',') commas += 1
      i += 1
    }
    val raw = if (commas == 8) payload.substring(i) else payload
    val sb = new java.lang.StringBuilder(raw.length)
    var j = 0
    while (j < raw.length) {
      val c = raw.charAt(j)
      if (c == '\\' && j + 1 < raw.length) {
        raw.charAt(j + 1) match {
          case 'N' | 'n' => sb.append('\n'); j += 2
          case 'h' => sb.append(' '); j += 2
          case _ => sb.append(c); j += 1
        }
      } else { sb.append(c); j += 1 }
    }
    sb.toString
  }

  /** An EBML float payload: 0 (→ 0.0), 4 or 8 big-endian IEEE bytes
    * (RFC 8794 §7.3); any other width is malformed. */
  private def floatVal(b: Array[Byte], el: El): Option[Double] = {
    val n = el.payloadEnd - el.payloadStart
    if (n == 0) Some(0.0)
    else if (n == 4) Some(java.lang.Float.intBitsToFloat(
      uint(b, el).toInt).toDouble)
    else if (n == 8) Some(java.lang.Double.longBitsToDouble(uint(b, el)))
    else None
  }

  /** One audio TrackEntry: block-header track number, CodecID, the
    * `Audio` element's channels (Matroska default 1) / sampling
    * frequency (default 8000 Hz) / bit depth (−1 when undeclared),
    * and the CodecPrivate payload range (OpusHead for `A_OPUS`, the
    * Xiph-laced ident+comment+setup headers for `A_VORBIS`). */
  final case class AudioTrack(trackNumber: Long, codecId: String,
      channels: Int, sampleRateHz: Double, bitDepth: Int,
      codecPrivate: Option[(Int, Int)])

  /** Every TrackType==2 (audio) entry in `Tracks`, in declaration
    * order — the header-only audio profile for Matroska/WebM corpora
    * (the MP4/FLAC/Ogg families' posture; no Cluster byte is
    * needed). None when the bytes are not a conforming Matroska
    * file; Some(empty) for a valid video-only file. */
  def audioTracks(b: Array[Byte]): Option[Seq[AudioTrack]] =
    segmentKids(b).map { kids =>
      kids.filter(_.id == Tracks).flatMap { t =>
        // a Tracks payload that fails to tile is CORRUPTION, not an
        // audio-less file: refuse (→ the flagged row) rather than
        // return Some(empty) — which would be indistinguishable from
        // a valid video-only mux and silently drop the asset from
        // the audio profile
        audioTracksInTracks(b, t.payloadStart, t.payloadEnd)
          .getOrElse(return None)
      }
    }

  /** The audio entries inside ONE `Tracks` payload range — shared by
    * the in-memory and seekable walks (CodecPrivate spans are
    * relative to `b`). None when the payload fails to tile. */
  private[multimodal] def audioTracksInTracks(b: Array[Byte], start: Int,
      end: Int): Option[Seq[AudioTrack]] = {
    val entries = elements(b, start, end).getOrElse(return None)
    Some(entries.filter(_.id == TrackEntry).flatMap { entry =>
      val fields = elements(b, entry.payloadStart, entry.payloadEnd)
        .getOrElse(return None)
      val isAudio = fields.find(_.id == TrackType)
        .exists(uint(b, _) == 2L)
      val num = fields.find(_.id == TrackNumber).map(uint(b, _))
      if (!isAudio || num.isEmpty) None
      else {
        val audio = fields.find(_.id == AudioEl)
          .flatMap(a => elements(b, a.payloadStart, a.payloadEnd))
          .getOrElse(IndexedSeq.empty)
        Some(AudioTrack(num.get,
          fields.find(_.id == CodecId)
            .map(e => new String(b, e.payloadStart,
              e.payloadEnd - e.payloadStart, "UTF-8")).getOrElse(""),
          audio.find(_.id == Channels).map(uint(b, _).toInt)
            .getOrElse(1),
          audio.find(_.id == SamplingFrequency)
            .flatMap(floatVal(b, _)).getOrElse(8000.0),
          audio.find(_.id == BitDepth).map(uint(b, _).toInt)
            .getOrElse(-1),
          fields.find(_.id == CodecPrivate)
            .map(e => (e.payloadStart, e.payloadEnd))))
      }
    })
  }

  /** The duration declared inside ONE `Info` payload range, in
    * SECONDS — shared by the in-memory and seekable walks. */
  private def durationInInfo(b: Array[Byte], start: Int,
      end: Int): Option[Double] =
    elements(b, start, end).flatMap { fields =>
      val scale = fields.find(_.id == TimestampScale)
        .map(uint(b, _)).getOrElse(1000000L)
      fields.find(_.id == Duration).flatMap(floatVal(b, _))
        .map(_ * scale / 1e9)
    }

  /** Segment duration in SECONDS: `Info/Duration` (float, in
    * timestamp-scale ticks) × `Info/TimestampScale` (default 10⁶ ns)
    * ÷ 10⁹ — None when the file is not Matroska or declares no
    * Duration (live/streamed muxes legitimately omit it). */
  def segmentDuration(b: Array[Byte]): Option[Double] =
    segmentKids(b).flatMap { kids =>
      kids.filter(_.id == Info).iterator
        .flatMap(info => durationInInfo(b, info.payloadStart,
          info.payloadEnd))
        .nextOption()
    }

  /** The CodecPrivate payload's kind by its own magic: `OpusHead`
    * (RFC 7845 §5.1), Xiph-laced Vorbis headers (lace count 2,
    * then the two lace-size sequences, then the 0x01-`vorbis`
    * identification packet), or unknown. A cheap cross-check that
    * the declared codec and the carried extradata agree. */
  def audioPrivateKind(b: Array[Byte], from: Int, until: Int): String = {
    def ascii(at: Int, s: String): Boolean =
      at >= from && until - at >= s.length &&
        s.indices.forall(i => (b(at + i) & 0xff) == s.charAt(i))
    if (ascii(from, "OpusHead")) "opus"
    else if (until - from >= 10 && (b(from) & 0xff) == 2) {
      // skip the two Xiph lace-size sequences (255-valued bytes +
      // terminator each); the ident packet must open 0x01 'vorbis'
      var i = from + 1
      var laces = 2
      while (laces > 0 && i < until) {
        if ((b(i) & 0xff) != 255) laces -= 1
        i += 1
      }
      if (laces == 0 && i < until && b(i) == 1 && ascii(i + 1, "vorbis"))
        "vorbis"
      else "unknown"
    } else "unknown"
  }

  /** The video track inside ONE `Tracks` payload range — shared with
    * the seekable walk, which hands the payload in detached (its
    * codecPrivate range is then relative to that detached array). */
  private[multimodal] def videoTrackInTracks(b: Array[Byte], start: Int,
      end: Int): Option[VideoTrack] =
    elements(b, start, end).toSeq.flatten
      .filter(_.id == TrackEntry)
      .flatMap { entry =>
        val fields = elements(b, entry.payloadStart, entry.payloadEnd)
          .getOrElse(return None)
        val isVideo = fields.find(_.id == TrackType)
          .exists(uint(b, _) == 1L)
        val num = fields.find(_.id == TrackNumber).map(uint(b, _))
        if (!isVideo || num.isEmpty) None
        else Some(VideoTrack(num.get,
          fields.find(_.id == CodecId)
            .map(e => new String(b, e.payloadStart,
              e.payloadEnd - e.payloadStart, "UTF-8")).getOrElse(""),
          fields.find(_.id == CodecPrivate)
            .map(e => (e.payloadStart, e.payloadEnd))))
      }.headOption

  /** The metadata of a SEEKABLE (>2 GiB) Matroska file: detached
    * `Tracks` payload(s) + the Segment duration in seconds. */
  final case class SegmentMeta(tracks: Seq[Array[Byte]],
      durationS: Option[Double],
      attachmentSpans: Seq[(Long, Long)] = Nil,
      chapterSpans: Seq[(Long, Long)] = Nil,
      tagSpans: Seq[(Long, Long)] = Nil)

  /** One element header at absolute `at` of a seekable file:
    * (id, payloadAbs, payloadLen — −1 for unknown-size). None on
    * malformed VINTs or a declared size past EOF. The shared header
    * step of every seekable EBML walk in this object. */
  private def elHeaderAt(r: Mp4Index.RangeReader, at: Long)
      : Option[(Long, Long, Long)] = {
    val len = r.length
    val n = math.min(12L, len - at).toInt
    if (n <= 0) return None
    val b = r.readFully(at, n)
    val (id, idW) = readVint(b, 0, 4, keepMarker = true)
      .getOrElse(return None)
    val (size, szW) = readVint(b, idW, 8, keepMarker = false)
      .getOrElse(return None)
    val payloadAbs = at + idW + szW
    if (isUnknownSize(size, szW)) Some((id, payloadAbs, -1L))
    else if (size > len - payloadAbs) None
    else Some((id, payloadAbs, size))
  }

  /** The detached `Tracks` payload(s) of a seekable file — see
    * [[segmentMetaSeekable]] (Info is neither fetched nor parsed on
    * this route: callers that discard the duration must not pay its
    * ranged read, nor have it count against the metadata cap). */
  def trackPayloadsSeekable(r: Mp4Index.RangeReader,
      maxMetaBytes: Int = 1 << 26): Option[Seq[Array[Byte]]] =
    segmentMetaSeekable(r, maxMetaBytes, wantDuration = false)
      .map(_.tracks)

  /** Track + Info metadata of a SEEKABLE (>2 GiB) Matroska file —
    * codec, CodecPrivate, audio fields and duration cost kilobytes
    * of header reads no matter the file size; Cluster payloads are
    * never touched (their headers still tile, the family's
    * strictness — including any top-level elements AFTER a sized
    * Segment, matching [[frameIndexSeekable]]). The in-memory
    * accessors ([[videoTrackInTracks]], [[audioTracksInTracks]]) run
    * on the detached arrays; CodecPrivate spans are then relative to
    * those arrays. None when the prefix is not a conforming Matroska
    * file. */
  def segmentMetaSeekable(r: Mp4Index.RangeReader,
      maxMetaBytes: Int = 1 << 26,
      wantDuration: Boolean = true): Option[SegmentMeta] = {
    val len = r.length
    def readAt(at: Long, want: Int): Array[Byte] = {
      val n = math.min(want.toLong, len - at).toInt
      if (n <= 0) Array.empty[Byte] else r.readFully(at, n)
    }
    def header(at: Long): Option[(Long, Long, Long)] = elHeaderAt(r, at)
    var metaBytes = 0L
    val h0 = header(0).getOrElse(return None)
    if (h0._1 != EbmlHeader || h0._3 < 0) return None
    // cap EVERY metadata fetch — a hostile size must not allocate
    metaBytes += h0._3
    if (metaBytes > maxMetaBytes) return None
    val ebml = readAt(h0._2, h0._3.toInt)
    if (elements(ebml, 0, ebml.length).isEmpty) return None
    val segAt = h0._2 + h0._3
    if (segAt >= len) return None
    val hs = header(segAt).getOrElse(return None)
    if (hs._1 != Segment) return None
    val segEnd = if (hs._3 < 0) len else hs._2 + hs._3
    if (hs._3 >= 0) {
      // a sized Segment may have top-level successors: their headers
      // must still tile the file exactly (the in-memory contract,
      // mirrored from frameIndexSeekable — trailing junk is
      // corruption on BOTH routes, never a byte/path divergence)
      var p = segEnd
      while (p < len) {
        val h = header(p).getOrElse(return None)
        if (h._3 < 0) return None
        p = h._2 + h._3
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val attSpans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val chapSpans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val tagSpans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var duration: Option[Double] = None
    var pos = hs._2
    while (pos < segEnd) {
      val (id, pAbs, pLen) = header(pos).getOrElse(return None)
      if (pLen < 0 || pAbs + pLen > segEnd) return None
      if (id == Tracks ||
          (wantDuration && id == Info && duration.isEmpty)) {
        metaBytes += pLen
        if (metaBytes > maxMetaBytes) return None
        val payload = readAt(pAbs, pLen.toInt)
        if (id == Tracks) out += payload
        else duration = durationInInfo(payload, 0, payload.length)
      } else if (id == Attachments) {
        // span only — FileData stays unread until a walk asks for it
        attSpans += ((pAbs, pLen))
      } else if (id == Chapters) {
        chapSpans += ((pAbs, pLen))
      } else if (id == TagsEl) {
        tagSpans += ((pAbs, pLen))
      }
      pos = pAbs + pLen
    }
    Some(SegmentMeta(out.toSeq, duration, attSpans.toSeq,
      chapSpans.toSeq, tagSpans.toSeq))
  }

  /** One attached file: name, MIME type, FileUID (−1 when the file
    * omits the spec-mandatory element — tolerated, flagged by value,
    * because name+mime+data are what consumers key on), and the
    * FileData byte span. */
  final case class Attachment(fileName: String, mimeType: String,
      fileUid: Long, dataStart: Long, dataLen: Long)

  /** The `\Segment\Attachments\AttachedFile` entries of a SEEKABLE
    * Matroska file — cover art, fonts, companion files: the last
    * common Matroska payload kind beside media tracks. Header-only:
    * FileName/FileMimeType/FileUID payloads are read (small, capped),
    * FileData is returned as a SPAN and never fetched — hydration is
    * [[graft.io.SpanFetch]]'s job, the same seam as frame/member
    * spans. Strictness (the family's no-half-parse rule): element
    * levels must tile, an AttachedFile missing its spec-mandatory
    * FileName/FileMimeType/FileData refuses the asset, unknown
    * elements inside `Attachments` (beside CRC-32/Void) refuse; a
    * valid file WITHOUT attachments yields Seq.empty. Name/mime
    * payloads above 64 KiB refuse (RFC 8794 strings; a multi-MB
    * "name" is corruption, not data). */
  def attachmentsSeekable(r: Mp4Index.RangeReader,
      maxMetaBytes: Int = 1 << 26): Option[Seq[Attachment]] = {
    val meta = segmentMetaSeekable(r, maxMetaBytes, wantDuration = false)
      .getOrElse(return None)
    val out = scala.collection.mutable.ArrayBuffer.empty[Attachment]
    var metaBytes = 0L
    meta.attachmentSpans.foreach { case (aAbs, aLen) =>
      var pos = aAbs
      val end = aAbs + aLen
      while (pos < end) {
        val (id, pAbs, pLen) = elHeaderAt(r, pos).getOrElse(return None)
        if (pLen < 0 || pAbs + pLen > end) return None
        if (id == AttachedFile) {
          var name: Option[String] = None
          var mime: Option[String] = None
          var uid = -1L
          var dataStart = -1L
          var dataLen = -1L
          var q = pAbs
          val fEnd = pAbs + pLen
          while (q < fEnd) {
            val (fid, fAbs, fLen) = elHeaderAt(r, q).getOrElse(return None)
            if (fLen < 0 || fAbs + fLen > fEnd) return None
            if (fid == FileData) {
              dataStart = fAbs; dataLen = fLen
            } else if (fid == FileName || fid == FileMimeType) {
              if (fLen > (1 << 16)) return None
              metaBytes += fLen
              if (metaBytes > maxMetaBytes) return None
              val s = new String(r.readFully(fAbs, fLen.toInt), "UTF-8")
              if (fid == FileName) name = Some(s) else mime = Some(s)
            } else if (fid == FileUID) {
              if (fLen > 8) return None
              val bs = r.readFully(fAbs, fLen.toInt)
              var v = 0L
              bs.foreach(x => v = (v << 8) | (x & 0xff))
              uid = v
            } else if (fid == FileDescription || fid == CrcEl ||
              fid == VoidEl) {
              // header tiles, payload skipped — nothing this index
              // needs (unknown OTHER ids inside AttachedFile tolerate
              // too: the spec reserves room for future children)
            }
            q = fAbs + fLen
          }
          if (name.isEmpty || mime.isEmpty || dataStart < 0) return None
          out += Attachment(name.get, mime.get, uid, dataStart, dataLen)
        } else if (id != CrcEl && id != VoidEl) return None
        pos = pAbs + pLen
      }
    }
    Some(out.toSeq)
  }

  /** [[attachmentsSeekable]] over a byte column (one shared walk —
    * no twin drift). */
  def attachments(b: Array[Byte]): Option[Seq[Attachment]] =
    attachmentsSeekable(new Mp4Index.BytesRangeReader(b))

  /** One chapter mark: edition index, ChapterUID, start/end in
    * NANOSECONDS (Matroska chapter times are ns by spec, independent
    * of TimestampScale; `endNs = -1` when the optional ChapterTimeEnd
    * is absent), the FIRST ChapterDisplay's string + language
    * (`"eng"` — the spec default — when the display omits
    * ChapLanguage; empty title when no display exists), and the
    * nesting level (0 = top; nested ChapterAtoms emit AFTER their
    * parent, document order). */
  final case class Chapter(editionIdx: Int, chapterUid: Long,
      startNs: Long, endNs: Long, title: String, language: String,
      nestLevel: Int)

  private val MaxChapterDepth = 16

  /** The `\Segment\Chapters` editions of a SEEKABLE Matroska file —
    * the navigation payload kind joining tracks / attachments /
    * subtitle cues. Header-only: element headers + the small scalar
    * payloads (UID/times/display strings) are read; nothing else is
    * touched. Strictness (the family's no-half-parse rule): levels
    * must tile; a ChapterAtom missing its spec-mandatory ChapterUID
    * or ChapterTimeStart refuses the asset; unknown elements directly
    * inside `Chapters` (beside CRC-32/Void) refuse; unknown children
    * of EditionEntry / ChapterAtom / ChapterDisplay are tolerated
    * (the spec keeps adding optional ones); ChapString/ChapLanguage
    * payloads above 64 KiB refuse; nesting beyond 16 levels refuses
    * (a chapter tree deeper than that is corruption, not authoring).
    * A valid file WITHOUT chapters yields Seq.empty. */
  def chaptersSeekable(r: Mp4Index.RangeReader,
      maxMetaBytes: Int = 1 << 26): Option[Seq[Chapter]] = {
    val meta = segmentMetaSeekable(r, maxMetaBytes, wantDuration = false)
      .getOrElse(return None)
    val out = scala.collection.mutable.ArrayBuffer.empty[Chapter]
    var metaBytes = 0L
    def uintAt(at: Long, len: Long, cap: Int): Option[Long] = {
      if (len > cap) return None
      val bs = r.readFully(at, len.toInt)
      var v = 0L
      bs.foreach(x => v = (v << 8) | (x & 0xff))
      Some(v)
    }
    def stringAt(at: Long, len: Long): Option[String] = {
      if (len > (1 << 16)) return None
      metaBytes += len
      if (metaBytes > maxMetaBytes) return None
      Some(new String(r.readFully(at, len.toInt), "UTF-8"))
    }
    // one ChapterAtom, recursively: parent row first, children after
    def atom(aAbs: Long, aLen: Long, edition: Int, level: Int)
        : Boolean = {
      if (level > MaxChapterDepth) return false
      var uid = -1L
      var haveUid = false
      var startNs = -1L
      var haveStart = false
      var endNs = -1L
      var title: Option[String] = None
      var lang: Option[String] = None
      val nested = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var q = aAbs
      val aEnd = aAbs + aLen
      while (q < aEnd) {
        val (id, pAbs, pLen) = elHeaderAt(r, q).getOrElse(return false)
        if (pLen < 0 || pAbs + pLen > aEnd) return false
        if (id == ChapterUID) {
          uid = uintAt(pAbs, pLen, 8).getOrElse(return false)
          haveUid = true
        } else if (id == ChapterTimeStart) {
          startNs = uintAt(pAbs, pLen, 8).getOrElse(return false)
          haveStart = true
        } else if (id == ChapterTimeEnd) {
          endNs = uintAt(pAbs, pLen, 8).getOrElse(return false)
        } else if (id == ChapterDisplay && title.isEmpty) {
          // FIRST display wins (spec allows one per language)
          var d = pAbs
          val dEnd = pAbs + pLen
          while (d < dEnd) {
            val (did, dAbs, dLen) = elHeaderAt(r, d)
              .getOrElse(return false)
            if (dLen < 0 || dAbs + dLen > dEnd) return false
            if (did == ChapString)
              title = Some(stringAt(dAbs, dLen).getOrElse(return false))
            else if (did == ChapLanguage)
              lang = Some(stringAt(dAbs, dLen).getOrElse(return false))
            d = dAbs + dLen
          }
          if (title.isEmpty) title = Some("")
        } else if (id == ChapterAtom) {
          nested += ((pAbs, pLen))
        }
        // other children (flags, tracks, process…) tolerate: header
        // tiles, payload skipped
        q = pAbs + pLen
      }
      if (!haveUid || !haveStart) return false
      out += Chapter(edition, uid, startNs, endNs,
        title.getOrElse(""), lang.getOrElse("eng"), level)
      nested.forall { case (nAbs, nLen) =>
        atom(nAbs, nLen, edition, level + 1)
      }
    }
    var edition = 0
    meta.chapterSpans.foreach { case (cAbs, cLen) =>
      var pos = cAbs
      val end = cAbs + cLen
      while (pos < end) {
        val (id, pAbs, pLen) = elHeaderAt(r, pos).getOrElse(return None)
        if (pLen < 0 || pAbs + pLen > end) return None
        if (id == EditionEntry) {
          var q = pAbs
          val eEnd = pAbs + pLen
          while (q < eEnd) {
            val (eid, eAbs, eLen) = elHeaderAt(r, q).getOrElse(return None)
            if (eLen < 0 || eAbs + eLen > eEnd) return None
            if (eid == ChapterAtom) {
              if (!atom(eAbs, eLen, edition, 0)) return None
            }
            // EditionUID/flags/CRC/Void and future children tolerate
            q = eAbs + eLen
          }
          edition += 1
        } else if (id != CrcEl && id != VoidEl) return None
        pos = pAbs + pLen
      }
    }
    Some(out.toSeq)
  }

  /** [[chaptersSeekable]] over a byte column (one shared walk). */
  def chapters(b: Array[Byte]): Option[Seq[Chapter]] =
    chaptersSeekable(new Mp4Index.BytesRangeReader(b))

  /** One Matroska tag: the parent Tag element's index and targeting
    * (TargetTypeValue — 50, the whole-movie level, when Targets omits
    * it; TagTrackUID — 0, "applies to everything", when absent), the
    * SimpleTag's name/value/language ("und" — the spec default — when
    * TagLanguage is absent), `binary = true` for TagBinary payloads
    * (value empty — binary blobs are [[graft.io.SpanFetch]] material,
    * not strings), and the nesting level (nested SimpleTags emit
    * AFTER their parent, document order). */
  final case class MkvTag(tagIdx: Int, targetTypeValue: Long,
      trackUid: Long, name: String, value: String, language: String,
      binary: Boolean, nestLevel: Int)

  /** The `\Segment\Tags` metadata of a SEEKABLE Matroska file —
    * TITLE/ARTIST/DATE_RELEASED etc., the Matroska sibling of ID3 /
    * Vorbis comments / FLAC tags ([[MediaTags]]). Header-only:
    * element headers + small scalar payloads. Strictness (the
    * family's rule): levels tile; a SimpleTag missing its
    * spec-mandatory TagName refuses the asset; unknown elements
    * directly inside `Tags` (beside CRC-32/Void) refuse; unknown
    * children of Tag / Targets / SimpleTag tolerate; name/value/
    * language payloads above 64 KiB refuse; nesting beyond 16 levels
    * refuses. A valid file WITHOUT tags yields Seq.empty. */
  def mkvTagsSeekable(r: Mp4Index.RangeReader,
      maxMetaBytes: Int = 1 << 26): Option[Seq[MkvTag]] = {
    val meta = segmentMetaSeekable(r, maxMetaBytes, wantDuration = false)
      .getOrElse(return None)
    val out = scala.collection.mutable.ArrayBuffer.empty[MkvTag]
    var metaBytes = 0L
    def uintAt(at: Long, len: Long, cap: Int): Option[Long] = {
      if (len > cap) return None
      val bs = r.readFully(at, len.toInt)
      var v = 0L
      bs.foreach(x => v = (v << 8) | (x & 0xff))
      Some(v)
    }
    def stringAt(at: Long, len: Long): Option[String] = {
      if (len > (1 << 16)) return None
      metaBytes += len
      if (metaBytes > maxMetaBytes) return None
      Some(new String(r.readFully(at, len.toInt), "UTF-8"))
    }
    // one SimpleTag, recursively: parent row first, children after
    def simpleTag(sAbs: Long, sLen: Long, tagIdx: Int, ttv: Long,
        uid: Long, level: Int): Boolean = {
      if (level > MaxChapterDepth) return false
      var name: Option[String] = None
      var value = ""
      var lang = "und"
      var binary = false
      val nested = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var q = sAbs
      val sEnd = sAbs + sLen
      while (q < sEnd) {
        val (id, pAbs, pLen) = elHeaderAt(r, q).getOrElse(return false)
        if (pLen < 0 || pAbs + pLen > sEnd) return false
        if (id == TagName)
          name = Some(stringAt(pAbs, pLen).getOrElse(return false))
        else if (id == TagString)
          value = stringAt(pAbs, pLen).getOrElse(return false)
        else if (id == TagBinary)
          binary = true // payload skipped — spans, not strings
        else if (id == TagLanguage)
          lang = stringAt(pAbs, pLen).getOrElse(return false)
        else if (id == SimpleTagEl)
          nested += ((pAbs, pLen))
        // other children tolerate: header tiles, payload skipped
        q = pAbs + pLen
      }
      if (name.isEmpty) return false
      out += MkvTag(tagIdx, ttv, uid, name.get, value, lang, binary,
        level)
      nested.forall { case (nAbs, nLen) =>
        simpleTag(nAbs, nLen, tagIdx, ttv, uid, level + 1)
      }
    }
    var tagIdx = 0
    meta.tagSpans.foreach { case (tAbs, tLen) =>
      var pos = tAbs
      val end = tAbs + tLen
      while (pos < end) {
        val (id, pAbs, pLen) = elHeaderAt(r, pos).getOrElse(return None)
        if (pLen < 0 || pAbs + pLen > end) return None
        if (id == TagEl) {
          // first pass: targeting; second: the SimpleTags under it
          var ttv = 50L
          var uid = 0L
          val stags =
            scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          var q = pAbs
          val tEnd = pAbs + pLen
          while (q < tEnd) {
            val (eid, eAbs, eLen) = elHeaderAt(r, q).getOrElse(return None)
            if (eLen < 0 || eAbs + eLen > tEnd) return None
            if (eid == TargetsEl) {
              var d = eAbs
              val dEnd = eAbs + eLen
              while (d < dEnd) {
                val (did, dAbs, dLen) = elHeaderAt(r, d)
                  .getOrElse(return None)
                if (dLen < 0 || dAbs + dLen > dEnd) return None
                if (did == TargetTypeValue)
                  ttv = uintAt(dAbs, dLen, 8).getOrElse(return None)
                else if (did == TagTrackUID)
                  uid = uintAt(dAbs, dLen, 8).getOrElse(return None)
                d = dAbs + dLen
              }
            } else if (eid == SimpleTagEl) {
              stags += ((eAbs, eLen))
            }
            q = eAbs + eLen
          }
          if (!stags.forall { case (sAbs, sLen) =>
            simpleTag(sAbs, sLen, tagIdx, ttv, uid, 0)
          }) return None
          tagIdx += 1
        } else if (id != CrcEl && id != VoidEl) return None
        pos = pAbs + pLen
      }
    }
    Some(out.toSeq)
  }

  /** [[mkvTagsSeekable]] over a byte column (one shared walk). */
  def mkvTags(b: Array[Byte]): Option[Seq[MkvTag]] =
    mkvTagsSeekable(new Mp4Index.BytesRangeReader(b))

  /** Block-payload parse: track-number VINT + 2-byte timestamp +
    * flags, then the (possibly laced) frame data — one (start, len)
    * per laced frame (§ "Block Structure" / "Lacing"). None on any
    * malformed lacing arithmetic. `None` frames with a non-matching
    * track are signalled by an EMPTY result (skip, not refuse).
    */
  private def blockFrames(b: Array[Byte], el: El,
      track: Long): Option[Seq[(Int, Int)]] =
    blockFramesRel(b, el.payloadStart, el.payloadEnd,
      (el.payloadEnd - el.payloadStart).toLong, track)
      .map(_.map { case (rel, len) =>
        (el.payloadStart + rel.toInt, len.toInt) // in-memory: < 2 GiB
      })

  /** [[blockFrames]] over a HEADER PREFIX: `b[start, availEnd)` holds
    * at least the block header (track VINT + timestamp + flags +
    * lacing table); `payloadLen` is the block payload's TOTAL length
    * (the trailing frame takes the remainder without the bytes being
    * present). Frame offsets are relative to `start`. None when the
    * header is malformed OR extends past `availEnd` — a seekable
    * caller retries with a larger prefix before judging. Shared by
    * the in-memory and seekable walks so they cannot drift.
    */
  private def blockFramesRel(b: Array[Byte], start: Int, availEnd: Int,
      payloadLen: Long, track: Long): Option[Seq[(Long, Long)]] = {
    val (tn, tw) = readVint2(b, start, availEnd, 8, keepMarker = false)
      .getOrElse(return None)
    var i = start + tw
    if (i + 3 > availEnd) return None
    val flags = b(i + 2) & 0xff
    i += 3
    if (tn != track) return Some(Seq.empty)
    val lacing = (flags >> 1) & 0x03
    // all span arithmetic is LONG: a seekable block's payload (and
    // its trailing frame) may exceed 2 GiB even though the header
    // prefix in `b` is small
    val end = start.toLong + payloadLen // logical payload end
    // a block with no frame data is malformed — refuse like the laced
    // paths do (their per-frame sizes(f) <= 0 check), never emit a
    // zero-length span to the decoder seam
    if (lacing == 0)
      return if (end > i) Some(Seq(((i - start).toLong, end - i)))
      else None
    // laced: 1 byte (frame count - 1), then per-mode sizes for all
    // but the LAST frame, which takes the remainder. Header reads must
    // stay inside the AVAILABLE prefix — hdrEnd caps them.
    val hdrEnd = math.min(end, availEnd.toLong).toInt
    if (i >= hdrEnd) return None
    val n = (b(i) & 0xff) + 1
    i += 1
    val sizes = new Array[Long](n)
    lacing match {
      case 1 => // Xiph: 255-run + terminator byte per frame
        var f = 0
        while (f < n - 1) {
          var sz = 0L
          var more = true
          while (more) {
            if (i >= hdrEnd) return None
            val v = b(i) & 0xff
            sz += v; i += 1
            more = v == 255
          }
          sizes(f) = sz
          f += 1
        }
      case 2 => // fixed: the remainder must divide evenly
        val rem = end - i
        if (rem < 0 || rem % n != 0) return None
        java.util.Arrays.fill(sizes, rem / n)
      case 3 => // EBML: first size a VINT, then signed-VINT deltas —
        // sizes are stored for all frames EXCEPT the last, so a
        // 1-frame "laced" block carries NO size bytes at all
        if (n >= 2) {
          val (s0, w0) = readVint2(b, i, hdrEnd, 8, keepMarker = false)
            .getOrElse(return None)
          i += w0
          // validate BEFORE use: a declared size past the payload is
          // a refusal, never a silent-wrong span
          if (s0 <= 0 || s0 > end - i) return None
          sizes(0) = s0
          var f = 1
          while (f < n - 1) {
            val (d, wd) = readVint2(b, i, hdrEnd, 8, keepMarker = false)
              .getOrElse(return None)
            i += wd
            val delta = d - ((1L << (7 * wd - 1)) - 1) // signed per spec
            val next = sizes(f - 1) + delta
            if (next <= 0 || next > end - i) return None
            sizes(f) = next
            f += 1
          }
        }
      case _ => return None
    }
    if (lacing != 2) {
      val head = sizes.take(n - 1).sum
      if (sizes.take(n - 1).exists(_ < 0) || head > end - i) return None
      sizes(n - 1) = end - i - head
    }
    val out = new Array[(Long, Long)](n)
    var f = 0
    var p = i.toLong
    while (f < n) {
      if (sizes(f) <= 0 || p + sizes(f) > end) return None
      out(f) = (p - start, sizes(f))
      p += sizes(f)
      f += 1
    }
    if (p != end) return None // frames must tile the block exactly
    Some(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  }

  /** [[readVint]] bounded by an explicit end instead of b.length. */
  private def readVint2(b: Array[Byte], i: Int, end: Int, maxW: Int,
      keepMarker: Boolean): Option[(Long, Int)] =
    readVint(b, i, maxW, keepMarker).filter { case (_, w) => i + w <= end }

  /** The frame index: every video-track block's frame byte ranges, in
    * cluster/block order, keyframe-flagged. None when the bytes are
    * not a Matroska/WebM file with a video track and ≥1 frame.
    */
  def frameIndex(b: Array[Byte]): Option[IndexedSeq[FrameSpan]] = {
    val track = videoTrack(b).getOrElse(return None)
    val kids = segmentKids(b).getOrElse(return None)
    val spans = scala.collection.mutable.ArrayBuffer.empty[FrameSpan]
    kids.filter(_.id == Cluster).foreach { cluster =>
      val ckids = elements(b, cluster.payloadStart, cluster.payloadEnd)
        .getOrElse(return None)
      ckids.foreach { el =>
        if (el.id == SimpleBlock) {
          val key = el.payloadEnd > el.payloadStart + 2 && {
            // flags byte sits after the track VINT + 2 ts bytes
            readVint(b, el.payloadStart, 8, keepMarker = false).exists {
              case (_, tw) => el.payloadStart + tw + 2 < el.payloadEnd &&
                (b(el.payloadStart + tw + 2) & 0x80) != 0
            }
          }
          blockFrames(b, el, track.trackNumber).getOrElse(return None)
            .foreach { case (s, l) =>
              spans += FrameSpan(spans.length, s, l, key)
            }
        } else if (el.id == BlockGroup) {
          val gkids = elements(b, el.payloadStart, el.payloadEnd)
            .getOrElse(return None)
          val key = !gkids.exists(_.id == ReferenceBlock)
          gkids.filter(_.id == Block).foreach { blk =>
            blockFrames(b, blk, track.trackNumber).getOrElse(return None)
              .foreach { case (s, l) =>
                spans += FrameSpan(spans.length, s, l, key)
              }
          }
        }
      }
    }
    if (spans.isEmpty) None else Some(spans.toIndexedSeq)
  }

  // ---- seekable (>2 GiB) indexing: element headers + block-header
  // PREFIXES only — frame data is never read. Matroska puts the frame
  // bytes INSIDE cluster elements (unlike MP4's out-of-line mdat), so
  // the trick here is skipping block payloads by seek: per block the
  // walk reads its header prefix (track VINT + timestamp + flags +
  // lacing table) and computes the frame spans from arithmetic, via
  // the same [[blockFramesRel]] the in-memory walk uses ----

  /** Seekable frame index over a [[Mp4Index.RangeReader]]: the same
    * spans/flags as [[frameIndex]] with 64-bit addressing and I/O
    * proportional to the BLOCK COUNT (tens of bytes per block), not
    * the file size. Contracts beyond the in-memory walk's: `Tracks`
    * must precede the first `Cluster` (every real muxer's layout —
    * this is a single forward pass), and a laced block whose lacing
    * table exceeds 1 MiB refuses (a Xiph table that large implies
    * >250 MB of laced frames in ONE block). `maxMetaBytes` caps the
    * cumulative EBML-header + Tracks reads.
    */
  def frameIndexSeekable(r: Mp4Index.RangeReader,
      maxMetaBytes: Int = 1 << 26): Option[IndexedSeq[Mp4Index.LongSpan]] = {
    val len = r.length
    def readAt(at: Long, want: Int): Array[Byte] = {
      val n = math.min(want.toLong, len - at).toInt
      if (n <= 0) Array.empty[Byte] else r.readFully(at, n)
    }
    // one element header at absolute `at` — the shared seekable-EBML
    // header step (one implementation; a byte-identical private copy
    // lived here before [[elHeaderAt]] was factored out)
    def header(at: Long): Option[(Long, Long, Long)] = elHeaderAt(r, at)
    var metaBytes = 0L
    def readMeta(at: Long, n: Long): Option[Array[Byte]] = {
      metaBytes += n
      if (metaBytes > maxMetaBytes) None else Some(readAt(at, n.toInt))
    }
    // EBML header, then Segment (unknown size = to EOF, must be last)
    val h0 = header(0).getOrElse(return None)
    if (h0._1 != EbmlHeader || h0._3 < 0) return None
    val ebml = readMeta(h0._2, h0._3).getOrElse(return None)
    if (elements(ebml, 0, ebml.length).isEmpty) return None
    val segAt = h0._2 + h0._3
    if (segAt >= len) return None
    val hs = header(segAt).getOrElse(return None)
    if (hs._1 != Segment) return None
    val segEnd = if (hs._3 < 0) len else hs._2 + hs._3
    if (hs._3 >= 0) {
      // a sized Segment may have top-level successors: their headers
      // must still tile the file exactly (the in-memory contract)
      var p = segEnd
      while (p < len) {
        val h = header(p).getOrElse(return None)
        if (h._3 < 0) return None
        p = h._2 + h._3
      }
    }
    var videoNum = -1L
    val spans =
      scala.collection.mutable.ArrayBuffer.empty[Mp4Index.LongSpan]
    // block emission: header prefix first (4 KiB covers every sane
    // lacing table), one 1 MiB retry, then refuse — blockFramesRel
    // cannot distinguish "malformed" from "prefix too small", so the
    // retry must make the prefix decisive
    def emitBlock(payloadAbs: Long, payloadLen: Long,
        keyOfFlags: Option[Int => Boolean]): Boolean = {
      def attempt(n: Int): Option[(Seq[(Long, Long)], Int)] = {
        val pb = readAt(payloadAbs, math.min(n.toLong, payloadLen).toInt)
        val tw = readVint(pb, 0, 8, keepMarker = false).map(_._2)
          .getOrElse(return None)
        if (tw + 3 > pb.length) return None
        blockFramesRel(pb, 0, pb.length, payloadLen, videoNum)
          .map(fs => (fs, pb(tw + 2) & 0xff))
      }
      val got = attempt(4096).orElse(
        if (payloadLen > 4096) attempt(1 << 20) else None)
      got match {
        case None => false
        case Some((frames, flags)) =>
          val key = keyOfFlags.map(f => f(flags)).getOrElse(false)
          frames.foreach { case (rel, flen) =>
            spans += Mp4Index.LongSpan(spans.length, payloadAbs + rel,
              flen, key)
          }
          true
      }
    }
    var pos = hs._2
    while (pos < segEnd) {
      val (id, pAbs, pLen) = header(pos).getOrElse(return None)
      if (pLen < 0 || pAbs + pLen > segEnd) return None
      if (id == Tracks) {
        if (videoNum < 0) {
          val tb = readMeta(pAbs, pLen).getOrElse(return None)
          videoNum = videoTrackInTracks(tb, 0, tb.length)
            .map(_.trackNumber).getOrElse(return None)
        }
      } else if (id == Cluster) {
        if (videoNum < 0) return None // Tracks must precede clusters
        var cp = pAbs
        val cEnd = pAbs + pLen
        while (cp < cEnd) {
          val (cid, cpa, cpl) = header(cp).getOrElse(return None)
          if (cpl < 0 || cpa + cpl > cEnd) return None
          if (cid == SimpleBlock) {
            if (!emitBlock(cpa, cpl,
                Some(flags => (flags & 0x80) != 0))) return None
          } else if (cid == BlockGroup) {
            // group children by header: Blocks + ReferenceBlock flag
            var gp = cpa
            val gEnd = cpa + cpl
            var hasRef = false
            val blocks =
              scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
            while (gp < gEnd) {
              val (gid, gpa, gpl) = header(gp).getOrElse(return None)
              if (gpl < 0 || gpa + gpl > gEnd) return None
              if (gid == Block) blocks += ((gpa, gpl))
              else if (gid == ReferenceBlock) hasRef = true
              gp = gpa + gpl
            }
            val key = !hasRef
            blocks.foreach { case (bpa, bpl) =>
              if (!emitBlock(bpa, bpl, Some(_ => key))) return None
            }
          }
          cp = cpa + cpl
        }
      }
      pos = pAbs + pLen
    }
    if (spans.isEmpty) None else Some(spans.toIndexedSeq)
  }

  // ---- synthetic encoder for specs/oracles ----

  private def idBytes(id: Long): Array[Byte] = {
    val w = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    Array.tabulate[Byte](w)(j => ((id >> (8 * (w - 1 - j))) & 0xff).toByte)
  }
  /** Smallest-width size VINT (all-ones reserved for unknown). */
  private def sizeVint(n: Long): Array[Byte] = {
    require(n >= 0)
    var w = 1
    while (n >= (1L << (7 * w)) - 1) w += 1
    Array.tabulate[Byte](w) { j =>
      val v = (n >> (8 * (w - 1 - j))) & 0xff
      if (j == 0) (v | (0x100 >> w)).toByte else v.toByte
    }
  }
  private[multimodal] def el(id: Long, payload: Array[Byte]): Array[Byte] =
    idBytes(id) ++ sizeVint(payload.length.toLong) ++ payload
  private def uintEl(id: Long, v: Long): Array[Byte] = {
    val w = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    el(id, Array.tabulate[Byte](w)(j =>
      ((v >> (8 * (w - 1 - j))) & 0xff).toByte))
  }

  /** Minimal-but-valid synthetic WebM: EBML header (DocType "webm"),
    * Segment(Info(TimestampScale), Tracks(video TrackEntry
    * [+ leading audio entry]), one Cluster of per-frame SimpleBlocks
    * [or BlockGroups with ReferenceBlock marking non-keys]). With
    * `audioTrackFirst`, audio is track 1 DECLARED FIRST and one audio
    * SimpleBlock precedes each video block — the real muxed layout an
    * indexer without track filtering would misread.
    */
  def encodeSynthetic(frames: Seq[(Array[Byte], Boolean)],
      audioTrackFirst: Boolean = false,
      useBlockGroups: Boolean = false,
      codecPrivate: Option[Array[Byte]] = None,
      codecId: String = "V_MPEG4/ISO/AVC"): Array[Byte] = {
    require(frames.nonEmpty)
    val videoNum = if (audioTrackFirst) 2L else 1L
    val ebml = el(EbmlHeader, el(DocType, "webm".getBytes("UTF-8")))
    val info = el(Info, uintEl(0x2AD7B1L, 1000000L))
    val videoEntry = el(TrackEntry,
      uintEl(TrackNumber, videoNum) ++ uintEl(TrackType, 1L) ++
        el(CodecId, codecId.getBytes("UTF-8")) ++
        codecPrivate.map(el(CodecPrivate, _)).getOrElse(Array.empty[Byte]))
    val audioEntry =
      if (!audioTrackFirst) Array.empty[Byte]
      else el(TrackEntry,
        uintEl(TrackNumber, 1L) ++ uintEl(TrackType, 2L) ++
          el(CodecId, "A_OPUS".getBytes("UTF-8")))
    val tracks = el(Tracks, audioEntry ++ videoEntry)
    def blockPayload(trackNum: Long, flags: Int,
        data: Array[Byte]): Array[Byte] =
      Array((0x80 | trackNum).toByte, 0.toByte, 0.toByte,
        flags.toByte) ++ data
    val blocks = frames.flatMap { case (data, key) =>
      val audio =
        if (!audioTrackFirst) Array.empty[Byte]
        else el(SimpleBlock, blockPayload(1L, 0x80, Array[Byte](0x55, 0x55)))
      val video =
        if (useBlockGroups)
          el(BlockGroup,
            el(Block, blockPayload(videoNum, 0x00, data)) ++
              (if (key) Array.empty[Byte]
               else el(ReferenceBlock, Array[Byte](0x7f))))
        else el(SimpleBlock,
          blockPayload(videoNum, if (key) 0x80 else 0x00, data))
      audio ++ video
    }.toArray
    val cluster = el(Cluster, uintEl(0xE7L, 0L) ++ blocks)
    ebml ++ el(Segment, info ++ tracks ++ cluster)
  }

  private def floatEl(id: Long, v: Double): Array[Byte] =
    el(id, java.nio.ByteBuffer.allocate(4)
      .putInt(java.lang.Float.floatToIntBits(v.toFloat)).array())

  /** RFC 7845 §5.1 OpusHead for fixtures: magic, version 1, channel
    * count, pre-skip (LE), input sample rate (LE), zero gain,
    * mapping family 0. 19 bytes. */
  def encodeOpusHead(channels: Int, inputRateHz: Int,
      preSkip: Int = 312): Array[Byte] =
    "OpusHead".getBytes("ISO-8859-1") ++ Array[Byte](1, channels.toByte,
      (preSkip & 0xff).toByte, ((preSkip >> 8) & 0xff).toByte,
      (inputRateHz & 0xff).toByte, ((inputRateHz >> 8) & 0xff).toByte,
      ((inputRateHz >> 16) & 0xff).toByte,
      ((inputRateHz >> 24) & 0xff).toByte, 0, 0, 0)

  /** A Xiph-laced Vorbis CodecPrivate skeleton for fixtures: lace
    * count 2, the two lace-size sequences, then the three packets —
    * the identification packet's 0x01+"vorbis" magic is real, the
    * bodies synthetic. */
  def encodeVorbisPrivate(identLen: Int = 30, commentLen: Int = 16,
      setupLen: Int = 8): Array[Byte] = {
    require(identLen >= 7 && identLen < 255 && commentLen < 255)
    def lace(n: Int) = Array((n & 0xff).toByte)
    def packet(lead: Int, len: Int): Array[Byte] =
      Array(lead.toByte) ++ "vorbis".getBytes("ISO-8859-1") ++
        Array.tabulate[Byte](len - 7)(i => ((i * 11 + 3) & 0x7f).toByte)
    Array[Byte](2) ++ lace(identLen) ++ lace(commentLen) ++
      packet(1, identLen) ++ packet(3, commentLen) ++ packet(5, setupLen)
  }

  /** Synthetic Matroska with AUDIO TrackEntries — the fixture for the
    * header-only audio profile: Info carries TimestampScale (10⁶) and
    * optionally Duration (ticks → milliseconds at that scale); each
    * track gets an `Audio` element (Channels + SamplingFrequency
    * [+ BitDepth]) and optional CodecPrivate; one tiny SimpleBlock
    * per track forms the Cluster. */
  def encodeSyntheticAudio(
      tracks: Seq[(String, Int, Double, Option[Array[Byte]])],
      durationTicks: Option[Double] = None,
      bitDepth: Option[Int] = None): Array[Byte] = {
    require(tracks.nonEmpty)
    val ebml = el(EbmlHeader, el(DocType, "webm".getBytes("UTF-8")))
    val info = el(Info, uintEl(TimestampScale, 1000000L) ++
      durationTicks.map(floatEl(Duration, _)).getOrElse(Array.empty[Byte]))
    val entries = tracks.zipWithIndex.map {
      case ((codecId, channels, rateHz, priv), i) =>
        el(TrackEntry,
          uintEl(TrackNumber, (i + 1).toLong) ++ uintEl(TrackType, 2L) ++
            el(CodecId, codecId.getBytes("UTF-8")) ++
            priv.map(el(CodecPrivate, _)).getOrElse(Array.empty[Byte]) ++
            el(AudioEl, uintEl(Channels, channels.toLong) ++
              floatEl(SamplingFrequency, rateHz) ++
              bitDepth.map(d => uintEl(BitDepth, d.toLong))
                .getOrElse(Array.empty[Byte])))
    }
    val blocks = tracks.indices.toArray.flatMap { i =>
      el(SimpleBlock, Array((0x80 | (i + 1)).toByte, 0.toByte, 0.toByte,
        0x80.toByte) ++ Array[Byte](0x55, 0x55))
    }
    val cluster = el(Cluster, uintEl(0xE7L, 0L) ++ blocks)
    ebml ++ el(Segment,
      info ++ el(Tracks, entries.flatten.toArray) ++ cluster)
  }

  /** Synthetic Matroska with one S_TEXT/UTF8 subtitle track — the
    * fixture for [[subtitleCues]]: one Cluster PER CUE (Timestamp =
    * the cue start, block delta 0 — the sparse-cue shape real muxers
    * emit), each cue a BlockGroup(Block + BlockDuration); a cue with
    * `durTicks < 0` encodes as a bare SimpleBlock (no duration).
    * An optional leading video track + one video block pins track
    * routing. `codecId` lets the fixture declare S_TEXT/ASS (cue
    * strings are then RAW block payloads — dialogue fields and all,
    * exactly what a real mux stores). */
  def encodeSyntheticSubtitles(cues: Seq[(Long, Long, String)],
      videoTrackFirst: Boolean = false,
      codecId: String = "S_TEXT/UTF8"): Array[Byte] = {
    require(cues.nonEmpty)
    val subNum = if (videoTrackFirst) 2L else 1L
    val ebml = el(EbmlHeader, el(DocType, "webm".getBytes("UTF-8")))
    val info = el(Info, uintEl(TimestampScale, 1000000L))
    val videoEntry =
      if (!videoTrackFirst) Array.empty[Byte]
      else el(TrackEntry,
        uintEl(TrackNumber, 1L) ++ uintEl(TrackType, 1L) ++
          el(CodecId, "V_VP9".getBytes("UTF-8")))
    val subEntry = el(TrackEntry,
      uintEl(TrackNumber, subNum) ++ uintEl(TrackType, 0x11L) ++
        el(CodecId, codecId.getBytes("UTF-8")))
    val tracks = el(Tracks, videoEntry ++ subEntry)
    val clusters = cues.toArray.flatMap { case (start, dur, text) =>
      val payload = Array((0x80 | subNum).toByte, 0.toByte, 0.toByte,
        0.toByte) ++ text.getBytes("UTF-8")
      val blockish =
        if (dur < 0) el(SimpleBlock, payload)
        else el(BlockGroup, el(Block, payload) ++ uintEl(0x9BL, dur))
      val video =
        if (!videoTrackFirst) Array.empty[Byte]
        else el(SimpleBlock, Array(0x81.toByte, 0.toByte, 0.toByte,
          0x80.toByte) ++ Array[Byte](0x55, 0x55))
      el(Cluster, uintEl(0xE7L, start) ++ video ++ blockish)
    }
    ebml ++ el(Segment, info ++ tracks ++ clusters)
  }

  /** Synthetic Matroska with an `Attachments` element — the fixture
    * for [[attachments]]: one AttachedFile per (name, mimeType, uid,
    * data) entry, after a minimal video track (attachments ride real
    * media files). `uid < 0` OMITS the FileUID element (the
    * tolerated-by-value posture); an entry with `omitMime` in
    * `broken` drops its spec-mandatory FileMimeType (the refusal
    * fixture). */
  def encodeSyntheticAttachments(
      files: Seq[(String, String, Long, Array[Byte])],
      omitMimeFor: Set[String] = Set.empty): Array[Byte] = {
    require(files.nonEmpty)
    val ebml = el(EbmlHeader, el(DocType, "matroska".getBytes("UTF-8")))
    val info = el(Info, uintEl(TimestampScale, 1000000L))
    val tracks = el(Tracks, el(TrackEntry,
      uintEl(TrackNumber, 1L) ++ uintEl(TrackType, 1L) ++
        el(CodecId, "V_VP9".getBytes("UTF-8"))))
    val atts = el(Attachments, files.toArray.flatMap {
      case (name, mime, uid, data) =>
        el(AttachedFile,
          el(FileName, name.getBytes("UTF-8")) ++
            (if (omitMimeFor.contains(name)) Array.empty[Byte]
             else el(FileMimeType, mime.getBytes("UTF-8"))) ++
            (if (uid < 0) Array.empty[Byte] else uintEl(FileUID, uid)) ++
            el(FileData, data))
    })
    ebml ++ el(Segment, info ++ tracks ++ atts)
  }

  /** Fixture chapter shape for [[encodeSyntheticChapters]]: `endNs <
    * 0` omits ChapterTimeEnd; `title == null` omits the whole
    * ChapterDisplay; `lang == null` omits ChapLanguage inside it;
    * `omitUid` drops the spec-mandatory ChapterUID (the refusal
    * fixture); `children` nest. */
  final case class ChapterSpec(uid: Long, startNs: Long, endNs: Long,
      title: String, lang: String, children: Seq[ChapterSpec] = Nil,
      omitUid: Boolean = false)

  /** Synthetic Matroska with a `Chapters` element — the fixture for
    * [[chapters]]: one EditionEntry per outer Seq, ChapterAtoms (and
    * nested atoms) per [[ChapterSpec]], after a minimal video
    * track. */
  def encodeSyntheticChapters(editions: Seq[Seq[ChapterSpec]])
      : Array[Byte] = {
    require(editions.nonEmpty && editions.forall(_.nonEmpty))
    def atomBytes(c: ChapterSpec): Array[Byte] = {
      val display =
        if (c.title == null) Array.empty[Byte]
        else el(ChapterDisplay,
          el(ChapString, c.title.getBytes("UTF-8")) ++
            (if (c.lang == null) Array.empty[Byte]
             else el(ChapLanguage, c.lang.getBytes("UTF-8"))))
      el(ChapterAtom,
        (if (c.omitUid) Array.empty[Byte] else uintEl(ChapterUID, c.uid)) ++
          uintEl(ChapterTimeStart, c.startNs) ++
          (if (c.endNs < 0) Array.empty[Byte]
           else uintEl(ChapterTimeEnd, c.endNs)) ++
          display ++
          c.children.toArray.flatMap(atomBytes))
    }
    val ebml = el(EbmlHeader, el(DocType, "matroska".getBytes("UTF-8")))
    val info = el(Info, uintEl(TimestampScale, 1000000L))
    val tracks = el(Tracks, el(TrackEntry,
      uintEl(TrackNumber, 1L) ++ uintEl(TrackType, 1L) ++
        el(CodecId, "V_VP9".getBytes("UTF-8"))))
    val chaps = el(Chapters, editions.toArray.flatMap(ed =>
      el(EditionEntry, ed.toArray.flatMap(atomBytes))))
    ebml ++ el(Segment, info ++ tracks ++ chaps)
  }

  /** Fixture tag shape for [[encodeSyntheticTags]]: `lang == null`
    * omits TagLanguage; `value == null` encodes a TagBinary (8 filler
    * bytes) instead of TagString; `name == null` omits the
    * spec-mandatory TagName (the refusal fixture); `children`
    * nest. */
  final case class TagSpec(name: String, value: String,
      lang: String = null, children: Seq[TagSpec] = Nil)

  /** Synthetic Matroska with a `Tags` element — the fixture for
    * [[mkvTags]]: one Tag per (targetTypeValue, trackUid, simpleTags)
    * entry (`targetTypeValue < 0` omits Targets entirely — the
    * defaults posture), after a minimal video track. */
  def encodeSyntheticTags(
      tags: Seq[(Long, Long, Seq[TagSpec])]): Array[Byte] = {
    require(tags.nonEmpty)
    def stBytes(t: TagSpec): Array[Byte] =
      el(SimpleTagEl,
        (if (t.name == null) Array.empty[Byte]
         else el(TagName, t.name.getBytes("UTF-8"))) ++
          (if (t.value == null) el(TagBinary, Array.fill[Byte](8)(0x5a))
           else el(TagString, t.value.getBytes("UTF-8"))) ++
          (if (t.lang == null) Array.empty[Byte]
           else el(TagLanguage, t.lang.getBytes("UTF-8"))) ++
          t.children.toArray.flatMap(stBytes))
    val ebml = el(EbmlHeader, el(DocType, "matroska".getBytes("UTF-8")))
    val info = el(Info, uintEl(TimestampScale, 1000000L))
    val tracks = el(Tracks, el(TrackEntry,
      uintEl(TrackNumber, 1L) ++ uintEl(TrackType, 1L) ++
        el(CodecId, "V_VP9".getBytes("UTF-8"))))
    val tagsEl = el(TagsEl, tags.toArray.flatMap { case (ttv, uid, sts) =>
      val targets =
        if (ttv < 0) Array.empty[Byte]
        else el(TargetsEl, uintEl(TargetTypeValue, ttv) ++
          (if (uid == 0) Array.empty[Byte] else uintEl(TagTrackUID, uid)))
      el(TagEl, targets ++ sts.toArray.flatMap(stBytes))
    })
    ebml ++ el(Segment, info ++ tracks ++ tagsEl)
  }

  /** One laced SimpleBlock holding all `frames` (mode: "xiph",
    * "fixed" — equal sizes required — or "ebml"), keyframe-flagged,
    * in the same minimal Segment shell as [[encodeSynthetic]]. */
  def encodeSyntheticLaced(frames: Seq[Array[Byte]], mode: String,
      key: Boolean = true): Array[Byte] = {
    require(frames.nonEmpty)
    val laceFlag = mode match {
      case "xiph" => 1 << 1
      case "fixed" => 2 << 1
      case "ebml" => 3 << 1
      case _ => sys.error(s"unknown lace mode $mode")
    }
    if (mode == "fixed")
      require(frames.map(_.length).distinct.size == 1,
        "fixed lacing needs uniform frames")
    val sizes: Array[Byte] = mode match {
      case "fixed" => Array.empty[Byte]
      case "xiph" =>
        frames.init.toArray.flatMap { f =>
          val full = f.length / 255
          Array.fill[Byte](full)(0xff.toByte) :+ (f.length % 255).toByte
        }
      case "ebml" =>
        // 1-byte VINTs: first size 0x80|len (len < 127); deltas as
        // signed 1-byte VINTs biased by 2^6 - 1 = 63. Sizes cover all
        // frames EXCEPT the last — a 1-frame block carries none.
        if (frames.size == 1) Array.empty[Byte]
        else {
          val first = frames.head.length
          require(first < 127, "spec encoder keeps sizes 1-byte")
          val deltas = frames.init.toSeq.sliding(2).collect {
            case Seq(a, b) =>
              val d = b.length - a.length
              require(d >= -63 && d <= 63, "delta out of 1-byte range")
              (0x80 | (d + 63)).toByte
          }.toArray
          Array((0x80 | first).toByte) ++ deltas
        }
    }
    val payload =
      Array(0x81.toByte, 0.toByte, 0.toByte,
        ((if (key) 0x80 else 0x00) | laceFlag).toByte,
        (frames.size - 1).toByte) ++ sizes ++ frames.toArray.flatten
    val ebml = el(EbmlHeader, el(DocType, "webm".getBytes("UTF-8")))
    val info = el(Info, uintEl(0x2AD7B1L, 1000000L))
    val tracks = el(Tracks, el(TrackEntry,
      uintEl(TrackNumber, 1L) ++ uintEl(TrackType, 1L) ++
        el(CodecId, "V_VP9".getBytes("UTF-8"))))
    val cluster = el(Cluster,
      uintEl(0xE7L, 0L) ++ el(SimpleBlock, payload))
    ebml ++ el(Segment, info ++ tracks ++ cluster)
  }
}

