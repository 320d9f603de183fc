package graft.multimodal

import H264AnnexB.FrameSpan

/** MP4 (ISO base media file format, ISO/IEC 14496-12 — public spec)
  * SAMPLE-TABLE indexing: real video corpora are `.mp4` files, where
  * frame boundaries do not need codec parsing at all — the `stbl` box
  * already IS the frame index (`stsz` sample sizes, `stco`/`co64`
  * chunk offsets, `stsc` sample→chunk runs, `stss` sync samples).
  * This walks the box tree (`moov`→`trak`→`mdia`→`minf`→`stbl`),
  * reconstructs each sample's absolute byte range inside `mdat`, and
  * flags the sync (seekable) samples — completing the H.264 family:
  * Annex-B start-code walk, raw AVCC length walk, and now the real
  * container, all emitting the same [[H264AnnexB.FrameSpan]] shape
  * across the external-decoder seam.
  *
  * Strictness (the sniff contract, like [[H264Avcc]]): `ftyp` must be
  * the first box; box sizes must walk their container EXACTLY; the
  * sample table must be internally consistent (stsc runs cover the
  * chunk list, stsz count matches, every range in-bounds). Anything
  * else is None, never a half-parse — junk and the other two H.264
  * framings cannot false-positive here.
  *
  * Only the first video track with a complete sample table is
  * indexed (the sampler's per-asset contract is one frame stream);
  * codec extradata (e.g. the `avcC` record inside `stsd`/`avc1`) is
  * exposed by offset so the decoder seam can hand it over with every
  * sampled range.
  */
object Mp4Index {

  /** One parsed box: payload range (header excluded), fourcc type,
    * and the box's own first byte (`hdrStart` — fragment runs address
    * samples relative to the enclosing `moof`'s first byte under
    * default-base-is-moof).
    */
  final case class Box(fourcc: String, payloadStart: Int, payloadEnd: Int,
      hdrStart: Int)

  private val Containers =
    Set("moov", "trak", "mdia", "minf", "stbl")

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "ISO-8859-1")

  /** Walk one container level [start, end). None on any size that
    * does not tile the container exactly. `size == 0` ("extends to the
    * end of the file", §4.2) is only legal for the LAST TOP-LEVEL box —
    * honoring it inside moov/stbl would let a malformed child swallow
    * its siblings, so nested levels refuse it (`topLevel = false`, the
    * default).
    */
  def boxes(b: Array[Byte], start: Int, end: Int,
      topLevel: Boolean = false): Option[IndexedSeq[Box]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Box]
    var i = start
    while (i < end) {
      if (i + 8 > end) return None
      var size = u32(b, i)
      var hdr = 8
      if (size == 1) {
        if (i + 16 > end) return None
        size = u64(b, i + 8); hdr = 16
      } else if (size == 0) {
        if (!topLevel) return None // only the last top-level box may
        size = (end - i).toLong    // extend to the end
      }
      if (size < hdr || i + size > end) return None
      out += Box(fourcc(b, i + 4), i + hdr, (i + size).toInt, i)
      i += size.toInt
    }
    Some(out.toIndexedSeq)
  }

  private def child(b: Array[Byte], box: Box,
      name: String): Option[Box] =
    boxes(b, box.payloadStart, box.payloadEnd)
      .flatMap(_.find(_.fourcc == name))

  /** The parsed sample table of the first VIDEO track that has a
    * complete one: per-sample absolute byte ranges + 1-based sync
    * numbers + the stsd first-entry fourcc (codec) + the codec-config
    * record payload range (`avcC` for avc1/avc3/avc4, `hvcC` for
    * hev1/hvc1 — the out-of-band extradata the decoder seam needs).
    */
  final case class SampleTable(offsets: Array[Long], sizes: Array[Long],
      sync: Set[Int], codec: String, avcC: Option[(Int, Int)])

  /** Sample-entry fourccs that denote a VIDEO codec (ISO 14496-15
    * AVC/HEVC families + the MP4/WebM registry's common entries) —
    * the fallback track filter when a trak carries no `hdlr` box.
    */
  private val VideoFourccs = Set(
    "avc1", "avc3", "avc4", "hev1", "hvc1", "mp4v", "encv",
    "vp08", "vp09", "av01", "mjpg")
  /** AVC sample entries that carry an `avcC` record (avc3/avc4 are the
    * in-band-parameter-set variants — the record is still present, its
    * SPS/PPS lists just may be empty, §5.4.2.1.2). */
  private val AvcFourccs = Set("avc1", "avc3", "avc4")
  /** HEVC sample entries; extradata lives in an `hvcC` record. */
  private val HevcFourccs = Set("hev1", "hvc1")

  /** The codec-config box fourcc a sample-entry format carries:
    * `avcC`/`hvcC` (ISO 14496-15), `av1C` (AV1-ISOBMFF §2.3) for
    * `av01`, `vpcC` (VP Codec ISO binding §8) for `vp08`/`vp09` —
    * the modern-open-video extradata the round-12 routing indexed
    * frames WITHOUT. None for formats whose config is in-band only. */
  private[multimodal] def configBoxFor(fmt: String): Option[String] =
    if (AvcFourccs(fmt)) Some("avcC")
    else if (HevcFourccs(fmt)) Some("hvcC")
    else if (fmt == "av01") Some("av1C")
    else if (fmt == "vp08" || fmt == "vp09") Some("vpcC")
    else None

  /** A trak's declared handler_type (`mdia/hdlr` byte 8-11, §8.4.3) —
    * None when the box is absent or too short. */
  private def handlerType(b: Array[Byte], mdia: Box): Option[String] =
    child(b, mdia, "hdlr").collect {
      case h if h.payloadEnd - h.payloadStart >= 12 =>
        fourcc(b, h.payloadStart + 8)
    }

  def sampleTable(b: Array[Byte]): Option[SampleTable] =
    sampleTable(b, b.length.toLong)

  /** As [[sampleTable]] with the containing FILE length decoupled from
    * the parsed array: the seekable path loads only `moov` into memory
    * while sample offsets address the whole (possibly >2 GiB) file, so
    * span bounds validate against `boundLen`, not `b.length`.
    *
    * Track selection: only traks whose `mdia/hdlr` handler_type is
    * `vide` are eligible — a real MP4 with the audio trak FIRST must
    * not emit audio sample ranges as frames. When `hdlr` is absent
    * (minimal muxes) the stsd sample-entry fourcc must be a known
    * video format instead; a trak that declares a non-video handler is
    * skipped outright.
    */
  private def sampleTableIn(b: Array[Byte], top: IndexedSeq[Box],
      boundLen: Long): Option[SampleTable] =
    top.filter(_.fourcc == "moov").iterator
      .flatMap(m => sampleTableInMoov(b, m.payloadStart, m.payloadEnd,
        boundLen))
      .nextOption()

  /** stsd first entry of one stbl: vf(4) entry_count(4) then sample
    * entries (size(4) format(4) ...); the codec-config child box
    * ([[configBoxFor]]: avcC/hvcC/av1C/vpcC) sits after the fixed
    * 78-byte VisualSampleEntry fields (§12.1.3). For avc3/avc4
    * (in-band parameter sets) the record is still present, its
    * SPS/PPS lists just may be empty. Returns (format fourcc,
    * config payload range). */
  private def stsdCodecConfig(b: Array[Byte], stbl: Box)
      : (String, Option[(Int, Int)]) =
    child(b, stbl, "stsd") match {
      case Some(c) if c.payloadEnd - c.payloadStart >= 16 =>
        val fmt = fourcc(b, c.payloadStart + 12)
        val entryStart = c.payloadStart + 8
        val entryEnd = math.min(
          entryStart + u32(b, entryStart).toInt, c.payloadEnd)
        val cfg = configBoxFor(fmt).filter(_ => entryStart + 86 <= entryEnd)
          .flatMap { name =>
            boxes(b, entryStart + 86, entryEnd).toSeq.flatten
              .find(_.fourcc == name)
              .map(x => (x.payloadStart, x.payloadEnd))
          }
        (fmt, cfg)
      case _ => ("", None)
    }

  /** The selected video track's stsd format fourcc + codec-config
    * payload range WITHOUT requiring a complete sample table — the
    * stsd rides `moov` in plain AND fragmented (CMAF init-segment)
    * files alike, so codec-config extraction must not fall over on a
    * file whose samples live in `moof` runs. Same strictness and
    * track selection as [[sampleTable]] (ftyp first, exact top-level
    * tiling, hdlr=='vide' with the fourcc fallback).
    */
  def videoCodecInfo(b: Array[Byte]): Option[(String, Option[(Int, Int)])] = {
    val topOpt = boxes(b, 0, b.length, topLevel = true)
    if (topOpt.isEmpty) return None
    val top = topOpt.get
    if (top.isEmpty || top.head.fourcc != "ftyp") return None
    top.filter(_.fourcc == "moov").iterator
      .flatMap(m => codecInfoInMoov(b, m.payloadStart, m.payloadEnd))
      .nextOption()
  }

  /** The codec walk inside ONE moov payload range — shared by the
    * in-memory and seekable paths (config spans are relative to `b`,
    * which the seekable caller maps back to file offsets). */
  private def codecInfoInMoov(b: Array[Byte], start: Int, end: Int)
      : Option[(String, Option[(Int, Int)])] =
    boxes(b, start, end).toSeq.flatten
      .filter(_.fourcc == "trak")
      .flatMap { trak =>
        child(b, trak, "mdia").toSeq.flatMap { mdia =>
          val handler = handlerType(b, mdia)
          if (handler.exists(_ != "vide")) Seq.empty
          else child(b, mdia, "minf")
            .flatMap(minf => child(b, minf, "stbl"))
            .map(stbl => (stsdCodecConfig(b, stbl), handler.isDefined))
            .toSeq
        }
      }
      .collectFirst {
        case ((fmt, cfg), declared)
          if fmt.nonEmpty && (declared || VideoFourccs(fmt)) =>
          (fmt, cfg)
      }

  /** [[videoCodecInfo]] for a seekable (>2 GiB) asset: top-level box
    * headers + moov payload(s) only — the stsd rides moov whether the
    * samples are plain or fragmented, so codec-config extraction for
    * a movie-length file costs the same kilobytes as the frame index.
    * Returns the config record BYTES (copied out of the detached
    * moov) rather than spans — the caller has no array to slice.
    */
  def videoCodecInfoSeekable(r: RangeReader,
      maxMoovBytes: Int = 1 << 28)
      : Option[(String, Option[Array[Byte]])] = {
    val len = r.length
    var pos = 0L
    var first = true
    val moovs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var moovBytes = 0L
    while (pos < len) {
      if (pos + 8 > len) return None
      val hdr = r.readFully(pos, if (pos + 16 <= len) 16 else 8)
      var size = u32(hdr, 0)
      var hl = 8
      if (size == 1) {
        if (hdr.length < 16) return None
        size = u64(hdr, 8); hl = 16
      } else if (size == 0) size = len - pos
      if (size < hl || size > len - pos) return None
      val fc = fourcc(hdr, 4)
      if (first && fc != "ftyp") return None
      first = false
      if (fc == "moov") {
        val payloadLen = size - hl
        moovBytes += payloadLen
        if (moovBytes > maxMoovBytes) return None
        moovs += r.readFully(pos + hl, payloadLen.toInt)
      }
      pos += size
    }
    if (first) return None // empty file
    moovs.iterator
      .flatMap { b =>
        codecInfoInMoov(b, 0, b.length).map { case (fmt, cfg) =>
          (fmt, cfg.map { case (s, e) =>
            java.util.Arrays.copyOfRange(b, s, e)
          })
        }
      }
      .nextOption()
  }

  /** The video sample table inside ONE moov payload range — shared by
    * the in-memory walk and the seekable path (which hands in the
    * moov payload as its own array with `boundLen` = the file size).
    */
  private[multimodal] def sampleTableInMoov(b: Array[Byte], start: Int,
      end: Int, boundLen: Long): Option[SampleTable] = {
    val candidates = boxes(b, start, end).toSeq.flatten
      .filter(_.fourcc == "trak")
      .flatMap { trak =>
        child(b, trak, "mdia").toSeq.flatMap { mdia =>
          val handler = handlerType(b, mdia)
          if (handler.exists(_ != "vide")) Seq.empty
          else child(b, mdia, "minf")
            .flatMap(minf => child(b, minf, "stbl"))
            .map(stbl => (stbl, handler.isDefined))
            .toSeq
        }
      }
    candidates.iterator.flatMap { case (stbl, declaredVideo) =>
      parseStbl(b, stbl, boundLen)
        .filter(t => declaredVideo || VideoFourccs(t.codec))
    }.nextOption()
  }

  def sampleTable(b: Array[Byte], boundLen: Long): Option[SampleTable] = {
    val topOpt = boxes(b, 0, b.length, topLevel = true)
    if (topOpt.isEmpty) return None
    val top = topOpt.get
    if (top.isEmpty || top.head.fourcc != "ftyp") return None
    sampleTableIn(b, top, boundLen)
  }

  /** The movie timescale + duration from `moov/mvhd` (§8.2.2, v0
    * u32 fields / v1 u64) — duration analytics for a video corpus
    * without touching a sample: `duration / timescale` seconds.
    * None when mvhd is absent/short or the timescale is zero. */
  def movieDuration(b: Array[Byte]): Option[(Long, Long)] = {
    val topOpt = boxes(b, 0, b.length, topLevel = true)
    if (topOpt.isEmpty) return None
    val top = topOpt.get
    if (top.isEmpty || top.head.fourcc != "ftyp") return None
    top.filter(_.fourcc == "moov").iterator.flatMap { m =>
      child(b, m, "mvhd").flatMap { h =>
        val len = h.payloadEnd - h.payloadStart
        if (len < 4) None
        else {
          val v = b(h.payloadStart) & 0xff
          if (v == 0 && len >= 24) {
            val ts = u32(b, h.payloadStart + 12)
            val dur = u32(b, h.payloadStart + 16)
            if (ts > 0) Some((ts, dur)) else None
          } else if (v == 1 && len >= 32) {
            val ts = u32(b, h.payloadStart + 20)
            val dur = u64(b, h.payloadStart + 24)
            if (ts > 0 && dur >= 0) Some((ts, dur)) else None
          } else None
        }
      }
    }.nextOption()
  }

  // ---- audio track (M4A / the audio side of an A/V MP4) ----

  /** The audio sample table of an ISO-BMFF asset: per-sample byte
    * spans plus the AudioSampleEntry facts a pipeline needs without
    * decode (codec fourcc, channel count, sample rate — §12.2.3). */
  final case class AudioTable(offsets: Array[Long], sizes: Array[Long],
      codec: String, sampleRateHz: Int, channels: Int)

  private val AudioFourccs = Set("mp4a", "Opus", "fLaC", "alac",
    "ac-3", "ec-3", ".mp3", "sowt", "twos")

  /** The codec-config box an AUDIO sample-entry format carries:
    * `esds` (MPEG-4 descriptors → AudioSpecificConfig) for `mp4a`,
    * `dOps` (OpusSpecificBox) for `Opus`; `fLaC` carries `dfLa`
    * (FLAC STREAMINFO — not parsed here; the FLAC family owns that
    * format). None for raw-PCM entries. */
  def audioConfigBoxFor(fmt: String): Option[String] =
    if (fmt == "mp4a") Some("esds")
    else if (fmt == "Opus") Some("dOps")
    else None

  /** The selected AUDIO track's stsd format fourcc, entry-declared
    * (rate, channels), and codec-config payload span — the audio twin
    * of [[videoCodecInfo]]: stsd-only, so fragmented (init-segment)
    * files work, and no sample table is required. Same track
    * selection as [[audioSampleTable]] (hdlr=='soun' with the fourcc
    * fallback). */
  def audioCodecInfo(b: Array[Byte])
      : Option[(String, Int, Int, Option[(Int, Int)])] = {
    val topOpt = boxes(b, 0, b.length, topLevel = true)
    if (topOpt.isEmpty) return None
    val top = topOpt.get
    if (top.isEmpty || top.head.fourcc != "ftyp") return None
    top.filter(_.fourcc == "moov").iterator.flatMap { m =>
      boxes(b, m.payloadStart, m.payloadEnd).toSeq.flatten
        .filter(_.fourcc == "trak")
        .flatMap { trak =>
          child(b, trak, "mdia").toSeq.flatMap { mdia =>
            val handler = handlerType(b, mdia)
            if (handler.exists(_ != "soun")) Seq.empty
            else child(b, mdia, "minf")
              .flatMap(minf => child(b, minf, "stbl"))
              .flatMap(stbl => child(b, stbl, "stsd"))
              .map(c => (c, handler.isDefined))
              .toSeq
          }
        }
        .flatMap { case (c, declared) =>
          if (c.payloadEnd - c.payloadStart < 16) None
          else {
            val fmt = fourcc(b, c.payloadStart + 12)
            if (!(declared || AudioFourccs(fmt))) None
            else {
              val entryStart = c.payloadStart + 8
              val entryEnd = math.min(
                entryStart + u32(b, entryStart).toInt, c.payloadEnd)
              // AudioSampleEntry fixed fields: channels at +24, rate
              // 16.16 at +32, children after +36 (§12.2.3). An entry
              // TRUNCATED below the fixed fields still names its
              // codec — report the fourcc with unspecified fields
              // (the video twin's posture) instead of flagging the
              // whole asset as non-ISO-BMFF
              if (entryStart + 36 > entryEnd) Some((fmt, -1, -1, None))
              else {
                val channels = u16(b, entryStart + 24)
                val rate = u16(b, entryStart + 32)
                val cfg = audioConfigBoxFor(fmt).flatMap { name =>
                  boxes(b, entryStart + 36, entryEnd).toSeq.flatten
                    .find(_.fourcc == name)
                    .map(x => (x.payloadStart, x.payloadEnd))
                }
                Some((fmt, rate, channels, cfg))
              }
            }
          }
        }
    }.nextOption()
  }

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** The audio twin of [[sampleTableInMoov]]: trak eligibility by
    * `mdia/hdlr` == 'soun' (a known audio stsd fourcc as the no-hdlr
    * fallback — the same posture as the video path), sample spans
    * through the SAME strict [[parseStbl]] arithmetic, then the
    * AudioSampleEntry fields: channelcount at entry+24, samplerate as
    * 16.16 fixed at entry+32 (§12.2.3). A zero/absurd rate or channel
    * count refuses (corrupt entry). */
  private[multimodal] def audioTableInMoov(b: Array[Byte], start: Int,
      end: Int, boundLen: Long): Option[AudioTable] = {
    val candidates = boxes(b, start, end).toSeq.flatten
      .filter(_.fourcc == "trak")
      .flatMap { trak =>
        child(b, trak, "mdia").toSeq.flatMap { mdia =>
          val handler = handlerType(b, mdia)
          if (handler.exists(_ != "soun")) Seq.empty
          else child(b, mdia, "minf")
            .flatMap(minf => child(b, minf, "stbl"))
            .map(stbl => (stbl, handler.isDefined))
            .toSeq
        }
      }
    candidates.iterator.flatMap { case (stbl, declaredAudio) =>
      parseStbl(b, stbl, boundLen)
        .filter(t => declaredAudio || AudioFourccs(t.codec))
        .flatMap { t =>
          child(b, stbl, "stsd").flatMap { c =>
            val entryStart = c.payloadStart + 8
            // AudioSampleEntry: 8 hdr + 8 SampleEntry + 8 reserved +
            // channelcount(2) samplesize(2) pre_defined(2) rsvd(2) +
            // samplerate(4, 16.16) → needs 36 bytes
            if (entryStart + 36 > c.payloadEnd) None
            else {
              val channels = u16(b, entryStart + 24)
              val rate = u16(b, entryStart + 32) // 16.16 integer part
              if (channels < 1 || channels > 64 || rate < 1) None
              else Some(AudioTable(t.offsets, t.sizes, t.codec, rate,
                channels))
            }
          }
        }
    }.nextOption()
  }

  /** The audio sample table of a byte-column asset ([[AudioTable]]).
    * Same top-level strictness as [[sampleTable]]. */
  def audioSampleTable(b: Array[Byte]): Option[AudioTable] = {
    val topOpt = boxes(b, 0, b.length, topLevel = true)
    if (topOpt.isEmpty) return None
    val top = topOpt.get
    if (top.isEmpty || top.head.fourcc != "ftyp") return None
    top.filter(_.fourcc == "moov").iterator
      .flatMap(m => audioTableInMoov(b, m.payloadStart, m.payloadEnd,
        b.length.toLong))
      .nextOption()
  }

  private def parseStbl(b: Array[Byte], stbl: Box,
      boundLen: Long): Option[SampleTable] = {
    val stsz = child(b, stbl, "stsz").getOrElse(return None)
    val stsc = child(b, stbl, "stsc").getOrElse(return None)
    val stco = child(b, stbl, "stco")
    val co64 = child(b, stbl, "co64")

    // Every count field below comes from attacker-controllable bytes:
    // read it as Long, REJECT negatives/overflows/short payloads, and
    // never size an allocation from it before the payload length has
    // vouched for it — a corrupt asset must yield None (one flagged
    // row downstream), never an exception that kills the Spark task.
    // stsz: vf(4) sample_size(4) count(4) [sizes]
    if (stsz.payloadEnd - stsz.payloadStart < 12) return None
    val uniform = u32(b, stsz.payloadStart + 4)
    val nSamplesL = u32(b, stsz.payloadStart + 8)
    // more samples than bytes in the asset is inconsistent by itself.
    // boundLen can exceed Int.MaxValue on the seekable path, so the
    // count must ALSO be capped before `.toInt` and before any
    // count-sized allocation: 2^26 matches the non-uniform branch's
    // implicit bound (4 bytes/sample in an stsz payload capped by the
    // 256 MB max moov read) and is ~31 days of 25 fps video — a
    // claimed count above it is corrupt or adversarial, and a
    // driver-killing OOM from a few-KB moov must be impossible
    if (nSamplesL <= 0 || nSamplesL > boundLen ||
        nSamplesL > (1L << 26)) return None
    // uniform-size tables get no payload-length vouch; the total byte
    // claim must at least fit the file
    if (uniform != 0 && uniform * nSamplesL > boundLen) return None
    val nSamples = nSamplesL.toInt
    val sizes: Array[Long] =
      if (uniform != 0) Array.fill(nSamples)(uniform)
      else {
        if (stsz.payloadEnd - (stsz.payloadStart + 12) < 4L * nSamples)
          return None
        Array.tabulate(nSamples)(i => u32(b, stsz.payloadStart + 12 + 4 * i))
      }

    // chunk offsets: stco (u32) or co64 (u64)
    val chunkOffsets: Array[Long] = (stco, co64) match {
      case (Some(c), _) =>
        if (c.payloadEnd - c.payloadStart < 8) return None
        val n = u32(b, c.payloadStart + 4)
        if (n < 0 || n > boundLen ||
            c.payloadEnd - (c.payloadStart + 8) < 4L * n) return None
        Array.tabulate(n.toInt)(i => u32(b, c.payloadStart + 8 + 4 * i))
      case (None, Some(c)) =>
        if (c.payloadEnd - c.payloadStart < 8) return None
        val n = u32(b, c.payloadStart + 4)
        if (n < 0 || n > boundLen ||
            c.payloadEnd - (c.payloadStart + 8) < 8L * n) return None
        Array.tabulate(n.toInt)(i => u64(b, c.payloadStart + 8 + 8 * i))
      case _ => return None
    }
    if (chunkOffsets.isEmpty) return None

    // stsc runs: (first_chunk, samples_per_chunk, sdi) — expand to a
    // per-chunk samples count, then per-sample (offset, size)
    if (stsc.payloadEnd - stsc.payloadStart < 8) return None
    val nRunsL = u32(b, stsc.payloadStart + 4)
    if (nRunsL <= 0 || nRunsL > boundLen ||
        stsc.payloadEnd - (stsc.payloadStart + 8) < 12L * nRunsL) return None
    val nRuns = nRunsL.toInt
    val runs = Array.tabulate(nRuns) { i =>
      val o = stsc.payloadStart + 8 + 12 * i
      (u32(b, o).toInt, u32(b, o + 4).toInt) // (first_chunk 1-based, spc)
    }
    if (runs.head._1 != 1 ||
        runs.exists(_._2 <= 0) ||
        runs.sliding(2).exists {
          case Array(a, c) => c._1 <= a._1
          case _ => false
        }) return None

    val offsets = new Array[Long](nSamples)
    var s = 0
    var chunk = 0
    var run = 0
    while (s < nSamples) {
      if (chunk >= chunkOffsets.length) return None // table inconsistent
      while (run + 1 < nRuns && chunk + 1 >= runs(run + 1)._1) run += 1
      val spc = runs(run)._2
      var off = chunkOffsets(chunk)
      var j = 0
      while (j < spc && s < nSamples) {
        offsets(s) = off
        // overflow-proof span check: compare against length - size
        // (an adversarial co64 offset near Long.MaxValue would wrap
        // `off + size` negative and slip past a sum-side check)
        if (offsets(s) < 0 || sizes(s) < 0 || sizes(s) > boundLen ||
            offsets(s) > boundLen - sizes(s)) return None
        off += sizes(s)
        s += 1; j += 1
      }
      chunk += 1
    }

    // stss sync numbers (1-based); absent = every sample is sync
    val sync: Set[Int] = child(b, stbl, "stss") match {
      case Some(c) =>
        if (c.payloadEnd - c.payloadStart < 8) return None
        val n = u32(b, c.payloadStart + 4)
        if (n < 0 || n > boundLen ||
            c.payloadEnd - (c.payloadStart + 8) < 4L * n) return None
        (0 until n.toInt)
          .map(i => u32(b, c.payloadStart + 8 + 4 * i).toInt).toSet
      case None => (1 to nSamples).toSet
    }

    val (codec, avcC) = stsdCodecConfig(b, stbl)
    Some(SampleTable(offsets, sizes, sync, codec, avcC))
  }

  /** Fragmented-MP4 (fMP4 / CMAF — the DASH/HLS capture shape,
    * §8.8): samples live in `[moof][mdat]` pairs, addressed by each
    * `traf`'s `tfhd` defaults + `trun` runs instead of a global
    * `stbl`. Per fragment: base = `tfhd` base-data-offset when
    * present, else the `moof`'s first byte (the spec's
    * default-base-is-moof flag AND its first-track legacy default
    * coincide there); each `trun` must carry an explicit data_offset
    * (strictness — implicit continuation across runs is refused, not
    * guessed); sample sizes come per-sample from the `trun` or from
    * the `tfhd` default; sync = the `sample_is_non_sync_sample` bit
    * (0x10000) CLEAR, sourced first_sample_flags → per-sample flags →
    * `tfhd` default → sync. Frame indexes continue across fragments.
    * Only the first `traf` per fragment is read (one frame stream per
    * asset, like [[sampleTable]]).
    */
  /** The track IDs the init segment's `moov` declares, with their
    * video-ness (`trak` → `tkhd` track_ID + `mdia/hdlr` == 'vide';
    * tkhd v1 shifts track_ID by the 64-bit timestamps, §8.3.2).
    * Empty when the moov carries no trak metadata (bare `mvex` init
    * shells) — fragment addressing then falls back to first-traf.
    */
  private def declaredTracks(b: Array[Byte],
      top: IndexedSeq[Box]): Seq[(Long, Boolean)] =
    top.filter(_.fourcc == "moov").flatMap(moov =>
      declaredTracksInMoov(b, moov.payloadStart, moov.payloadEnd))

  /** The declared tracks inside ONE moov payload range — shared with
    * the seekable path, which hands in the moov payload detached. */
  private def declaredTracksInMoov(b: Array[Byte], start: Int,
      end: Int): Seq[(Long, Boolean)] =
    boxes(b, start, end).toSeq.flatten
      .filter(_.fourcc == "trak")
      .flatMap { trak =>
        for {
          tkhd <- child(b, trak, "tkhd")
          if tkhd.payloadEnd - tkhd.payloadStart >= 24
          idAt = tkhd.payloadStart +
            (if ((b(tkhd.payloadStart) & 0xff) == 1) 20 else 12)
          if idAt + 4 <= tkhd.payloadEnd
          mdia <- child(b, trak, "mdia")
        } yield (u32(b, idAt), handlerType(b, mdia).contains("vide"))
      }

  def fragmentIndex(bytes: Array[Byte]): Option[IndexedSeq[FrameSpan]] = {
    val topOpt = boxes(bytes, 0, bytes.length, topLevel = true)
    if (topOpt.isEmpty) return None
    val top = topOpt.get
    if (top.isEmpty || top.head.fourcc != "ftyp") return None
    val moofs = top.filter(_.fourcc == "moof")
    if (moofs.isEmpty) return None
    // when the init segment declares tracks, only the VIDEO track's
    // trafs are read (an audio-track-first fragment must not emit
    // audio ranges as frames); an init segment that declares tracks
    // but no video one has no frame stream at all. Bare init shells
    // (no trak metadata, e.g. the synthetic fixtures) keep the legacy
    // first-traf addressing.
    val declared = declaredTracks(bytes, top)
    val videoIds = declared.collect { case (id, true) => id }.toSet
    if (declared.nonEmpty && videoIds.isEmpty) return None
    val spans = scala.collection.mutable.ArrayBuffer.empty[FrameSpan]
    var mi = 0
    while (mi < moofs.length) {
      val moof = moofs(mi)
      mi += 1
      moofVideoSpans(bytes, moof.payloadStart, moof.payloadEnd,
        moof.hdrStart.toLong, videoIds, bytes.length.toLong,
        spans.length) match {
        case None => return None
        case Some(ss) => ss.foreach(ls =>
          spans += FrameSpan(ls.frameIdx, ls.byteStart.toInt,
            ls.byteLen.toInt, ls.isIdr))
      }
    }
    if (spans.isEmpty) None else Some(spans.toIndexedSeq)
  }

  /** Spans of ONE moof's video traf, FILE-absolute: `b` holds (at
    * least) the moof payload at [payloadStart, payloadEnd);
    * `absMoofStart` is the moof's first byte's absolute offset (the
    * default-base-is-moof base), `boundLen` the addressable file
    * length. None = malformed (refuse the stream); an empty result =
    * this moof has no video traf (skipped). Shared by the in-memory
    * and seekable fragment walks.
    */
  private def moofVideoSpans(b: Array[Byte], payloadStart: Int,
      payloadEnd: Int, absMoofStart: Long, videoIds: Set[Long],
      boundLen: Long, startIdx: Int): Option[Seq[LongSpan]] = {
    val kidsOpt = boxes(b, payloadStart, payloadEnd)
    if (kidsOpt.isEmpty) return None
    def trafTrackId(tr: Box): Option[Long] =
      boxes(b, tr.payloadStart, tr.payloadEnd).toSeq.flatten
        .find(_.fourcc == "tfhd")
        .collect { case tf if tf.payloadEnd - tf.payloadStart >= 8 =>
          u32(b, tf.payloadStart + 4)
        }
    val trafs = kidsOpt.get.filter(_.fourcc == "traf")
    val trafOpt =
      if (videoIds.isEmpty) trafs.headOption
      else trafs.find(tr => trafTrackId(tr).exists(videoIds.contains))
    if (trafOpt.isEmpty && videoIds.isEmpty) return None
    if (trafOpt.isEmpty) return Some(Seq.empty) // no video traf: skip
    val spans = scala.collection.mutable.ArrayBuffer.empty[LongSpan]
    val tkidsOpt = boxes(b, trafOpt.get.payloadStart,
      trafOpt.get.payloadEnd)
    if (tkidsOpt.isEmpty) return None
    val tkids = tkidsOpt.get
    val tfhdOpt = tkids.find(_.fourcc == "tfhd")
    if (tfhdOpt.isEmpty) return None
    val tfhd = tfhdOpt.get
    // tfhd: vf(4) track_ID(4) [base-data-offset(8)][sdi(4)]
    //       [def-duration(4)][def-size(4)][def-flags(4)] — validate
    // the flag-implied length BEFORE any field read (corrupt bytes
    // must yield None, not an out-of-bounds read)
    if (tfhd.payloadEnd - tfhd.payloadStart < 8) return None
    val tf = u32(b, tfhd.payloadStart) & 0xffffff
    val tfhdNeed = 8 +
      (if ((tf & 0x01) != 0) 8 else 0) + (if ((tf & 0x02) != 0) 4 else 0) +
      (if ((tf & 0x08) != 0) 4 else 0) + (if ((tf & 0x10) != 0) 4 else 0) +
      (if ((tf & 0x20) != 0) 4 else 0)
    if (tfhd.payloadEnd - tfhd.payloadStart < tfhdNeed) return None
    var o = tfhd.payloadStart + 8
    val baseDataOffset: Option[Long] =
      if ((tf & 0x01) != 0) { val v = u64(b, o); o += 8; Some(v) }
      else None
    if ((tf & 0x02) != 0) o += 4
    if ((tf & 0x08) != 0) o += 4
    val defaultSize: Option[Long] =
      if ((tf & 0x10) != 0) { val v = u32(b, o); o += 4; Some(v) }
      else None
    val defaultFlags: Option[Long] =
      if ((tf & 0x20) != 0) { val v = u32(b, o); o += 4; Some(v) }
      else None
    val base = baseDataOffset.getOrElse(absMoofStart)
    val truns = tkids.filter(_.fourcc == "trun")
    var ti = 0
    while (ti < truns.length) {
      val trun = truns(ti)
      ti += 1
      if (trun.payloadEnd - trun.payloadStart < 8) return None
      val flags = u32(b, trun.payloadStart) & 0xffffff
      val nL = u32(b, trun.payloadStart + 4)
      // count > bytes is bogus outright; the 2^26 cap mirrors the
      // stsz rule — with zero per-sample row bytes (all-default
      // truns) the count alone drives the span loop, and a corrupt
      // one must not be able to allocate its way to an OOM on the
      // seekable path where boundLen exceeds any sane frame count
      if (nL < 0 || nL > boundLen || nL > (1L << 26)) return None
      val n = nL.toInt
      if ((flags & 0x01) == 0) return None // data_offset required
      val headNeed = 8 + 4 + (if ((flags & 0x04) != 0) 4 else 0)
      if (trun.payloadEnd - trun.payloadStart < headNeed) return None
      var p = trun.payloadStart + 8
      // data_offset is SIGNED per §8.8.8 but a negative one would
      // address sample bytes before the base (moof start / explicit
      // base-data-offset) — no real muxer emits that; reject at
      // parse time rather than relying on the later span check
      val dataOffset = u32(b, p).toInt
      if (dataOffset < 0) return None
      p += 4
      val firstFlags: Option[Long] =
        if ((flags & 0x04) != 0) { val v = u32(b, p); p += 4; Some(v) }
        else None
      val perDur = (flags & 0x100) != 0
      val perSize = (flags & 0x200) != 0
      val perFlags = (flags & 0x400) != 0
      val perCto = (flags & 0x800) != 0
      val rowBytes =
        4 * Seq(perDur, perSize, perFlags, perCto).count(identity)
      if (p + n.toLong * rowBytes > trun.payloadEnd) return None
      if (!perSize && defaultSize.isEmpty) return None
      var off = base + dataOffset
      var i = 0
      while (i < n) {
        var q = p + i * rowBytes
        if (perDur) q += 4
        val size: Long =
          if (perSize) { val v = u32(b, q); q += 4; v }
          else defaultSize.get
        val sFlags: Long =
          if (i == 0 && firstFlags.isDefined) firstFlags.get
          else if (perFlags) u32(b, q)
          else defaultFlags.getOrElse(0L)
        // overflow-proof (see parseStbl): an adversarial u64
        // base-data-offset near Long.MaxValue wraps `off + size`
        if (size <= 0 || size > boundLen || off < 0 ||
            off > boundLen - size) return None
        spans += LongSpan(startIdx + spans.length, off, size,
          (sFlags & 0x10000L) == 0L)
        off += size
        i += 1
      }
    }
    Some(spans.toSeq)
  }

  /** Frame spans straight from the sample table — every sample is an
    * AU by container contract; `isIdr` = listed in `stss` (or all,
    * when absent). Fragmented files (empty/absent `stbl`, samples in
    * `moof`/`mdat` pairs) fall through to [[fragmentIndex]].
    */
  def frameIndex(bytes: Array[Byte]): Option[IndexedSeq[FrameSpan]] =
    sampleTable(bytes).map { t =>
      t.offsets.indices.map(i =>
        FrameSpan(i, t.offsets(i).toInt, t.sizes(i).toInt,
          t.sync.contains(i + 1)))
    }.orElse(fragmentIndex(bytes))

  // ---- seekable (>2 GiB) indexing: the stbl path never needs mdat
  // bytes, so a movie-length file indexes from its box headers + the
  // moov alone — the in-row Array[Byte] walkers cap at the JVM's
  // 2 GiB array limit; this path has no such ceiling ----

  /** Seekable byte source: the seam between the header-only walk and
    * storage (local file, HDFS stream, object-store ranged GET). */
  trait RangeReader extends java.io.Closeable {
    def length: Long
    /** Exactly `len` bytes at absolute offset `at`. */
    def readFully(at: Long, len: Int): Array[Byte]
  }

  /** In-memory RangeReader over a byte array — lets the seekable
    * walkers serve as the single implementation for byte-column
    * assets too (one code path, no Int/Long twin drift). */
  final class BytesRangeReader(b: Array[Byte]) extends RangeReader {
    def length: Long = b.length.toLong
    def readFully(at: Long, len: Int): Array[Byte] = {
      // subtraction form: `at + len` wraps negative for a crafted
      // at near Long.MaxValue and would slip past a sum-side check
      require(at >= 0 && len >= 0 && at <= b.length - len,
        s"range [$at +$len) outside 0..${b.length}")
      java.util.Arrays.copyOfRange(b, at.toInt, at.toInt + len)
    }
    def close(): Unit = ()
  }

  /** Local-file RangeReader (java.io.RandomAccessFile). */
  final class FileRangeReader(path: String) extends RangeReader {
    private val raf = new java.io.RandomAccessFile(path, "r")
    def length: Long = raf.length()
    def readFully(at: Long, len: Int): Array[Byte] = {
      val out = new Array[Byte](len)
      raf.seek(at)
      raf.readFully(out)
      out
    }
    def close(): Unit = raf.close()
  }

  /** A frame span with 64-bit byte addressing — the seekable path's
    * twin of [[H264AnnexB.FrameSpan]]. */
  final case class LongSpan(frameIdx: Int, byteStart: Long, byteLen: Long,
      isIdr: Boolean)

  /** The video sample table of a seekable MP4, reading ONLY the
    * top-level box headers (8–16 bytes each) and the `moov` payload —
    * never `mdat`. Same strictness as [[sampleTable]]: ftyp first,
    * exact top-level tiling (size==0 honored as extends-to-end — this
    * IS the top level), table-internal consistency with sample spans
    * bounds-checked against the FILE length. `maxMoovBytes` caps the
    * one in-memory read (a real movie's moov is MBs; a "moov" clause
    * claiming gigabytes is corrupt or adversarial → None).
    */
  def sampleTableSeekable(r: RangeReader,
      maxMoovBytes: Int = 1 << 28): Option[SampleTable] = {
    val len = r.length
    var pos = 0L
    var first = true
    // ALL moov payloads, in order — the in-memory walk takes the
    // first moov that yields a video table, and the seekable path
    // must agree on multi-moov files. The cap is CUMULATIVE: a
    // hostile file of many near-cap "moov" boxes must not allocate
    // its way to an OOM either.
    val moovs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var moovBytes = 0L
    while (pos < len) {
      if (pos + 8 > len) return None
      val hdr = r.readFully(pos, if (pos + 16 <= len) 16 else 8)
      var size = u32(hdr, 0)
      var hl = 8
      if (size == 1) {
        if (hdr.length < 16) return None
        size = u64(hdr, 8); hl = 16
      } else if (size == 0) size = len - pos // last box: to end
      if (size < hl || size > len - pos) return None
      val fc = fourcc(hdr, 4)
      if (first && fc != "ftyp") return None
      first = false
      if (fc == "moov") {
        val payloadLen = size - hl
        moovBytes += payloadLen
        if (moovBytes > maxMoovBytes) return None
        moovs += r.readFully(pos + hl, payloadLen.toInt)
      }
      pos += size
    }
    if (first) return None // empty file
    moovs.iterator
      .flatMap(b => sampleTableInMoov(b, 0, b.length, boundLen = len))
      .nextOption()
  }

  /** Seekable FRAGMENTED walk — the DASH-merged full-movie shape
    * (one init + thousands of `[moof][mdat]` pairs, easily >2 GiB):
    * reads the moov payload(s) for track metadata and each moof
    * payload (KBs apiece) — never a byte of any mdat — and emits
    * file-absolute 64-bit spans via the same per-moof parser as the
    * in-memory walk. Same strictness; same video-traf routing.
    */
  def fragmentIndexSeekable(r: RangeReader,
      maxBoxBytes: Int = 1 << 28): Option[IndexedSeq[LongSpan]] = {
    val len = r.length
    var pos = 0L
    var first = true
    // moov(s) must PRECEDE the first moof (§8.8.4: movie fragments
    // extend the presentation the Movie Box declared) — which lets
    // each moof parse AND DROP as it streams by instead of buffering
    // all of them (a hostile file of back-to-back near-cap "moof"
    // boxes would otherwise accumulate gigabytes before parsing).
    // Cumulative moov bytes share one cap for the same reason.
    val moovs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var moovBytes = 0L
    var videoIds: Set[Long] = Set.empty
    var declaredAny = false
    var sawMoof = false
    val spans = scala.collection.mutable.ArrayBuffer.empty[LongSpan]
    while (pos < len) {
      if (pos + 8 > len) return None
      val hdr = r.readFully(pos, if (pos + 16 <= len) 16 else 8)
      var size = u32(hdr, 0)
      var hl = 8
      if (size == 1) {
        if (hdr.length < 16) return None
        size = u64(hdr, 8); hl = 16
      } else if (size == 0) size = len - pos
      if (size < hl || size > len - pos) return None
      val fc = fourcc(hdr, 4)
      if (first && fc != "ftyp") return None
      first = false
      if (fc == "moov") {
        if (sawMoof) return None // moofs shall follow the Movie Box
        val payloadLen = size - hl
        moovBytes += payloadLen
        if (moovBytes > maxBoxBytes) return None
        moovs += r.readFully(pos + hl, payloadLen.toInt)
      } else if (fc == "moof") {
        if (!sawMoof) {
          sawMoof = true
          val declared =
            moovs.toSeq.flatMap(b => declaredTracksInMoov(b, 0, b.length))
          declaredAny = declared.nonEmpty
          videoIds = declared.collect { case (id, true) => id }.toSet
          if (declaredAny && videoIds.isEmpty) return None
          moovs.clear() // parsed; never needed again
        }
        val payloadLen = size - hl
        if (payloadLen > maxBoxBytes) return None
        val payload = r.readFully(pos + hl, payloadLen.toInt)
        moofVideoSpans(payload, 0, payload.length, pos, videoIds,
          len, spans.length) match {
          case None => return None
          case Some(ss) => spans ++= ss
        }
      }
      pos += size
    }
    if (spans.isEmpty) None else Some(spans.toIndexedSeq)
  }

  /** 64-bit frame spans of a seekable MP4 — the sample-table walk
    * ([[sampleTableSeekable]]) with fragmented files falling through
    * to [[fragmentIndexSeekable]], mirroring [[frameIndex]].
    */
  def frameIndexSeekable(r: RangeReader,
      maxMoovBytes: Int = 1 << 28): Option[IndexedSeq[LongSpan]] =
    sampleTableSeekable(r, maxMoovBytes).map { t =>
      t.offsets.indices.map(i =>
        LongSpan(i, t.offsets(i), t.sizes(i), t.sync.contains(i + 1)))
    }.orElse(fragmentIndexSeekable(r, maxMoovBytes))

  /** Minimal-but-valid synthetic MP4 for specs: `ftyp` + `mdat`
    * holding the given samples (laid out in `chunks` groups) +
    * `moov/trak/mdia/minf/stbl` with stsd(avc1+avcC from
    * [[H264Avcc.encodeSynthetic]]'s record layout), stsz, stsc,
    * stco, stss. Offsets are absolute, so `mdat` precedes `moov`
    * like real muxers emit.
    */
  // ---- synthetic-encoder byte builders (shared by both encoders so
  // the fixtures' framing can never drift apart) ----
  private[multimodal] def box(name: String, payload: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + payload.length)
    out.putInt(8 + payload.length).put(name.getBytes("ISO-8859-1"))
      .put(payload)
    out.array()
  }
  private[multimodal] def full(name: String, payload: Array[Byte]): Array[Byte] =
    box(name, Array[Byte](0, 0, 0, 0) ++ payload)
  private[multimodal] def u32a(vs: Seq[Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => out.putInt(v.toInt))
    out.array()
  }
  private[multimodal] def u64a(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()

  /** moov bytes for a sample table addressing FILE-absolute 64-bit
    * offsets (`co64`, one sample per chunk) — the fixture builder for
    * seekable >2 GiB specs, where chunk offsets exceed any Int.
    */
  def encodeMoovCo64(offsets: Seq[Long], sizes: Seq[Long],
      syncSamples: Seq[Int]): Array[Byte] = {
    require(offsets.nonEmpty && offsets.length == sizes.length)
    val avccStream = H264Avcc.encodeSynthetic(Seq(true))
    val avccRecord = avccStream.take(
      H264Avcc.parseConfig(avccStream).get.headerLen)
    val avc1 = box("avc1", new Array[Byte](78) ++ box("avcC", avccRecord))
    val stsd = full("stsd", u32a(Seq(1L)) ++ avc1)
    val stsz = full("stsz",
      u32a(Seq(0L, sizes.length.toLong)) ++ u32a(sizes))
    val stsc = full("stsc", u32a(Seq(1L, 1L, 1L, 1L)))
    val co64 = full("co64", u32a(Seq(offsets.length.toLong)) ++
      offsets.toArray.flatMap(u64a))
    val stss = full("stss",
      u32a(Seq(syncSamples.length.toLong)) ++
        u32a(syncSamples.map(_.toLong)))
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ co64 ++ stss)
    box("moov",
      box("trak", box("mdia", hdlrBox("vide") ++ box("minf", stbl))))
  }

  /** hdlr box declaring `handler_type` (§8.4.3): vf + pre_defined +
    * type + 12 reserved + empty name. */
  private def hdlrBox(handler: String): Array[Byte] =
    full("hdlr", u32a(Seq(0L)) ++ handler.getBytes("ISO-8859-1") ++
      new Array[Byte](13))

  /** AudioSampleEntry payload (§12.2.3): 6 reserved + dri(2) +
    * 8 reserved, then channelcount(2) samplesize(2) pre_defined(2)
    * reserved(2) samplerate(4, 16.16 fixed) — 28 bytes. */
  private def audioEntryPayload(rate: Int, channels: Int): Array[Byte] =
    new Array[Byte](16) ++
      Array(((channels >> 8) & 0xff).toByte, (channels & 0xff).toByte,
        0, 16, 0, 0, 0, 0,
        ((rate >> 8) & 0xff).toByte, (rate & 0xff).toByte, 0, 0)
        .map(_.toByte)

  /** An AudioSampleEntry for fixtures: `fmt` box with the 28 fixed
    * bytes (rate/channels real) then an optional codec-config child
    * (`esds`/`dOps` + record payload). */
  def audioSampleEntryBox(fmt: String, rate: Int, channels: Int,
      config: Option[(String, Array[Byte])]): Array[Byte] =
    box(fmt, audioEntryPayload(rate, channels) ++
      config.map { case (n, p) => box(n, p) }.getOrElse(Array.empty[Byte]))

  /** Synthetic M4A (audio-only ISO-BMFF) for specs/oracles: `M4A `
    * ftyp + mdat + a single 'soun' trak whose stbl carries the given
    * sample sizes (chunked per `samplesPerChunk`) and an mp4a
    * AudioSampleEntry with real rate/channel fields (or the caller's
    * `audioEntry`, e.g. with an esds/dOps config child). */
  def encodeSyntheticM4a(samples: Seq[Array[Byte]], sampleRate: Int = 44100,
      channels: Int = 2, samplesPerChunk: Int = 2,
      audioEntry: Option[Array[Byte]] = None,
      udta: Array[Byte] = Array.empty): Array[Byte] = {
    require(samples.nonEmpty && samplesPerChunk > 0)
    val ftyp = box("ftyp",
      "M4A ".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0))
    val mdat = box("mdat", samples.flatten.toArray)
    val mdatPayloadAt = ftyp.length + 8
    val chunks = samples.indices.grouped(samplesPerChunk).toSeq
    val chunkOffsets = {
      var off = mdatPayloadAt.toLong
      chunks.map { c =>
        val o = off; off += c.map(samples(_).length.toLong).sum; o
      }
    }
    val mp4a = audioEntry.getOrElse(
      box("mp4a", audioEntryPayload(sampleRate, channels)))
    val stbl = box("stbl",
      full("stsd", u32a(Seq(1L)) ++ mp4a) ++
        full("stsz", u32a(Seq(0L, samples.length.toLong)) ++
          u32a(samples.map(_.length.toLong))) ++
        full("stsc", u32a(Seq(1L, 1L, samplesPerChunk.toLong, 1L))) ++
        full("stco", u32a(Seq(chunkOffsets.length.toLong)) ++
          u32a(chunkOffsets)))
    val moov = box("moov",
      box("trak", box("mdia", hdlrBox("soun") ++ box("minf", stbl))) ++
        udta)
    ftyp ++ mdat ++ moov
  }

  /** One iTunes-style metadata item (`moov/udta/meta/ilst`, the M4A
    * tag carriage): the item's fourcc (`©nam`/`©ART`/`trkn`/`covr`…,
    * `©` per ISO-8859-1), the data atom's well-known type, the
    * rendered value (UTF-8 text for type 1; decimal for type-21
    * signed ints; `track/total` for `trkn`/`disk`'s packed layout),
    * and `binary = true` for payloads that are not text (cover art
    * etc. — value empty, the bytes are span material). */
  final case class Mp4Tag(itemIdx: Int, name: String, dataType: Int,
      value: String, binary: Boolean)

  /** The `ilst` tags of an ISO-BMFF file — the MP4/M4A sibling of
    * the ID3/Vorbis/FLAC/Matroska tag families. None when the bytes
    * are not a box-tiling file with a `moov`; Some(empty) when the
    * file carries no `udta/meta/ilst`; an ilst ITEM without a `data`
    * atom (or a malformed one) refuses the asset — the family's
    * no-half-parse rule. Text payloads above 64 KiB refuse (a
    * multi-MB "title" is corruption, not data). */
  def ilstTags(b: Array[Byte]): Option[Seq[Mp4Tag]] = {
    val top = boxes(b, 0, b.length, topLevel = true)
      .getOrElse(return None)
    val moov = top.find(_.fourcc == "moov").getOrElse(return None)
    // distinguish ABSENT (no tags — Some(Nil)) from CORRUPT (children
    // fail to tile — None): `child`'s Option conflates the two, and a
    // corrupt moov must flag here exactly as it does in every other
    // extractor over the same bytes
    val moovKids = boxes(b, moov.payloadStart, moov.payloadEnd)
      .getOrElse(return None)
    val udta = moovKids.find(_.fourcc == "udta")
      .getOrElse(return Some(Nil))
    val udtaKids = boxes(b, udta.payloadStart, udta.payloadEnd)
      .getOrElse(return None)
    val meta = udtaKids.find(_.fourcc == "meta")
      .getOrElse(return Some(Nil))
    // meta is a FULL box: 4 version/flags bytes precede its children
    if (meta.payloadEnd - meta.payloadStart < 4) return None
    val kids = boxes(b, meta.payloadStart + 4, meta.payloadEnd)
      .getOrElse(return None)
    val ilst = kids.find(_.fourcc == "ilst").getOrElse(return Some(Nil))
    val items = boxes(b, ilst.payloadStart, ilst.payloadEnd)
      .getOrElse(return None)
    val out = scala.collection.mutable.ArrayBuffer.empty[Mp4Tag]
    items.foreach { item =>
      // editing taggers leave `free`/`skip` padding inside ilst when
      // tags shrink — padding is not an item, never a refusal
      if (item.fourcc != "free" && item.fourcc != "skip") {
        val i = out.length
        val data = child(b, item, "data").getOrElse(return None)
        val ps = data.payloadStart
        val pe = data.payloadEnd
        if (pe - ps < 8) return None // type indicator + locale
        val dtype = ((b(ps + 1) & 0xff) << 16) |
          ((b(ps + 2) & 0xff) << 8) | (b(ps + 3) & 0xff)
        val vs = ps + 8
        val vLen = pe - vs
        val name = item.fourcc
        if (dtype == 1) { // UTF-8 text
          if (vLen > (1 << 16)) return None
          out += Mp4Tag(i, name, dtype,
            new String(b, vs, vLen, "UTF-8"), binary = false)
        } else if (dtype == 21 && vLen >= 1 && vLen <= 8) { // signed BE
          var v = if ((b(vs) & 0x80) != 0) -1L else 0L
          (vs until (vs + vLen)).foreach(j => v = (v << 8) | (b(j) & 0xff))
          out += Mp4Tag(i, name, dtype, v.toString, binary = false)
        } else if ((name == "trkn" || name == "disk") && vLen >= 6) {
          // packed layout: 2 zero, 2 index, 2 total(, 2 zero for trkn)
          val idx = ((b(vs + 2) & 0xff) << 8) | (b(vs + 3) & 0xff)
          val total = ((b(vs + 4) & 0xff) << 8) | (b(vs + 5) & 0xff)
          out += Mp4Tag(i, name, dtype, s"$idx/$total", binary = false)
        } else {
          out += Mp4Tag(i, name, dtype, "", binary = true)
        }
      }
    }
    Some(out.toSeq)
  }

  /** [[ilstTags]] for SEEKABLE (>2 GiB / distributed-FS) files: walk
    * the TOP-LEVEL box headers by 16-byte reads (mdat is skipped by
    * seek, never read), fetch the `moov` payload whole — kilobytes
    * to low megabytes regardless of file size, capped by
    * `maxMetaBytes` against hostile sizes — and run the ONE
    * in-memory parse on that slice (a moov slice is itself a valid
    * one-box file, so there is no twin implementation to drift).
    * None when the headers do not tile, no moov exists, or moov
    * exceeds the cap. */
  def ilstTagsSeekable(r: RangeReader,
      maxMetaBytes: Int = 1 << 26): Option[Seq[Mp4Tag]] = {
    val len = r.length
    var at = 0L
    var moov: Array[Byte] = null
    while (at < len) {
      if (len - at < 8) return None
      val hb = r.readFully(at, math.min(16L, len - at).toInt)
      var size = u32(hb, 0)
      var hdr = 8L
      if (size == 1) {
        if (hb.length < 16) return None
        size = u64(hb, 8); hdr = 16
      } else if (size == 0) {
        size = len - at // "extends to EOF": last-top-level, §4.2
      }
      if (size < hdr || size > len - at) return None
      if (fourcc(hb, 4) == "moov" && moov == null) {
        if (size > maxMetaBytes) return None
        moov = r.readFully(at, size.toInt)
      }
      at += size
    }
    if (moov == null) None else ilstTags(moov)
  }

  /** A `data` atom for [[ilstBox]] fixtures: type indicator +
    * zeroed locale + payload. */
  def ilstData(dataType: Int, payload: Array[Byte]): Array[Byte] =
    box("data", Array[Byte](0, ((dataType >> 16) & 0xff).toByte,
      ((dataType >> 8) & 0xff).toByte, (dataType & 0xff).toByte,
      0, 0, 0, 0) ++ payload)

  /** A `udta(meta(hdlr+ilst))` subtree for fixtures: one item box
    * per (fourcc, data atom bytes). Feed to [[encodeSyntheticM4a]]'s
    * `udta` parameter. */
  def ilstBox(items: Seq[(String, Array[Byte])]): Array[Byte] =
    box("udta", full("meta", hdlrBox("mdir") ++
      box("ilst", items.toArray.flatMap { case (n, d) => box(n, d) })))

  /** A VisualSampleEntry for fixtures: `fmt` box with the 78 fixed
    * bytes then an optional codec-config child (`avcC`/`hvcC`/
    * `av1C`/`vpcC` + record payload). */
  def videoSampleEntry(fmt: String,
      config: Option[(String, Array[Byte])]): Array[Byte] =
    box(fmt, new Array[Byte](78) ++
      config.map { case (n, p) => box(n, p) }.getOrElse(Array.empty[Byte]))

  def encodeSynthetic(samples: Seq[Array[Byte]], syncSamples: Seq[Int],
      samplesPerChunk: Int = 2, audioTrakFirst: Boolean = false,
      videoEntry: Option[Array[Byte]] = None): Array[Byte] = {
    require(samples.nonEmpty && samplesPerChunk > 0)
    val ftyp = box("ftyp",
      "isom".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0))
    val mdat = box("mdat", samples.flatten.toArray)
    val mdatPayloadAt = ftyp.length + 8
    val chunks = samples.indices.grouped(samplesPerChunk).toSeq
    val chunkOffsets = {
      var off = mdatPayloadAt.toLong
      chunks.map { c =>
        val o = off; off += c.map(samples(_).length.toLong).sum; o
      }
    }
    // avc1 VisualSampleEntry: 8 hdr + 78 fixed fields, then avcC —
    // unless the caller supplied its own entry (av01+av1C etc.)
    val entry = videoEntry.getOrElse {
      val avccStream = H264Avcc.encodeSynthetic(Seq(true))
      val avccRecord = avccStream.take(
        H264Avcc.parseConfig(avccStream).get.headerLen)
      videoSampleEntry("avc1", Some(("avcC", avccRecord)))
    }
    val stsd = full("stsd", u32a(Seq(1L)) ++ entry)
    val stsz = full("stsz",
      u32a(Seq(0L, samples.length.toLong)) ++
        u32a(samples.map(_.length.toLong)))
    val stsc = full("stsc", u32a(Seq(1L, 1L, samplesPerChunk.toLong, 1L)))
    val stco = full("stco",
      u32a(Seq(chunkOffsets.length.toLong)) ++ u32a(chunkOffsets))
    val stss = full("stss",
      u32a(Seq(syncSamples.length.toLong)) ++
        u32a(syncSamples.map(_.toLong)))
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco ++ stss)
    val videoTrak = box("trak",
      box("mdia", hdlrBox("vide") ++ box("minf", stbl)))
    // an optional LEADING audio trak with its own complete (1-sample)
    // sample table — the layout real muxers emit when audio is track 1;
    // an indexer without the hdlr filter would emit ITS ranges as frames
    val audioTrak = if (!audioTrakFirst) Array.empty[Byte] else {
      val mp4a = box("mp4a", audioEntryPayload(22050, 2))
      val aStbl = box("stbl",
        full("stsd", u32a(Seq(1L)) ++ mp4a) ++
          full("stsz", u32a(Seq(0L, 1L, samples.head.length.toLong))) ++
          full("stsc", u32a(Seq(1L, 1L, 1L, 1L))) ++
          full("stco", u32a(Seq(1L, mdatPayloadAt.toLong))))
      box("trak", box("mdia", hdlrBox("soun") ++ box("minf", aStbl)))
    }
    val moov = box("moov", audioTrak ++ videoTrak)
    ftyp ++ mdat ++ moov
  }

  /** Minimal synthetic FRAGMENTED MP4 for specs: `ftyp` +
    * `moov(mvex)` (no sample table — the fragmented signature) + one
    * `[moof][mdat]` pair per fragment. Each fragment's first sample
    * is sync (first_sample_flags = 0), the rest non-sync via the
    * `tfhd` default (0x10000) — the CMAF keyframe-per-segment shape.
    * `perSampleSizes` exercises trun-carried sizes vs the `tfhd`
    * default-sample-size (the latter requires uniform samples);
    * `explicitBase` exercises tfhd base-data-offset vs
    * default-base-is-moof addressing.
    */
  def encodeSyntheticFragmented(fragments: Seq[Seq[Array[Byte]]],
      perSampleSizes: Boolean = true,
      explicitBase: Boolean = false,
      audioTrackFirst: Boolean = false): Array[Byte] = {
    require(fragments.nonEmpty && fragments.forall(_.nonEmpty))
    val ftyp = box("ftyp", "cmfc".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 0))
    // `audioTrackFirst`: the init segment DECLARES tracks (tkhd +
    // hdlr) with audio as track 2 listed first, and every fragment
    // leads with the audio traf + a 4-byte audio sample at the mdat
    // head — the real muxed-media layout an indexer without traf
    // track-ID selection would misread as video frames
    def trakShell(id: Long, handler: String): Array[Byte] =
      box("trak",
        full("tkhd", u32a(Seq(0L, 0L, id, 0L, 0L))) ++
          box("mdia", hdlrBox(handler)))
    val audioLen = if (audioTrackFirst) 4 else 0
    val moov = box("moov",
      (if (audioTrackFirst)
        trakShell(2L, "soun") ++ trakShell(1L, "vide")
      else Array.empty[Byte]) ++ box("mvex", Array.empty[Byte]))
    var pos = ftyp.length + moov.length
    val parts = scala.collection.mutable.ArrayBuffer[Array[Byte]](ftyp, moov)
    fragments.zipWithIndex.foreach { case (samples, fi) =>
      if (!perSampleSizes)
        require(samples.map(_.length).distinct.size == 1,
          "default-sample-size needs uniform samples")
      val n = samples.length
      val tfhdFlags = (if (explicitBase) 0x01L else 0x20000L) |
        (if (perSampleSizes) 0L else 0x10L) | 0x20L
      val trunFlags = 0x01L | 0x04L | (if (perSampleSizes) 0x200L else 0L)
      val tfhdLen = 8 + 8 + (if (explicitBase) 8 else 0) +
        (if (perSampleSizes) 0 else 4) + 4
      val trunLen = 8 + 8 + 8 + (if (perSampleSizes) 4 * n else 0)
      // audio traf: tfhd(default-base-is-moof, default size+flags) 24
      // + trun(data_offset only) 20 + traf hdr 8
      val trafAudioLen = if (audioTrackFirst) 8 + 24 + 20 else 0
      val moofSize = 8 + 16 + trafAudioLen + 8 + tfhdLen + trunLen
      val mdatPayloadAt = pos + moofSize + 8
      val trafAudio = if (!audioTrackFirst) Array.empty[Byte] else
        box("traf",
          box("tfhd", u32a(Seq(0x20000L | 0x10L | 0x20L, 2L,
            audioLen.toLong, 0x10000L))) ++
            box("trun", u32a(Seq(0x01L, 1L, (moofSize + 8).toLong))))
      val tfhd = box("tfhd",
        u32a(Seq(tfhdFlags, 1L)) ++
          (if (explicitBase) u64a((mdatPayloadAt + audioLen).toLong)
           else Array.empty[Byte]) ++
          (if (perSampleSizes) Array.empty[Byte]
           else u32a(Seq(samples.head.length.toLong))) ++
          u32a(Seq(0x10000L))) // default flags: non-sync
      val trun = box("trun",
        u32a(Seq(trunFlags, n.toLong,
          if (explicitBase) 0L else (moofSize + 8 + audioLen).toLong,
          0L)) ++ // first_sample_flags: sync
          (if (perSampleSizes) u32a(samples.map(_.length.toLong))
           else Array.empty[Byte]))
      val mfhd = box("mfhd", u32a(Seq(0L, (fi + 1).toLong)))
      val moof = box("moof",
        mfhd ++ trafAudio ++ box("traf", tfhd ++ trun))
      require(moof.length == moofSize,
        s"moof size arithmetic drifted: ${moof.length} != $moofSize")
      val audioSample = Array.tabulate[Byte](audioLen)(j => (0x60 + j).toByte)
      val mdat = box("mdat", audioSample ++ samples.flatten.toArray)
      parts += moof
      parts += mdat
      pos += moof.length + mdat.length
    }
    parts.toArray.flatten
  }
}

