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
    * does not tile the container exactly.
    */
  def boxes(b: Array[Byte], start: Int, end: Int): Option[IndexedSeq[Box]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Box]
    var i = start
    while (i < end) {
      if (i + 8 > end) return None
      var size = u32(b, i)
      var hdr = 8
      if (size == 1) {
        if (i + 16 > end) return None
        size = u64(b, i + 8); hdr = 16
      } else if (size == 0) size = (end - i).toLong // last box: to end
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

  /** The parsed sample table of the first track that has a complete
    * one: per-sample absolute byte ranges + 1-based sync numbers +
    * the stsd first-entry fourcc (codec) + the avcC payload range if
    * the entry is avc1 (the out-of-band extradata the decoder seam
    * needs).
    */
  final case class SampleTable(offsets: Array[Long], sizes: Array[Long],
      sync: Set[Int], codec: String, avcC: Option[(Int, Int)])

  def sampleTable(b: Array[Byte]): Option[SampleTable] = {
    val topOpt = boxes(b, 0, b.length)
    if (topOpt.isEmpty) return None
    val top = topOpt.get
    if (top.isEmpty || top.head.fourcc != "ftyp") return None
    val stbls = top.filter(_.fourcc == "moov").flatMap { moov =>
      boxes(b, moov.payloadStart, moov.payloadEnd).toSeq.flatten
        .filter(_.fourcc == "trak")
        .flatMap { trak =>
          child(b, trak, "mdia")
            .flatMap(mdia => child(b, mdia, "minf"))
            .flatMap(minf => child(b, minf, "stbl"))
            .toSeq
        }
    }
    stbls.iterator.flatMap(parseStbl(b, _)).nextOption()
  }

  private def parseStbl(b: Array[Byte], stbl: Box): Option[SampleTable] = {
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
    // more samples than bytes in the asset is inconsistent by itself
    if (nSamplesL <= 0 || nSamplesL > b.length) return None
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
        if (n < 0 || n > b.length ||
            c.payloadEnd - (c.payloadStart + 8) < 4L * n) return None
        Array.tabulate(n.toInt)(i => u32(b, c.payloadStart + 8 + 4 * i))
      case (None, Some(c)) =>
        if (c.payloadEnd - c.payloadStart < 8) return None
        val n = u32(b, c.payloadStart + 4)
        if (n < 0 || n > b.length ||
            c.payloadEnd - (c.payloadStart + 8) < 8L * n) return None
        Array.tabulate(n.toInt)(i => u64(b, c.payloadStart + 8 + 8 * i))
      case _ => return None
    }
    if (chunkOffsets.isEmpty) return None

    // stsc runs: (first_chunk, samples_per_chunk, sdi) — expand to a
    // per-chunk samples count, then per-sample (offset, size)
    if (stsc.payloadEnd - stsc.payloadStart < 8) return None
    val nRunsL = u32(b, stsc.payloadStart + 4)
    if (nRunsL <= 0 || nRunsL > b.length ||
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
        if (offsets(s) < 0 || sizes(s) < 0 || sizes(s) > b.length ||
            offsets(s) > b.length - sizes(s)) return None
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
        if (n < 0 || n > b.length ||
            c.payloadEnd - (c.payloadStart + 8) < 4L * n) return None
        (0 until n.toInt)
          .map(i => u32(b, c.payloadStart + 8 + 4 * i).toInt).toSet
      case None => (1 to nSamples).toSet
    }

    // stsd first entry: vf(4) entry_count(4) then sample entries
    // (size(4) format(4) ...); avc1 carries avcC at a fixed 78-byte
    // offset into the entry (VisualSampleEntry layout, §12.1.3)
    val (codec, avcC) = child(b, stbl, "stsd") match {
      case Some(c) if c.payloadEnd - c.payloadStart >= 16 =>
        val fmt = fourcc(b, c.payloadStart + 12)
        val entryStart = c.payloadStart + 8
        val entryEnd = math.min(
          entryStart + u32(b, entryStart).toInt, c.payloadEnd)
        val cfg =
          if (fmt == "avc1" && entryStart + 86 <= entryEnd)
            boxes(b, entryStart + 86, entryEnd).toSeq.flatten
              .find(_.fourcc == "avcC")
              .map(x => (x.payloadStart, x.payloadEnd))
          else None
        (fmt, cfg)
      case _ => ("", None)
    }
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
  def fragmentIndex(bytes: Array[Byte]): Option[IndexedSeq[FrameSpan]] = {
    val topOpt = boxes(bytes, 0, bytes.length)
    if (topOpt.isEmpty) return None
    val top = topOpt.get
    if (top.isEmpty || top.head.fourcc != "ftyp") return None
    val moofs = top.filter(_.fourcc == "moof")
    if (moofs.isEmpty) return None
    val spans = scala.collection.mutable.ArrayBuffer.empty[FrameSpan]
    var mi = 0
    while (mi < moofs.length) {
      val moof = moofs(mi)
      mi += 1
      val kidsOpt = boxes(bytes, moof.payloadStart, moof.payloadEnd)
      if (kidsOpt.isEmpty) return None
      val trafOpt = kidsOpt.get.find(_.fourcc == "traf")
      if (trafOpt.isEmpty) return None
      val tkidsOpt = boxes(bytes, trafOpt.get.payloadStart,
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
      val tf = u32(bytes, tfhd.payloadStart) & 0xffffff
      val tfhdNeed = 8 +
        (if ((tf & 0x01) != 0) 8 else 0) + (if ((tf & 0x02) != 0) 4 else 0) +
        (if ((tf & 0x08) != 0) 4 else 0) + (if ((tf & 0x10) != 0) 4 else 0) +
        (if ((tf & 0x20) != 0) 4 else 0)
      if (tfhd.payloadEnd - tfhd.payloadStart < tfhdNeed) return None
      var o = tfhd.payloadStart + 8
      val baseDataOffset: Option[Long] =
        if ((tf & 0x01) != 0) { val v = u64(bytes, o); o += 8; Some(v) }
        else None
      if ((tf & 0x02) != 0) o += 4
      if ((tf & 0x08) != 0) o += 4
      val defaultSize: Option[Long] =
        if ((tf & 0x10) != 0) { val v = u32(bytes, o); o += 4; Some(v) }
        else None
      val defaultFlags: Option[Long] =
        if ((tf & 0x20) != 0) { val v = u32(bytes, o); o += 4; Some(v) }
        else None
      val base = baseDataOffset.getOrElse(moof.hdrStart.toLong)
      val truns = tkids.filter(_.fourcc == "trun")
      var ti = 0
      while (ti < truns.length) {
        val trun = truns(ti)
        ti += 1
        if (trun.payloadEnd - trun.payloadStart < 8) return None
        val flags = u32(bytes, trun.payloadStart) & 0xffffff
        val nL = u32(bytes, trun.payloadStart + 4)
        if (nL < 0 || nL > bytes.length) return None // count > bytes: bogus
        val n = nL.toInt
        if ((flags & 0x01) == 0) return None // data_offset required
        val headNeed = 8 + 4 + (if ((flags & 0x04) != 0) 4 else 0)
        if (trun.payloadEnd - trun.payloadStart < headNeed) return None
        var p = trun.payloadStart + 8
        val dataOffset = u32(bytes, p).toInt // signed, but ≥0 here
        p += 4
        val firstFlags: Option[Long] =
          if ((flags & 0x04) != 0) { val v = u32(bytes, p); p += 4; Some(v) }
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
            if (perSize) { val v = u32(bytes, q); q += 4; v }
            else defaultSize.get
          val sFlags: Long =
            if (i == 0 && firstFlags.isDefined) firstFlags.get
            else if (perFlags) u32(bytes, q)
            else defaultFlags.getOrElse(0L)
          // overflow-proof (see parseStbl): an adversarial u64
          // base-data-offset near Long.MaxValue wraps `off + size`
          if (size <= 0 || size > bytes.length || off < 0 ||
              off > bytes.length - size) return None
          spans += FrameSpan(spans.length, off.toInt, size.toInt,
            (sFlags & 0x10000L) == 0L)
          off += size
          i += 1
        }
      }
    }
    if (spans.isEmpty) None else Some(spans.toIndexedSeq)
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

  /** Minimal-but-valid synthetic MP4 for specs: `ftyp` + `mdat`
    * holding the given samples (laid out in `chunks` groups) +
    * `moov/trak/mdia/minf/stbl` with stsd(avc1+avcC from
    * [[H264Avcc.encodeSynthetic]]'s record layout), stsz, stsc,
    * stco, stss. Offsets are absolute, so `mdat` precedes `moov`
    * like real muxers emit.
    */
  // ---- synthetic-encoder byte builders (shared by both encoders so
  // the fixtures' framing can never drift apart) ----
  private def box(name: String, payload: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + payload.length)
    out.putInt(8 + payload.length).put(name.getBytes("ISO-8859-1"))
      .put(payload)
    out.array()
  }
  private def full(name: String, payload: Array[Byte]): Array[Byte] =
    box(name, Array[Byte](0, 0, 0, 0) ++ payload)
  private def u32a(vs: Seq[Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => out.putInt(v.toInt))
    out.array()
  }
  private def u64a(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()

  def encodeSynthetic(samples: Seq[Array[Byte]], syncSamples: Seq[Int],
      samplesPerChunk: Int = 2): Array[Byte] = {
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
    // avc1 VisualSampleEntry: 8 hdr + 78 fixed fields, then avcC
    val avccStream = H264Avcc.encodeSynthetic(Seq(true))
    val avccRecord = avccStream.take(
      H264Avcc.parseConfig(avccStream).get.headerLen)
    val avc1 = box("avc1", new Array[Byte](78) ++ box("avcC", avccRecord))
    val stsd = full("stsd", u32a(Seq(1L)) ++ avc1)
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
    val moov = box("moov", box("trak", box("mdia", box("minf", stbl))))
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
      explicitBase: Boolean = false): Array[Byte] = {
    require(fragments.nonEmpty && fragments.forall(_.nonEmpty))
    val ftyp = box("ftyp", "cmfc".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 0))
    val moov = box("moov", box("mvex", Array.empty[Byte]))
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
      val moofSize = 8 + 16 + 8 + tfhdLen + trunLen
      val mdatPayloadAt = pos + moofSize + 8
      val tfhd = box("tfhd",
        u32a(Seq(tfhdFlags, 1L)) ++
          (if (explicitBase) u64a(mdatPayloadAt.toLong)
           else Array.empty[Byte]) ++
          (if (perSampleSizes) Array.empty[Byte]
           else u32a(Seq(samples.head.length.toLong))) ++
          u32a(Seq(0x10000L))) // default flags: non-sync
      val trun = box("trun",
        u32a(Seq(trunFlags, n.toLong,
          if (explicitBase) 0L else (moofSize + 8).toLong,
          0L)) ++ // first_sample_flags: sync
          (if (perSampleSizes) u32a(samples.map(_.length.toLong))
           else Array.empty[Byte]))
      val mfhd = box("mfhd", u32a(Seq(0L, (fi + 1).toLong)))
      val moof = box("moof", mfhd ++ box("traf", tfhd ++ trun))
      require(moof.length == moofSize,
        s"moof size arithmetic drifted: ${moof.length} != $moofSize")
      val mdat = box("mdat", samples.flatten.toArray)
      parts += moof
      parts += mdat
      pos += moof.length + mdat.length
    }
    parts.toArray.flatten
  }
}
