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

  /** One parsed box: payload range (header excluded) + fourcc type. */
  final case class Box(fourcc: String, payloadStart: Int, payloadEnd: Int)

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
      out += Box(fourcc(b, i + 4), i + hdr, (i + size).toInt)
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

    // stsz: vf(4) sample_size(4) count(4) [sizes]
    if (stsz.payloadEnd - stsz.payloadStart < 12) return None
    val uniform = u32(b, stsz.payloadStart + 4)
    val nSamples = u32(b, stsz.payloadStart + 8).toInt
    if (nSamples <= 0) return None
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
        val n = u32(b, c.payloadStart + 4).toInt
        if (c.payloadEnd - (c.payloadStart + 8) < 4L * n) return None
        Array.tabulate(n)(i => u32(b, c.payloadStart + 8 + 4 * i))
      case (None, Some(c)) =>
        val n = u32(b, c.payloadStart + 4).toInt
        if (c.payloadEnd - (c.payloadStart + 8) < 8L * n) return None
        Array.tabulate(n)(i => u64(b, c.payloadStart + 8 + 8 * i))
      case _ => return None
    }
    if (chunkOffsets.isEmpty) return None

    // stsc runs: (first_chunk, samples_per_chunk, sdi) — expand to a
    // per-chunk samples count, then per-sample (offset, size)
    val nRuns = u32(b, stsc.payloadStart + 4).toInt
    if (nRuns <= 0 ||
        stsc.payloadEnd - (stsc.payloadStart + 8) < 12L * nRuns) return None
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
        off += sizes(s)
        if (off > b.length || offsets(s) < 0) return None
        s += 1; j += 1
      }
      chunk += 1
    }

    // stss sync numbers (1-based); absent = every sample is sync
    val sync: Set[Int] = child(b, stbl, "stss") match {
      case Some(c) =>
        val n = u32(b, c.payloadStart + 4).toInt
        if (c.payloadEnd - (c.payloadStart + 8) < 4L * n) return None
        (0 until n).map(i => u32(b, c.payloadStart + 8 + 4 * i).toInt).toSet
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

  /** Frame spans straight from the sample table — every sample is an
    * AU by container contract; `isIdr` = listed in `stss` (or all,
    * when absent).
    */
  def frameIndex(bytes: Array[Byte]): Option[IndexedSeq[FrameSpan]] =
    sampleTable(bytes).map { t =>
      t.offsets.indices.map(i =>
        FrameSpan(i, t.offsets(i).toInt, t.sizes(i).toInt,
          t.sync.contains(i + 1)))
    }

  /** Minimal-but-valid synthetic MP4 for specs: `ftyp` + `mdat`
    * holding the given samples (laid out in `chunks` groups) +
    * `moov/trak/mdia/minf/stbl` with stsd(avc1+avcC from
    * [[H264Avcc.encodeSynthetic]]'s record layout), stsz, stsc,
    * stco, stss. Offsets are absolute, so `mdat` precedes `moov`
    * like real muxers emit.
    */
  def encodeSynthetic(samples: Seq[Array[Byte]], syncSamples: Seq[Int],
      samplesPerChunk: Int = 2): Array[Byte] = {
    require(samples.nonEmpty && samplesPerChunk > 0)
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(name.getBytes("ISO-8859-1"))
        .put(payload)
      out.array()
    }
    def full(name: String, payload: Array[Byte]): Array[Byte] =
      box(name, Array[Byte](0, 0, 0, 0) ++ payload)
    def u32a(vs: Seq[Long]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(v => out.putInt(v.toInt))
      out.array()
    }
    val ftyp = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 0))
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
}
