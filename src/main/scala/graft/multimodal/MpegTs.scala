package graft.multimodal

/** MPEG TRANSPORT STREAM indexing (ISO/IEC 13818-1, public spec) —
  * the streaming-capture face of the decoder seam: HLS segments
  * (`.ts`), DVB/ATSC captures and most broadcast corpora are
  * transport streams, and a 100 TB video corpus needs the PES-unit
  * byte ranges (one per access unit as muxed), PTS timeline and
  * random-access points WITHOUT any in-JVM decode, so stride
  * sampling fetches only the chosen ranges and hands them to an
  * external decoder, and timeline/bitrate analytics are arithmetic
  * over the index.
  *
  * Structure walked: fixed 188-byte packets (§2.4.3.2, sync 0x47) →
  * PAT on PID 0 (§2.4.4.3, CRC-32 validated) → PMT (§2.4.4.8,
  * CRC-32 validated) → elementary-stream packets grouped into PES
  * units at `payload_unit_start_indicator` boundaries (§2.4.3.7),
  * with the PTS pulled from the PES header (marker bits validated)
  * and the keyframe flag from the adaptation field's
  * `random_access_indicator` (§2.4.3.5). PIDs outside the PMT (SDT,
  * NIT, null packets 0x1FFF) are skipped, as a demuxer does.
  *
  * Strictness (the family's sniff contract): the stream must tile
  * EXACTLY into ≥3 packets, every one opening 0x47 with its
  * transport_error_indicator clear; a CRC-valid PAT and PMT must be
  * present; continuity counters must advance mod 16 per PID on
  * payload-carrying elementary packets (duplicates refused — the
  * synthetic/real muxers this gate covers never emit them); and ≥1
  * PES unit must open with the 00 00 01 start code. The CRC-32 is
  * the MPEG variant: poly 0x04C11DB7, init 0xFFFFFFFF, unreflected,
  * no xorout — a section INCLUDING its stored CRC folds to 0. Every
  * count is bounds-checked; corrupt bytes yield None, never an
  * exception.
  */
object MpegTs {

  /** One indexed PES unit: the byte range from its first packet to
    * the next unit boundary on the SAME PID (the fetch unit for an
    * external demux+decode — contiguous as muxed, so packets of
    * other PIDs interleave inside it and the demuxer filters by
    * `pid`), with PID/stream-type routing facts, this PID's packet
    * count inside the range, the 90 kHz PTS (−1 when the PES header
    * carries none) and the random-access flag.
    */
  final case class TsUnit(unitIdx: Int, byteStart: Int, byteLen: Int,
      pid: Int, streamType: Int, nPackets: Int, ptsTicks: Long,
      isRandomAccess: Boolean, isVideo: Boolean)

  /** MPEG-PSI CRC-32 (Annex A): [[OggIndex.CrcTable]]'s unreflected
    * 0x04C11DB7 table with init 0xFFFFFFFF (Ogg inits at 0). */
  private[multimodal] def crc32(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0xffffffff
    var i = off
    while (i < off + len) {
      c = (c << 8) ^ OggIndex.CrcTable(((c >>> 24) ^ (b(i) & 0xff)) & 0xff)
      i += 1
    }
    c
  }

  /** Video per §2.4.4.9 stream_type: MPEG-1/2/4 video, H.264, HEVC. */
  private def isVideoType(st: Int): Boolean =
    st == 0x01 || st == 0x02 || st == 0x10 || st == 0x1b || st == 0x24
  /** Audio stream types: MPEG-1/2 audio, AAC (ADTS/LATM), AC-3. */
  private def isAudioType(st: Int): Boolean =
    st == 0x03 || st == 0x04 || st == 0x0f || st == 0x11 || st == 0x81

  /** Payload offset inside a packet at `p` (after the 4-byte header
    * and any adaptation field), or -1 when the packet carries no
    * payload or is malformed. Also exposes the random-access bit. */
  private def payloadStart(b: Array[Byte], p: Int): (Int, Boolean) = {
    val afc = (b(p + 3) >> 4) & 0x03
    if (afc == 0) return (-1, false) // reserved
    var off = p + 4
    var ra = false
    if (afc >= 2) { // adaptation field present
      val afLen = b(off) & 0xff
      if (off + 1 + afLen > p + 188) return (-1, false)
      if (afLen > 0) ra = (b(off + 1) & 0x40) != 0
      off += 1 + afLen
    }
    if (afc == 2) (-1, ra) // adaptation only, no payload
    else if (off >= p + 188) (-1, ra)
    else (off, ra)
  }

  /** Parse a PSI section from the payload of the packet at `p`
    * (pointer_field honored); returns (tableId, sectionBody) with the
    * CRC validated, where sectionBody spans the bytes AFTER the
    * 3-byte section header and BEFORE the CRC. Single-packet sections
    * only — PAT/PMT of the corpora this walks fit one packet. */
  private def psiSection(b: Array[Byte], p: Int): Option[(Int, Int, Int)] = {
    val (pl, _) = payloadStart(b, p)
    if (pl < 0) return None
    val ptr = b(pl) & 0xff
    val s = pl + 1 + ptr
    if (s + 3 > p + 188) return None
    val tableId = b(s) & 0xff
    if ((b(s + 1) & 0x80) == 0) return None // section_syntax_indicator
    val secLen = ((b(s + 1) & 0x0f) << 8) | (b(s + 2) & 0xff)
    if (s + 3 + secLen > p + 188) return None
    if (crc32(b, s, 3 + secLen) != 0) return None // §2.4.4 Annex A
    Some((tableId, s + 3, secLen))
  }

  /** [[TsUnit]] with 64-bit byte addressing — long broadcast/HLS
    * captures routinely exceed the JVM's 2 GiB array cap. */
  final case class TsUnitLong(unitIdx: Int, byteStart: Long, byteLen: Long,
      pid: Int, streamType: Int, nPackets: Int, ptsTicks: Long,
      isRandomAccess: Boolean, isVideo: Boolean)

  /** The PES-unit index over a seekable source — THE implementation
    * ([[unitIndex]] wraps byte columns in a [[Mp4Index.BytesRangeReader]]
    * so both paths share one walk). A single forward pass reads
    * `chunkPackets`-packet chunks (bounded memory for >2 GiB
    * captures; packets never straddle chunks because both sizes are
    * 188-multiples). One pass implies one ordering contract beyond
    * the object doc: the PAT must precede the PMT, which must
    * precede the first elementary PES unit — the layout every real
    * mux emits (a decoder joining the stream needs the tables before
    * the media). Deliberately STRICTER than ISO 13818-1 in one spot:
    * a PES header whose declared PTS does not fit its first TS
    * packet (an adaptation field stuffed past byte 174) refuses the
    * asset — the spec permits a PES header to span packets, but real
    * muxers never emit it, and recording pts=-1 for a unit that
    * DECLARED a timestamp would be a silent anomaly.
    */
  def unitIndexSeekable(r: Mp4Index.RangeReader,
      chunkPackets: Int = 5000): Option[IndexedSeq[TsUnitLong]] = {
    require(chunkPackets > 0)
    val total = r.length
    if (total < 3 * 188 || total % 188 != 0) return None
    val n = total / 188

    var pmtPid = -1
    val esTypes = scala.collection.mutable.Map.empty[Int, Int]
    final case class Open(startPkt: Long, pts: Long, ra: Boolean,
        var nPkts: Int)
    val open = scala.collection.mutable.Map.empty[Int, Open]
    val lastCc = scala.collection.mutable.Map.empty[Int, Int]
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Long, Boolean, Int)] // (startPkt, pid, pts, ra, n)
    val endPkt = scala.collection.mutable.Map.empty[Int, Long] // row → end
    def close(pid: Int, atPkt: Long): Unit = open.remove(pid).foreach { o =>
      rows += ((o.startPkt, pid, o.pts, o.ra, o.nPkts))
      endPkt(rows.length - 1) = atPkt
    }

    var k = 0L
    while (k < n) {
      val chunkLen = math.min(chunkPackets.toLong, n - k).toInt * 188
      val b = r.readFully(k * 188, chunkLen)
      var p = 0
      while (p < chunkLen) {
        if (b(p) != 0x47) return None
        if ((b(p + 1) & 0x80) != 0) return None // error indicator
        val pid = ((b(p + 1) & 0x1f) << 8) | (b(p + 2) & 0xff)
        val pusi = (b(p + 1) & 0x40) != 0
        if (pid == 0 && pusi && pmtPid < 0) {
          // PAT (§2.4.4.3): first PUSI packet on PID 0
          val (tid, body, secLen) = psiSection(b, p).getOrElse(return None)
          if (tid != 0x00) return None
          // body: tsid(2) ver(1) sec(1) last(1) then 4-byte rows
          var q = body + 5
          val end = body + secLen - 4
          while (pmtPid < 0 && q + 4 <= end) {
            val prog = ((b(q) & 0xff) << 8) | (b(q + 1) & 0xff)
            val mp = ((b(q + 2) & 0x1f) << 8) | (b(q + 3) & 0xff)
            if (prog != 0) pmtPid = mp // 0 = network PID, skip
            q += 4
          }
          if (pmtPid < 0) return None
        } else if (pid == pmtPid && pusi && esTypes.isEmpty) {
          // PMT (§2.4.4.8): stream_type → elementary PID table
          val (tid, body, secLen) = psiSection(b, p).getOrElse(return None)
          if (tid != 0x02) return None
          // body: prog(2) ver(1) sec(1) last(1) pcr(2) pinfoLen(2) —
          // a CRC-valid but SHORT section (secLen < fixed part + CRC)
          // must refuse, not read past the section/packet
          if (secLen < 13) return None
          val pinfoLen = ((b(body + 7) & 0x0f) << 8) | (b(body + 8) & 0xff)
          var q = body + 9 + pinfoLen
          val end = body + secLen - 4
          while (q + 5 <= end) {
            val st = b(q) & 0xff
            val epid = ((b(q + 1) & 0x1f) << 8) | (b(q + 2) & 0xff)
            val esLen = ((b(q + 3) & 0x0f) << 8) | (b(q + 4) & 0xff)
            if (isVideoType(st) || isAudioType(st)) esTypes(epid) = st
            q += 5 + esLen
          }
          if (esTypes.isEmpty) return None
        } else if (esTypes.contains(pid)) {
          val (pl, ra) = payloadStart(b, p)
          if (pl >= 0) {
            val cc = b(p + 3) & 0x0f
            lastCc.get(pid) match {
              case Some(prev) if ((prev + 1) & 0x0f) != cc => return None
              case _ =>
            }
            lastCc(pid) = cc
            open.get(pid).foreach { o => if (!pusi) o.nPkts += 1 }
            if (pusi) { // a new PES unit
              val pktIdx = k + p / 188
              close(pid, pktIdx)
              // PES start code 00 00 01 + stream_id
              if (pl + 6 > p + 188) return None
              if (b(pl) != 0 || b(pl + 1) != 0 || b(pl + 2) != 1)
                return None
              var pts = -1L
              // §2.4.3.7: A/V stream-ids carry the flags+PTS form
              if (pl + 9 <= p + 188 && (b(pl + 6) & 0xc0) == 0x80) {
                val ptsDts = (b(pl + 7) >> 6) & 0x03
                if ((ptsDts & 0x02) != 0) {
                  // declared PTS must FIT this packet: a large
                  // adaptation field could push the 5-byte PTS into
                  // the continuation packet, and recording -1 for a
                  // unit that declared a timestamp would be a silent
                  // anomaly — refuse, matching the walker's strict
                  // None-on-anomaly posture (real muxers never split
                  // the PES header across TS packets)
                  if (pl + 14 > p + 188) return None
                  val q = pl + 9
                  // marker bits: 0010/0011 + three 1-markers
                  if ((b(q) & 0xf0) != ((if (ptsDts == 3) 3 else 2) << 4) ||
                      (b(q) & 0x01) != 1 || (b(q + 2) & 0x01) != 1 ||
                      (b(q + 4) & 0x01) != 1) return None
                  pts = ((b(q) & 0x0eL) << 29) |
                    ((b(q + 1) & 0xffL) << 22) |
                    ((b(q + 2) & 0xfeL) << 14) |
                    ((b(q + 3) & 0xffL) << 7) | ((b(q + 4) & 0xffL) >> 1)
                }
              }
              open(pid) = Open(pktIdx, pts, ra, nPkts = 1)
            }
          }
        }
        p += 188
      }
      k += chunkLen / 188
    }
    if (pmtPid < 0 || esTypes.isEmpty) return None
    esTypes.keys.foreach(close(_, n))
    if (rows.isEmpty) return None
    val sorted = rows.zipWithIndex
      .sortBy { case ((startPkt, _, _, _, _), _) => startPkt }
    Some(sorted.zipWithIndex.map {
      case (((startPkt, pid, pts, ra, nPkts), origIdx), outIdx) =>
        TsUnitLong(outIdx, startPkt * 188,
          (endPkt(origIdx) - startPkt) * 188, pid, esTypes(pid), nPkts,
          pts, ra, isVideoType(esTypes(pid)))
    }.toIndexedSeq)
  }

  /** The PES-unit index of a byte-column asset: [[unitIndexSeekable]]
    * over an in-memory reader (one shared walk — no twin drift). */
  def unitIndex(b: Array[Byte]): Option[IndexedSeq[TsUnit]] =
    unitIndexSeekable(new Mp4Index.BytesRangeReader(b)).map(_.map(u =>
      TsUnit(u.unitIdx, u.byteStart.toInt, u.byteLen.toInt, u.pid,
        u.streamType, u.nPackets, u.ptsTicks, u.isRandomAccess,
        u.isVideo)))

  // ---------------------------------------------------------------
  // synthetic encoder (specs/oracles)
  // ---------------------------------------------------------------

  /** One PES unit to mux: ES payload bytes on `pid`, with a PTS and
    * the first packet's random_access_indicator. */
  final case class SynthUnit(pid: Int, payload: Array[Byte], pts: Long,
      randomAccess: Boolean)

  /** Synthetic single-program TS for specs/oracles: packet 0 PAT,
    * packet 1 PMT (H.264 video on `videoPid`, ADTS AAC audio on
    * `audioPid`), then each unit muxed as PUSI packet + 184-byte
    * continuation packets, stuffed via adaptation fields exactly as
    * real muxers stuff. Continuity counters and CRC-32s are real.
    * `sdtFirst` prepends the ffmpeg-style SDT packet (PID 0x11) that
    * a walker must skip.
    */
  def encodeSynthetic(units: Seq[SynthUnit], videoPid: Int = 0x100,
      audioPid: Int = 0x101, pmtPid: Int = 0x1000,
      sdtFirst: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val cc = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    def packet(pid: Int, pusi: Boolean, payload: Array[Byte],
        af: Option[Boolean]): Unit = {
      // af = Some(randomAccess) forces an adaptation field; stuffing
      // grows it so header+af+payload == 188 exactly
      val base = 4 + payload.length
      val needAf = af.isDefined || base < 188
      val hdr = new java.io.ByteArrayOutputStream()
      hdr.write(0x47)
      hdr.write((if (pusi) 0x40 else 0) | ((pid >> 8) & 0x1f))
      hdr.write(pid & 0xff)
      val c = cc(pid); cc(pid) = (c + 1) & 0x0f
      hdr.write((if (needAf) 0x30 else 0x10) | c)
      if (needAf) {
        val afLen = 188 - 4 - 1 - payload.length
        hdr.write(afLen)
        if (afLen > 0) {
          hdr.write(if (af.exists(identity)) 0x40 else 0x00)
          (0 until afLen - 1).foreach(_ => hdr.write(0xff))
        }
      }
      val pkt = hdr.toByteArray ++ payload
      require(pkt.length == 188, s"packet length ${pkt.length}")
      out.write(pkt)
    }
    def psi(pid: Int, tableId: Int, body: Array[Byte]): Unit = {
      val secLen = body.length + 4 // + CRC
      val sec = Array[Byte](tableId.toByte,
        (0xb0 | ((secLen >> 8) & 0x0f)).toByte, (secLen & 0xff).toByte) ++ body
      val crc = crc32(sec, 0, sec.length)
      val full = Array[Byte](0) ++ sec ++ Array( // pointer_field 0
        ((crc >> 24) & 0xff).toByte, ((crc >> 16) & 0xff).toByte,
        ((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte)
      packet(pid, pusi = true, full, af = None)
    }
    if (sdtFirst) {
      // ffmpeg writes an SDT (PID 0x11, table 0x42) before the PAT;
      // it is not PAT/PMT/elementary and must be skipped
      psi(0x11, 0x42, Array[Byte](0, 1, 0xc1.toByte, 0, 0, 0, 0,
        0xff.toByte))
    }
    // PAT: tsid=1, ver 0, program 1 → pmtPid
    psi(0, 0x00, Array[Byte](0, 1, 0xc1.toByte, 0, 0,
      0, 1, (0xe0 | ((pmtPid >> 8) & 0x1f)).toByte, (pmtPid & 0xff).toByte))
    // PMT: pcr=videoPid; H.264 on videoPid, ADTS AAC on audioPid
    psi(pmtPid, 0x02, Array[Byte](0, 1, 0xc1.toByte, 0, 0,
      (0xe0 | ((videoPid >> 8) & 0x1f)).toByte, (videoPid & 0xff).toByte,
      0xf0.toByte, 0,
      0x1b, (0xe0 | ((videoPid >> 8) & 0x1f)).toByte, (videoPid & 0xff).toByte,
      0xf0.toByte, 0,
      0x0f, (0xe0 | ((audioPid >> 8) & 0x1f)).toByte, (audioPid & 0xff).toByte,
      0xf0.toByte, 0))
    units.foreach { u =>
      // PES header: start code + stream_id + length + flags + PTS
      val sid = if (u.pid == audioPid) 0xc0 else 0xe0
      val pes = new java.io.ByteArrayOutputStream()
      pes.write(0); pes.write(0); pes.write(1); pes.write(sid)
      val pesLen = 3 + 5 + u.payload.length // hdr-flags+len+PTS+data
      pes.write((pesLen >> 8) & 0xff); pes.write(pesLen & 0xff)
      pes.write(0x80); pes.write(0x80); pes.write(5) // PTS only
      pes.write(0x20 | (((u.pts >> 30) & 0x07) << 1).toInt | 1)
      pes.write(((u.pts >> 22) & 0xff).toInt)
      pes.write((((u.pts >> 15) & 0x7f) << 1).toInt | 1)
      pes.write(((u.pts >> 7) & 0xff).toInt)
      pes.write(((u.pts & 0x7f) << 1).toInt | 1)
      pes.write(u.payload)
      val all = pes.toByteArray
      // first packet: adaptation field (random-access) + leading chunk
      val first = math.min(all.length, 188 - 4 - 2)
      packet(u.pid, pusi = true, all.take(first), af = Some(u.randomAccess))
      var done = first
      while (done < all.length) {
        val chunk = math.min(all.length - done, 184)
        packet(u.pid, pusi = false, all.slice(done, done + chunk),
          af = if (chunk < 184) Some(false) else None)
        done += chunk
      }
    }
    out.toByteArray
  }
}
