package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[MpegTs]]: the PAT→PMT→PES walk must place every unit boundary
  * at its PUSI packet, carry PTS/random-access facts out of the
  * headers, and refuse everything that is not a CRC-valid
  * single-program transport stream.
  */
class MpegTsSpec extends AnyFunSuite {
  import MpegTs.SynthUnit

  private def payload(n: Int, i: Int): Array[Byte] =
    Array.tabulate[Byte](n)(j => ((i * 31 + j + 1) & 0x7f).toByte)

  test("PES units index at their PUSI packets with PTS and RA flags") {
    val b = MpegTs.encodeSynthetic(Seq(
      SynthUnit(0x100, payload(400, 0), pts = 90000L, randomAccess = true),
      SynthUnit(0x101, payload(50, 1), pts = 91000L, randomAccess = false),
      SynthUnit(0x100, payload(300, 2), pts = 93003L, randomAccess = false)))
    val got = MpegTs.unitIndex(b).get
    assert(got.length === 3)
    // packets: 0 PAT, 1 PMT, video unit 0 at pkts 2-4 (414 B PES →
    // 3 pkts), audio at pkt 5, video unit 1 at pkts 6-7 (314 B → 2).
    // Spans run to the next PUSI on the SAME pid, so the video-0
    // range includes the interleaved audio packet, and the audio
    // range runs to the stream end through video-1's packets.
    assert(got.map(_.byteStart) === Seq(2 * 188, 5 * 188, 6 * 188))
    assert(got.map(_.byteLen) === Seq(4 * 188, 3 * 188, 2 * 188))
    assert(got.map(_.nPackets) === Seq(3, 1, 2))
    assert(got.map(_.ptsTicks) === Seq(90000L, 91000L, 93003L))
    assert(got.map(_.isRandomAccess) === Seq(true, false, false))
    assert(got.map(_.pid) === Seq(0x100, 0x101, 0x100))
    assert(got.map(_.streamType) === Seq(0x1b, 0x0f, 0x1b))
    assert(got.map(_.isVideo) === Seq(true, false, true))
    assert(got.last.byteStart + got.last.byteLen === b.length)
    assert(b.length === 8 * 188)
  }

  test("an ffmpeg-style SDT packet before the PAT is skipped") {
    val b = MpegTs.encodeSynthetic(Seq(
      SynthUnit(0x100, payload(100, 0), pts = 0L, randomAccess = true),
      SynthUnit(0x100, payload(100, 1), pts = 3003L, randomAccess = false)),
      sdtFirst = true)
    val got = MpegTs.unitIndex(b).get
    assert(got.map(_.byteStart) === Seq(3 * 188, 4 * 188))
    assert(got.map(_.ptsTicks) === Seq(0L, 3003L))
  }

  test("a 33-bit PTS round-trips through the marker-bit encoding") {
    val big = (1L << 32) | 12345L
    val b = MpegTs.encodeSynthetic(Seq(
      SynthUnit(0x100, payload(10, 0), pts = big, randomAccess = true),
      SynthUnit(0x100, payload(10, 1), pts = big + 3003L,
        randomAccess = false)))
    assert(MpegTs.unitIndex(b).get.map(_.ptsTicks) ===
      Seq(big, big + 3003L))
  }

  test("seekable chunked walk agrees with the byte-column walk at every chunk size") {
    val b = MpegTs.encodeSynthetic(Seq(
      SynthUnit(0x100, payload(400, 0), pts = 90000L, randomAccess = true),
      SynthUnit(0x101, payload(50, 1), pts = 91000L, randomAccess = false),
      SynthUnit(0x100, payload(300, 2), pts = 93003L, randomAccess = false)))
    val whole = MpegTs.unitIndex(b).get
    // chunk sizes that split PES units, PSI packets, and the tail
    for (cp <- Seq(1, 2, 3, 5, 7, 100)) {
      var reads = 0
      val r = new Mp4Index.RangeReader {
        private val inner = new Mp4Index.BytesRangeReader(b)
        def length: Long = inner.length
        def readFully(at: Long, len: Int): Array[Byte] = {
          reads += 1; inner.readFully(at, len)
        }
        def close(): Unit = ()
      }
      val got = MpegTs.unitIndexSeekable(r, chunkPackets = cp).get
      assert(got.map(u => (u.byteStart, u.byteLen, u.pid, u.nPackets,
          u.ptsTicks, u.isRandomAccess)) ===
        whole.map(u => (u.byteStart.toLong, u.byteLen.toLong, u.pid,
          u.nPackets, u.ptsTicks, u.isRandomAccess)), s"chunkPackets=$cp")
      val expectReads = (8 + cp - 1) / cp // 8 packets in the stream
      assert(reads === expectReads, s"chunkPackets=$cp")
    }
  }

  test("strict sniff: junk, bad tiling, corrupt CRC/CC/sync refuse") {
    assert(MpegTs.unitIndex(Array[Byte](9, 9, 9)).isEmpty)
    assert(MpegTs.unitIndex(Array.empty[Byte]).isEmpty)
    val b = MpegTs.encodeSynthetic(Seq(
      SynthUnit(0x100, payload(400, 0), pts = 0L, randomAccess = true),
      SynthUnit(0x100, payload(300, 1), pts = 3003L, randomAccess = false)))
    // truncation off the 188 grid
    assert(MpegTs.unitIndex(b.dropRight(1)).isEmpty)
    // a flipped sync byte
    val c = b.clone; c(2 * 188) = 0x48
    assert(MpegTs.unitIndex(c).isEmpty)
    // a corrupted PAT CRC (the section sits at the END of packet 0,
    // after the stuffing adaptation field: 17 payload bytes)
    val d = b.clone; d(180) = (d(180) ^ 0x01).toByte
    assert(MpegTs.unitIndex(d).isEmpty)
    // a continuity break: drop one mid-unit continuation packet
    val e = b.take(3 * 188) ++ b.drop(4 * 188)
    assert(MpegTs.unitIndex(e).isEmpty)
    // transport_error_indicator set
    val f = b.clone; f(2 * 188 + 1) = (f(2 * 188 + 1) | 0x80).toByte
    assert(MpegTs.unitIndex(f).isEmpty)
    // fewer than 3 packets refuses even if well-formed
    assert(MpegTs.unitIndex(b.take(2 * 188)).isEmpty)
  }

  test("a declared PTS that cannot fit its PUSI packet refuses, not -1") {
    // a 172-byte adaptation field leaves room for the fixed PES
    // header (pl+9 fits) but not the declared 5-byte PTS (pl+14
    // straddles into the continuation packet) — recording pts=-1 for
    // a unit that DECLARED a timestamp would be a silent anomaly;
    // the walker's posture is None-on-anomaly
    val b = MpegTs.encodeSynthetic(Seq(
      SynthUnit(0x100, payload(100, 0), pts = 90000L, randomAccess = true)))
    val pkt = new Array[Byte](188)
    pkt(0) = 0x47
    pkt(1) = 0x41; pkt(2) = 0x00          // PUSI, pid 0x100
    pkt(3) = 0x30                          // af + payload, cc 0
    pkt(4) = 172.toByte                    // payload starts at p+177
    pkt(5) = 0x40                          // random-access flag
    java.util.Arrays.fill(pkt, 6, 177, 0xff.toByte)
    val pes = Array[Byte](0, 0, 1, 0xe0.toByte, 0, 8,
      0x80.toByte, 0x80.toByte, 5, 0x21, 0x00) // flags declare PTS; 2 of 5 bytes fit
    pes.copyToArray(pkt, 177)
    val mutated = b.take(2 * 188) ++ pkt   // keep PAT + PMT
    assert(MpegTs.unitIndex(mutated).isEmpty)
  }

  test("a CRC-valid but SHORT PMT section refuses, never reads past the packet") {
    // packet 0: a real PAT (pmtPid 0x1000); packet 1: a null packet
    // (PID 0x1FFF); packet 2 (the LAST — any out-of-bounds read would
    // run off the array): a PMT whose pointer_field pushes a minimal
    // 7-byte section (3-byte header + CRC over it, secLen=4) to the
    // exact packet end — psiSection accepts it, the PMT fixed part
    // does not fit, and the walk must refuse cleanly
    val real = MpegTs.encodeSynthetic(Seq(
      MpegTs.SynthUnit(0x100, payload(10, 0), pts = 0L,
        randomAccess = true),
      MpegTs.SynthUnit(0x100, payload(10, 1), pts = 1L,
        randomAccess = false)))
    val pat = real.take(188)
    val nul = new Array[Byte](188)
    nul(0) = 0x47; nul(1) = 0x1f; nul(2) = 0xff.toByte; nul(3) = 0x10
    java.util.Arrays.fill(nul, 4, 188, 0xff.toByte)
    val pmt = new Array[Byte](188)
    pmt(0) = 0x47; pmt(1) = 0x50; pmt(2) = 0x00; pmt(3) = 0x10
    pmt(4) = 176.toByte // pointer_field → section at offset 181
    java.util.Arrays.fill(pmt, 5, 181, 0xff.toByte)
    pmt(181) = 0x02; pmt(182) = 0xb0.toByte; pmt(183) = 0x04
    val crc = MpegTs.crc32(pmt, 181, 3)
    (0 until 4).foreach(j => pmt(184 + j) = ((crc >> (24 - 8 * j)) & 0xff).toByte)
    assert(MpegTs.unitIndex(pat ++ nul ++ pmt).isEmpty)
  }
}
