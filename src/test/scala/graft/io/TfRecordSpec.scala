package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** [[TfRecord]]: framing spans must tile with both masked CRC32Cs
  * validated per record; corrupt lengths, payloads, or truncations
  * refuse whole.
  */
class TfRecordSpec extends AnyFunSuite {

  private def payloads = Seq(
    Array.tabulate[Byte](100)(i => ((i * 7) & 0x7f).toByte),
    Array.tabulate[Byte](3)(i => i.toByte),
    Array.tabulate[Byte](250)(i => ((i * 31) & 0x7f).toByte))

  test("records tile exactly with validated masked CRC32Cs") {
    val b = TfRecord.encodeSynthetic(payloads)
    val rs = TfRecord.recordIndex(b).get
    assert(rs.map(r => (r.dataStart, r.dataLen)) ===
      Seq((12L, 100L), (128L, 3L), (147L, 250L)))
    assert(rs.last.dataStart + rs.last.dataLen + 4 === b.length)
    // each span slices back to its payload
    rs.zip(payloads).foreach { case (r, p) =>
      assert(java.util.Arrays.copyOfRange(b, r.dataStart.toInt,
        (r.dataStart + r.dataLen).toInt).sameElements(p))
    }
  }

  test("strictness: corrupt length CRC, payload CRC, truncation, junk refuse") {
    val b = TfRecord.encodeSynthetic(payloads)
    // flip a length byte: the length CRC catches it before the walk
    // can wander into payload bytes
    val c = b.clone(); c(0) = (c(0) ^ 1).toByte
    assert(TfRecord.recordIndex(c).isEmpty)
    // flip a payload byte: the data CRC catches it
    val d = b.clone(); d(50) = (d(50) ^ 1).toByte
    assert(TfRecord.recordIndex(d).isEmpty)
    // flip a stored data-CRC byte
    val e = b.clone(); e(113) = (e(113) ^ 1).toByte
    assert(TfRecord.recordIndex(e).isEmpty)
    assert(TfRecord.recordIndex(b.dropRight(1)).isEmpty)
    assert(TfRecord.recordIndex(Array[Byte](9, 9, 9)).isEmpty)
    assert(TfRecord.recordIndex(Array.empty[Byte]).isEmpty)
    // a tar/gzip is not a TFRecord
    assert(TfRecord.recordIndex(Warc.gzipPerRecord(
      Seq(payloads.head))).isEmpty)
  }
}
