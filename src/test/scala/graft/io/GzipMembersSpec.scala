package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** [[GzipMembers]]: member spans must tile exactly with validated
  * CRC/ISIZE trailers, round-trip against real java.util.zip member
  * output, and refuse corrupt or truncated streams.
  */
class GzipMembersSpec extends AnyFunSuite {

  private def payloads = Seq(
    Array.tabulate[Byte](500)(i => ((i * 7) & 0x7f).toByte),
    Array.tabulate[Byte](3)(i => i.toByte),
    Array.tabulate[Byte](70000)(i => ((i * 31) & 0x7f).toByte))

  test("members tile exactly; spans slice back to inflatable members") {
    val gz = Warc.gzipPerRecord(payloads)
    val ms = GzipMembers.memberIndex(gz).get
    assert(ms.length === 3)
    assert(ms.head.compStart === 0L)
    ms.sliding(2).foreach { case Seq(a, c) =>
      assert(a.compStart + a.compLen === c.compStart)
    }
    assert(ms.last.compStart + ms.last.compLen === gz.length)
    assert(ms.map(_.uncompLen) === payloads.map(_.length.toLong))
    // each compressed span is independently inflatable — the ranged-
    // fetch contract a parallel fan-out depends on
    ms.zip(payloads).foreach { case (m, expect) =>
      val slice = java.util.Arrays.copyOfRange(gz, m.compStart.toInt,
        (m.compStart + m.compLen).toInt)
      val got = Warc.gunzipAll(slice).get
      assert(got.sameElements(expect))
    }
  }

  test("FNAME/FCOMMENT/FEXTRA headers walk; CRC and ISIZE damage refuse") {
    // a member with a filename header, as `gzip file` writes
    val named = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x1f, 0x8b, 8, 0x08, 0, 0, 0, 0, 0, 0)
        .map(_.toByte)) // FLG=FNAME
      out.write("hello.txt".getBytes("ISO-8859-1")); out.write(0)
      // splice the deflate body + trailer from a real member
      val real = Warc.gzipPerRecord(Seq(payloads.head))
      out.write(java.util.Arrays.copyOfRange(real, 10, real.length))
      out.toByteArray
    }
    val ms = GzipMembers.memberIndex(named).get
    assert(ms.length === 1 && ms.head.uncompLen === 500L)
    // flip a byte of the CRC trailer
    val gz = Warc.gzipPerRecord(Seq(payloads.head))
    val bad = gz.clone(); bad(gz.length - 6) = (bad(gz.length - 6) ^ 1).toByte
    assert(GzipMembers.memberIndex(bad).isEmpty)
    // truncate mid-deflate
    assert(GzipMembers.memberIndex(gz.dropRight(12)).isEmpty)
    // junk / empty refuse
    assert(GzipMembers.memberIndex(Array[Byte](9, 9)).isEmpty)
    assert(GzipMembers.memberIndex(Array.empty[Byte]).isEmpty)
    // trailing garbage after the last member refuses (tiling)
    assert(GzipMembers.memberIndex(gz ++ Array[Byte](1, 2, 3)).isEmpty)
  }
}
