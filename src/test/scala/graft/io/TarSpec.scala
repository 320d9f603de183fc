package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** [[Tar]]: member spans must tile the 512-byte block grid with
  * validated checksums across plain/GNU-longname/PAX shapes, and the
  * strict walk must refuse malformed archives.
  */
class TarSpec extends AnyFunSuite {

  private def m(name: String, n: Int, mtime: Long = 1700000000L) =
    (name, Array.tabulate[Byte](n)(i => ((i * 37 + 1) & 0x7f).toByte),
      mtime)

  test("ustar members index at 512-block offsets with real checksums") {
    val b = Tar.encodeSynthetic(Seq(
      m("0001.jpg", 700), m("0001.txt", 40), m("0002.jpg", 512)))
    val es = Tar.entryIndex(b).get
    assert(es.map(_.name) === Seq("0001.jpg", "0001.txt", "0002.jpg"))
    // 700 B pads to 1024: entries at 512, 512+1024+512=2048, …
    assert(es.map(_.dataStart) === Seq(512L, 2048L, 3072L))
    assert(es.map(_.dataLen) === Seq(700L, 40L, 512L))
    assert(es.map(_.mtime).forall(_ == 1700000000L))
    assert(es.map(_.typeflag).forall(_ == '0'))
    // total: third member's data (3072..3584) + 2 zero blocks
    assert(b.length === 4608)
  }

  test("GNU long names and PAX path/size overrides apply to the NEXT member") {
    val long = "deep/" + ("d" * 120) + "/sample.jpg"
    val b = Tar.encodeSynthetic(Seq(
      m(long, 30), m("plain.txt", 10)))
    val es = Tar.entryIndex(b).get
    assert(es.map(_.name) === Seq(long, "plain.txt"))
    assert(es.head.dataLen === 30L)
    // PAX: the same long name via an 'x' header
    val p = Tar.encodeSynthetic(Seq(m(long, 30), m("plain.txt", 10)),
      paxFor = Set(long))
    val ps = Tar.entryIndex(p).get
    assert(ps.map(_.name) === Seq(long, "plain.txt"))
    assert(ps.head.dataLen === 30L)
  }

  test("the WebDataset key/ext split groups shard members") {
    assert(Tar.splitKey("00012.jpg") === ("00012", "jpg"))
    assert(Tar.splitKey("a/b/00012.seg.json") === ("a/b/00012", "seg.json"))
    assert(Tar.splitKey("a.dir/README") === ("a.dir/README", ""))
  }

  test("GNU magic ('ustar ') never reads the POSIX prefix field (atime lives there)") {
    val b = Tar.encodeSynthetic(Seq(m("clip.jpg", 64)))
    // rewrite the first header to oldgnu: magic "ustar  \0" and an
    // octal atime where POSIX keeps the prefix, then re-checksum
    val h = java.util.Arrays.copyOfRange(b, 0, 512)
    h(262) = ' '; h(263) = ' '; h(264) = 0
    "13261351760 ".getBytes("ISO-8859-1").copyToArray(h, 345)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L; h.foreach(x => sum += (x & 0xff))
    val cs = java.lang.Long.toOctalString(sum)
    (("0" * (6 - cs.length)) + cs).getBytes("ISO-8859-1").copyToArray(h, 148)
    h(154) = 0; h(155) = ' '
    val g = h ++ java.util.Arrays.copyOfRange(b, 512, b.length)
    val es = Tar.entryIndex(g).get
    assert(es.head.name === "clip.jpg",
      "the atime field must not be prepended as a bogus prefix")
  }

  test("base-256 sizes that wrap past Long refuse instead of mis-indexing") {
    val b = Tar.encodeSynthetic(Seq(m("x.bin", 100)))
    val h = java.util.Arrays.copyOfRange(b, 0, 512)
    h(124) = 0x81.toByte // base-256 marker, 2^88: wraps to 0 in a Long
    java.util.Arrays.fill(h, 125, 136, 0.toByte)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L; h.foreach(x => sum += (x & 0xff))
    val cs = java.lang.Long.toOctalString(sum)
    (("0" * (6 - cs.length)) + cs).getBytes("ISO-8859-1").copyToArray(h, 148)
    h(154) = 0; h(155) = ' '
    assert(Tar.entryIndex(
      h ++ java.util.Arrays.copyOfRange(b, 512, b.length)).isEmpty)
  }

  test("negative base-256 mtime (pre-1970) sign-extends like real tar readers") {
    // GNU base-256 is two's complement under the 0x80 flag: a
    // pre-1970 mtime encodes with leading 0xFF bytes. Decoding the
    // lead byte as '0x80 flag + magnitude' would yield a huge
    // positive mtime instead of the negative value.
    val b = Tar.encodeSynthetic(Seq(m("x.bin", 100)))
    val h = java.util.Arrays.copyOfRange(b, 0, 512)
    // mtime field (136..147): -86400 (one day before epoch) in
    // 12-byte big-endian two's complement
    java.util.Arrays.fill(h, 136, 148, 0xff.toByte)
    h(145) = 0xfe.toByte; h(146) = 0xae.toByte; h(147) = 0x80.toByte
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L; h.foreach(x => sum += (x & 0xff))
    val cs = java.lang.Long.toOctalString(sum)
    (("0" * (6 - cs.length)) + cs).getBytes("ISO-8859-1").copyToArray(h, 148)
    h(154) = 0; h(155) = ' '
    val es = Tar.entryIndex(
      h ++ java.util.Arrays.copyOfRange(b, 512, b.length)).get
    assert(es.head.mtime === -86400L)
    // a negative base-256 SIZE is still refused at the call site
    val h2 = java.util.Arrays.copyOfRange(b, 0, 512)
    java.util.Arrays.fill(h2, 124, 136, 0xff.toByte) // size = -1
    java.util.Arrays.fill(h2, 148, 156, ' '.toByte)
    var sum2 = 0L; h2.foreach(x => sum2 += (x & 0xff))
    val cs2 = java.lang.Long.toOctalString(sum2)
    (("0" * (6 - cs2.length)) + cs2).getBytes("ISO-8859-1").copyToArray(h2, 148)
    h2(154) = 0; h2(155) = ' '
    assert(Tar.entryIndex(
      h2 ++ java.util.Arrays.copyOfRange(b, 512, b.length)).isEmpty)
  }

  test("strictness: junk, bad checksum, truncation, partial terminator refuse") {
    assert(Tar.entryIndex(Array[Byte](9, 9, 9)).isEmpty)
    assert(Tar.entryIndex(new Array[Byte](511)).isEmpty)
    val b = Tar.encodeSynthetic(Seq(m("x.bin", 100)))
    assert(Tar.entryIndex(b).isDefined)
    // flip a header byte: the checksum catches it
    val c = b.clone(); c(10) = 'z'
    assert(Tar.entryIndex(c).isEmpty)
    // truncate inside the terminator
    assert(Tar.entryIndex(b.dropRight(700)).isEmpty)
    // a PARTIAL block after the terminator refuses
    assert(Tar.entryIndex(b ++ new Array[Byte](511)).isEmpty)
    // …but whole zero blocks after it are fine (block-padded tars)
    assert(Tar.entryIndex(b ++ new Array[Byte](1024)).get.length === 1)
    // a terminator-less archive whose entries tile EXACTLY to EOF is
    // accepted (streamed tars are often cut that way); one that ends
    // mid-grid refuses above
    assert(Tar.entryIndex(b.dropRight(1024)).get.length === 1)
  }
}
