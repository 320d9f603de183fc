package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** [[ZipIndex]]: member spans must agree with the JDK's OWN
  * ZipOutputStream/ZipFile (a real external encoder + reader) and
  * the strict walk must refuse malformed archives.
  */
class ZipIndexSpec extends AnyFunSuite {

  private def zip(stored: Boolean, comment: String = "",
      members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    if (comment.nonEmpty) z.setComment(comment)
    members.foreach { case (name, data) =>
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(1700000000000L)
      if (stored) {
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(data.length.toLong)
        e.setCompressedSize(data.length.toLong)
        val c = new java.util.zip.CRC32(); c.update(data)
        e.setCrc(c.getValue)
      }
      z.putNextEntry(e); z.write(data); z.closeEntry()
    }
    z.close()
    out.toByteArray
  }

  private def members = Seq(
    ("0001.txt", Array.tabulate[Byte](100)(i => ((i * 7) & 0x7f).toByte)),
    ("sub/0002.bin", Array.tabulate[Byte](3)(i => i.toByte)),
    ("0003.dat", Array.tabulate[Byte](250)(i => ((i * 31) & 0x7f).toByte)))

  test("stored members: spans slice back to exact content; names/CRCs agree") {
    val b = zip(stored = true, members = members)
    val es = ZipIndex.entryIndex(b).get
    assert(es.map(_.name) === members.map(_._1))
    es.zip(members).foreach { case (z, (_, data)) =>
      assert(z.method === 0)
      assert(z.compLen === data.length.toLong)
      assert(z.uncompLen === data.length.toLong)
      assert(java.util.Arrays.copyOfRange(b, z.dataStart.toInt,
        (z.dataStart + z.compLen).toInt).sameElements(data))
      val c = new java.util.zip.CRC32(); c.update(data)
      assert(z.crc32 === c.getValue)
    }
  }

  test("deflated members: spans inflate back to the content; comment EOCD scan holds") {
    val b = zip(stored = false, comment = "PK corpus shard",
      members = members)
    val es = ZipIndex.entryIndex(b).get
    assert(es.map(_.name) === members.map(_._1))
    es.zip(members).foreach { case (z, (_, data)) =>
      assert(z.method === 8 && z.uncompLen === data.length.toLong)
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(b, z.dataStart.toInt, z.compLen.toInt)
      val buf = new Array[Byte](data.length + 16)
      val n = inf.inflate(buf)
      inf.end()
      assert(n === data.length &&
        java.util.Arrays.copyOfRange(buf, 0, n).sameElements(data))
    }
    // a comment containing the EOCD signature bytes must not divert
    // the tail scan (the comment-length consistency check arbitrates)
    val tricky = zip(stored = true, comment = "PKfake",
      members = members.take(1))
    assert(ZipIndex.entryIndex(tricky).get.map(_.name) === Seq("0001.txt"))
  }

  test("strictness: junk, truncation, broken signatures refuse") {
    assert(ZipIndex.entryIndex(Array[Byte](9, 9, 9)).isEmpty)
    assert(ZipIndex.entryIndex(Array.empty[Byte]).isEmpty)
    val b = zip(stored = true, members = members)
    // corrupt the central-directory signature of entry 0: the CD
    // starts after the last member's data — find the first PK\1\2
    val cdAt = b.indices.find(i => i + 4 <= b.length &&
      b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 1 &&
      b(i + 3) == 2).get
    val sigBad = b.clone(); sigBad(cdAt + 3) = 9
    assert(ZipIndex.entryIndex(sigBad).isEmpty)
    // truncating the tail kills the EOCD
    assert(ZipIndex.entryIndex(b.dropRight(3)).isEmpty)
    // a local-header signature flip refuses
    val c = b.clone(); c(0) = 'Q'
    assert(ZipIndex.entryIndex(c).isEmpty)
    // non-zip container bytes refuse
    assert(ZipIndex.entryIndex(Tar.encodeSynthetic(
      Seq(("x", Array[Byte](1, 2), 0L)))).isEmpty)
  }
}
