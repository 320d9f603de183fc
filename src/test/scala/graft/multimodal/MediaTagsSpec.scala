package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[MediaTags]]: ID3v2 frames across versions/encodings and FLAC
  * Vorbis comments must decode exactly; malformed tags refuse whole.
  */
class MediaTagsSpec extends AnyFunSuite {

  test("ID3v2.3 and v2.4 text frames across all four encodings") {
    val b3 = MediaTags.encodeId3(Seq(
      ("TIT2", "Night Drive", 0),
      ("TPE1", "Grüße — ünïcode", 1),   // UTF-16 with BOM
      ("TALB", "日本語", 3),             // UTF-8
      ("TLAN", "deu", 2)), v4 = false, padding = 17)
    val t3 = MediaTags.id3v2Tags(b3).get
    assert(t3.map(t => (t.key, t.value)) === Seq(
      ("TIT2", "Night Drive"), ("TPE1", "Grüße — ünïcode"),
      ("TALB", "日本語"), ("TLAN", "deu")))
    val b4 = MediaTags.encodeId3(Seq(("TIT2", "v4 sizing", 3)), v4 = true)
    assert(MediaTags.id3v2Tags(b4).get ===
      Seq(MediaTags.Tag("TIT2", "v4 sizing")))
    // the MP3 body after the tag still container-indexes
    assert(Mp3Frames.frameIndex(b3).isDefined)
    // dispatching parse tags the container
    assert(MediaTags.tags(b3).get._1 === "id3")
  }

  test("TXXX carries description as part of the key") {
    val payload = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(3) // UTF-8
      out.write("source".getBytes("UTF-8")); out.write(0)
      out.write("webcrawl".getBytes("UTF-8"))
      out.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes("ISO-8859-1"))
    out.write(3); out.write(0); out.write(0)
    val total = 10 + payload.length
    out.write((total >> 21) & 0x7f); out.write((total >> 14) & 0x7f)
    out.write((total >> 7) & 0x7f); out.write(total & 0x7f)
    out.write("TXXX".getBytes("ISO-8859-1"))
    (Seq(24, 16, 8, 0)).foreach(s => out.write((payload.length >> s) & 0xff))
    out.write(0); out.write(0)
    out.write(payload)
    val tags = MediaTags.id3v2Tags(out.toByteArray).get
    assert(tags === Seq(MediaTags.Tag("TXXX:source", "webcrawl")))
  }

  test("FLAC Vorbis comments: canonical upper keys, UTF-8 values, empty-tag presence") {
    val b = FlacIndex.encodeSynthetic(Seq((256, 30), (256, 40)),
      comments = Seq(("title", "Nocturne Op. 9"), ("Artist", "Chopin"),
        ("LANGUAGE", "pol")))
    val tags = MediaTags.flacTags(b).get
    assert(tags.map(t => (t.key, t.value)) === Seq(
      ("TITLE", "Nocturne Op. 9"), ("ARTIST", "Chopin"),
      ("LANGUAGE", "pol")))
    assert(MediaTags.tags(b).get._1 === "flac")
    // the frame walk still tiles with the comment block present
    assert(FlacIndex.frameIndex(b).isDefined)
    // a FLAC without the block: empty list, not a refusal
    val plain = FlacIndex.encodeSynthetic(Seq((256, 30), (256, 40)))
    assert(MediaTags.flacTags(plain).get.isEmpty)
  }

  test("extended headers are skipped (v2.3 and v2.4); unsynchronised tags refuse") {
    def tagWith(ver: Int, flags: Int, ext: Array[Byte],
        frame: Array[Byte]): Array[Byte] = {
      val body = ext ++ frame
      val out = new java.io.ByteArrayOutputStream()
      out.write("ID3".getBytes("ISO-8859-1"))
      out.write(ver); out.write(0); out.write(flags)
      out.write((body.length >> 21) & 0x7f)
      out.write((body.length >> 14) & 0x7f)
      out.write((body.length >> 7) & 0x7f); out.write(body.length & 0x7f)
      out.write(body)
      out.toByteArray
    }
    def tit2(v23: Boolean): Array[Byte] = {
      val vb = "x".getBytes("ISO-8859-1")
      val size = vb.length + 1
      val out = new java.io.ByteArrayOutputStream()
      out.write("TIT2".getBytes("ISO-8859-1"))
      if (v23) { out.write(0); out.write(0); out.write(0); out.write(size) }
      else { out.write(0); out.write(0); out.write(0); out.write(size) }
      out.write(0); out.write(0); out.write(0); out.write(vb)
      out.toByteArray
    }
    // v2.3 ext header: 4-byte size (EXCLUDES itself) = 6, then 6 bytes
    val ext23 = Array[Byte](0, 0, 0, 6, 0, 0, 0, 0, 0, 0)
    val t23 = MediaTags.id3v2Tags(tagWith(3, 0x40, ext23, tit2(true))).get
    assert(t23 === Seq(MediaTags.Tag("TIT2", "x")))
    // v2.4 ext header: synchsafe size INCLUDES itself (min 6)
    val ext24 = Array[Byte](0, 0, 0, 6, 1, 0)
    val t24 = MediaTags.id3v2Tags(tagWith(4, 0x40, ext24, tit2(false))).get
    assert(t24 === Seq(MediaTags.Tag("TIT2", "x")))
    // tag-level unsynchronisation rewrites frame sizes: refuse whole
    assert(MediaTags.id3v2Tags(
      tagWith(3, 0x80, Array.empty, tit2(true))).isEmpty)
  }

  private def opusStream(comments: Seq[(String, String)]): Array[Byte] =
    MediaTags.encodeOpusStream(comments)

  test("Ogg OpusTags comments assemble from pages and parse like FLAC's") {
    val b = opusStream(Seq(("title", "Waves"), ("ARTIST", "Sea")))
    assert(MediaTags.oggTags(b).get.map(t => (t.key, t.value)) ===
      Seq(("TITLE", "Waves"), ("ARTIST", "Sea")))
    assert(MediaTags.tags(b).get._1 === "ogg")
    // a comment SPLIT ACROSS PAGES (255-lacing continuation) still
    // assembles: make the tags packet 300 bytes so it laces 255+45
    val big = opusStream(Seq(("comment", "x" * 240)))
    assert(MediaTags.oggTags(big).get.head.value === "x" * 240)
    // a non-comment second packet is presence, not refusal
    val plain = OggIndex.encodeSynthetic(Seq(
      (Seq(Array.fill[Byte](19)(0x22)), 0L, true, false),
      (Seq(Array.fill[Byte](8)(0x33)), 960L, false, true)))
    assert(MediaTags.oggTags(plain).get.isEmpty)
    // corrupt a comment length: refuses whole
    val bad = opusStream(Seq(("k", "v")))
    val pages = OggIndex.pageIndex(bad).get
    val tagPage = pages(1)
    // the kv length field sits after magic(8)+vlen(4)+vendor(11)+cnt(4)
    val at = tagPage.byteStart + 27 + 1 + 8 + 4 + 11 + 4
    bad(at) = 100
    // the page CRC now fails -> whole-stream refusal (strict contract)
    assert(MediaTags.oggTags(bad).isEmpty)
  }

  test("strictness: junk, bad frame ids, truncated comments refuse") {
    assert(MediaTags.tags(Array[Byte](9, 9, 9, 9)).isEmpty)
    assert(MediaTags.tags(Array.empty[Byte]).isEmpty)
    // tag-less MP3: no ID3 header → None (tags ride the container)
    assert(MediaTags.id3v2Tags(
      Mp3Frames.encodeSynthetic(Seq((9, 0), (9, 0)))).isEmpty)
    // corrupt a frame id to lowercase: the walk refuses
    val b = MediaTags.encodeId3(Seq(("TIT2", "x", 0)))
    val bad = b.clone(); bad(10) = 't'
    assert(MediaTags.id3v2Tags(bad).isEmpty)
    // truncate a comment length claim past its block
    val f = FlacIndex.encodeSynthetic(Seq((256, 30), (256, 40)),
      comments = Seq(("K", "v")))
    // comment block body starts at 42+4: vendor len(4)+15+count(4);
    // bump the kv length field to overrun
    val kvLenAt = 42 + 4 + 4 + 15 + 4
    val g = f.clone(); g(kvLenAt) = 100
    assert(MediaTags.flacTags(g).isEmpty)
  }
}
