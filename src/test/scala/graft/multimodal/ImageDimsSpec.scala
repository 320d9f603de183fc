package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[ImageDims]]: header-only dimensions must agree with the real
  * encoders (the JDK's ImageIO writes genuine PNG/JPEG/GIF/BMP — an
  * external-encoder check, not a self-referential fixture) and
  * refuse structurally broken bytes.
  */
class ImageDimsSpec extends AnyFunSuite {

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), fmt)
    out.toByteArray
  }

  test("PNG/JPEG/GIF/BMP dims agree with ImageIO-encoded images") {
    for ((fmt, w, h) <- Seq(("png", 31, 17), ("jpg", 63, 41),
        ("gif", 12, 7), ("bmp", 9, 5))) {
      val d = ImageDims.dims(encode(fmt, w, h)).get
      assert((d.width, d.height) === (w, h), fmt)
      assert(d.format === (if (fmt == "jpg") "jpeg" else fmt))
    }
    // progressive-ish: a JPEG with leading APP segments still finds
    // its SOF (ImageIO writes JFIF APP0 already — covered above)
  }

  test("WebP lossy/lossless/extended headers parse by hand-built bytes") {
    def riff(chunk: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("ISO-8859-1"))
      val total = 4 + 8 + payload.length
      (0 until 4).foreach(j => out.write((total >> (8 * j)) & 0xff))
      out.write("WEBP".getBytes("ISO-8859-1"))
      out.write(chunk.getBytes("ISO-8859-1"))
      (0 until 4).foreach(j => out.write((payload.length >> (8 * j)) & 0xff))
      out.write(payload)
      out.toByteArray
    }
    // VP8 lossy keyframe: 3-byte tag + 9D 01 2A + LE14 pair
    val lossy = riff("VP8 ", Array[Byte](0, 0, 0, 0x9d.toByte, 0x01,
      0x2a, 64, 0, 48, 0) ++ new Array[Byte](8))
    assert(ImageDims.dims(lossy).get === ImageDims.Dims("webp", 64, 48))
    // VP8L: 0x2F + packed (w-1, h-1) 14-bit fields: 99 and 49
    val bits = 99L | (49L << 14)
    val lossless = riff("VP8L", Array[Byte](0x2f,
      (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
      ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte) ++
      new Array[Byte](8))
    assert(ImageDims.dims(lossless).get === ImageDims.Dims("webp", 100, 50))
    // VP8X: 24-bit LE (canvas-1) pair: 299 × 199
    val ext = riff("VP8X", Array[Byte](0, 0, 0, 0,
      (299 & 0xff).toByte, ((299 >> 8) & 0xff).toByte, 0,
      (199 & 0xff).toByte, ((199 >> 8) & 0xff).toByte, 0))
    assert(ImageDims.dims(ext).get === ImageDims.Dims("webp", 300, 200))
  }

  private def be32(v: Int): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def bx(fourcc: String, parts: Array[Byte]*): Array[Byte] = {
    val payload = parts.flatten.toArray
    be32(8 + payload.length) ++ fourcc.getBytes("ISO-8859-1") ++ payload
  }

  test("AVIF/HEIC: the PRIMARY item's ispe wins over a leading thumbnail property") {
    for (wide <- Seq(false, true)) {
      val d = ImageDims.dims(ExternalFixtures.libavifStyleAvif(wide)).get
      assert(d === ImageDims.Dims("avif", 1280, 720), s"wideIdx=$wide")
    }
    // no pitm/ipma: minimal muxes fall back to the first ispe
    val minimal = {
      val ftyp = bx("ftyp", "mif1".getBytes("ISO-8859-1"), be32(0))
      val ipco = bx("ipco", bx("ispe", new Array[Byte](4),
        be32(320), be32(240)))
      ftyp ++ bx("meta", new Array[Byte](4), bx("iprp", ipco))
    }
    assert(ImageDims.dims(minimal).get === ImageDims.Dims("heif", 320, 240))
    // a VIDEO mp4 is not an image: brand gate refuses
    assert(ImageDims.dims(Mp4Index.encodeSynthetic(
      Seq(Array[Byte](1, 2, 3, 4)), syncSamples = Seq(1))).isEmpty)
  }

  private def exifJpeg(tiff: Array[Byte]): Array[Byte] = {
    val real = encode("jpg", 63, 41)
    val exif = "Exif".getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++ tiff
    val segLen = 2 + exif.length
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      ((segLen >> 8) & 0xff).toByte, (segLen & 0xff).toByte) ++
      exif ++ real.drop(2)
  }

  test("EXIF orientation parses in both byte orders; absent = 1") {
    // ImageIO writes no EXIF: upright
    assert(ImageDims.jpegOrientation(encode("jpg", 8, 8)) === 1)
    assert(ImageDims.jpegOrientation(encode("png", 8, 8)) === 1)
    assert(ImageDims.jpegOrientation(Array[Byte](9, 9)) === 1)
    // little-endian TIFF, orientation 6 (phone portrait)
    val le = exifJpeg(Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0,
      1, 0, 0x12, 0x01, 3, 0, 1, 0, 0, 0, 6, 0, 0, 0, 0, 0, 0, 0))
    assert(ImageDims.jpegOrientation(le) === 6)
    // big-endian TIFF, orientation 3
    val be = exifJpeg(Array[Byte]('M', 'M', 0, 42, 0, 0, 0, 8,
      0, 1, 0x01, 0x12, 0, 3, 0, 0, 0, 1, 0, 3, 0, 0, 0, 0, 0, 0))
    assert(ImageDims.jpegOrientation(be) === 3)
    // the dims walk still reads the spliced JPEG (APP1 skipped)
    assert(ImageDims.dims(le).get === ImageDims.Dims("jpeg", 63, 41))
    // an out-of-range value falls back to 1
    val bad = exifJpeg(Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0,
      1, 0, 0x12, 0x01, 3, 0, 1, 0, 0, 0, 9, 0, 0, 0, 0, 0, 0, 0))
    assert(ImageDims.jpegOrientation(bad) === 1)
  }

  test("strictness: junk, truncation, wrong-first-chunk PNG, SOF-less JPEG refuse") {
    assert(ImageDims.dims(Array[Byte](9, 9, 9, 9)).isEmpty)
    assert(ImageDims.dims(Array.empty[Byte]).isEmpty)
    assert(ImageDims.dims(null).isEmpty)
    val png = encode("png", 8, 8)
    // corrupt the IHDR tag: PNG refuses (and no other parser claims it)
    val bad = png.clone(); bad(12) = 'X'
    assert(ImageDims.dims(bad).isEmpty)
    // truncate a JPEG before its SOF
    val jpg = encode("jpg", 8, 8)
    assert(ImageDims.dims(jpg.take(12)).isEmpty)
    // media containers are not images
    assert(ImageDims.dims(
      Mp4Index.encodeSyntheticM4a(Seq(Array[Byte](1, 2)))).isEmpty)
    // a JPEG truncated INSIDE a fill-byte run: the fill loop advances
    // i past the loop-top bounds check — must refuse, never throw
    assert(ImageDims.dims(Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xc0)
      .map(_.toByte)).isEmpty)
    assert(ImageDims.dims(Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xff,
      0xff, 0xc0, 0x00).map(_.toByte)).isEmpty)
  }
}
