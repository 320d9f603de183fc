package graft.multimodal

import java.awt.image.BufferedImage

/** Minimal MJPEG-in-AVI codec over plain JDK primitives: the RIFF/AVI
  * container is a public, fully-documented byte format and each frame
  * payload is an ordinary JPEG that `javax.imageio` can write and read
  * — which makes real video decode possible with zero external
  * libraries. The writer exists to generate deterministic fixtures
  * (and as a tiny encode sink); the reader is the production path:
  * [[frameChunks]] indexes frame byte-ranges WITHOUT decoding (one
  * linear header walk), so frame sampling decodes only the frames it
  * keeps — the access pattern that matters when a corpus row is a
  * multi-GB clip and the pipeline wants every Nth frame.
  *
  * Covers the reference's media-asset ingestion surface
  * (`data_extraction.py` treats assets as opaque files); the
  * frame-sample op itself is the LLM-pipeline extension.
  */
object AviMjpeg {

  // ---------------------------------------------------------- encode

  /** Encode frames as an MJPEG AVI ('00dc' JPEG chunks in a 'movi'
    * LIST, standard avih/strh/strf headers). All frames must share the
    * first frame's dimensions.
    */
  def encode(frames: Seq[BufferedImage], fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "encode: no frames")
    require(fps > 0, s"encode: fps must be positive, got $fps")
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    require(frames.forall(f => f.getWidth == w && f.getHeight == h),
      "encode: all frames must share dimensions")
    val jpegs = frames.map { f =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(f, "jpg", bos)
      bos.toByteArray
    }
    val maxJpeg = jpegs.map(_.length).max

    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = { require(s.length == 4); out.write(s.getBytes("US-ASCII")) }
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    // build inner pieces first so LIST/RIFF sizes are exact
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(id.getBytes("US-ASCII"))
      val n = body.length
      b.write(n & 0xff); b.write((n >> 8) & 0xff)
      b.write((n >> 16) & 0xff); b.write((n >> 24) & 0xff)
      b.write(body)
      if ((n & 1) == 1) b.write(0) // RIFF chunks pad to even
      b.toByteArray
    }
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cat(parts: Array[Byte]*): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      parts.foreach(b.write)
      b.toByteArray
    }
    def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    // MainAVIHeader (56 bytes)
    val avih = chunk("avih", cat(
      le32(1000000L / fps),        // dwMicroSecPerFrame
      le32(0), le32(0),
      le32(0),                     // dwFlags: no idx1 index is written
      le32(jpegs.size.toLong),     // dwTotalFrames
      le32(0),
      le32(1),                     // dwStreams
      le32(maxJpeg.toLong),        // dwSuggestedBufferSize
      le32(w.toLong), le32(h.toLong),
      le32(0), le32(0), le32(0), le32(0)))
    // AVIStreamHeader (56 bytes)
    val strh = chunk("strh", cat(
      fourcc("vids"), fourcc("MJPG"),
      le32(0), le16(0), le16(0),
      le32(0),
      le32(1),                     // dwScale
      le32(fps.toLong),            // dwRate (rate/scale = fps)
      le32(0),
      le32(jpegs.size.toLong),     // dwLength (frames)
      le32(maxJpeg.toLong),
      le32(-1 & 0xffffffffL),      // dwQuality: default
      le32(0),
      le16(0), le16(0), le16(w), le16(h))) // rcFrame
    // BITMAPINFOHEADER (40 bytes)
    val strf = chunk("strf", cat(
      le32(40), le32(w.toLong), le32(h.toLong),
      le16(1), le16(24), fourcc("MJPG"),
      le32(w.toLong * h * 3), le32(0), le32(0), le32(0), le32(0)))
    def list(subtype: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cat(fourcc(subtype), body))

    val hdrl = list("hdrl", cat(avih, list("strl", cat(strh, strf))))
    val movi = list("movi", cat(jpegs.map(j => chunk("00dc", j)): _*))
    val riffBody = cat(fourcc("AVI "), hdrl, movi)

    ascii("RIFF"); u32(riffBody.length.toLong); out.write(riffBody)
    out.toByteArray
  }

  /** Solid-color RGB frame helper for fixtures. */
  def solidFrame(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    img
  }

  // ---------------------------------------------------------- decode

  /** Byte ranges (offset, length) of the frame payloads ('##dc'/'##db'
    * chunks inside the 'movi' LIST), WITHOUT decoding anything — the
    * cheap linear walk that lets frame sampling skip the frames it
    * doesn't keep. None if the bytes aren't a RIFF AVI with frames.
    */
  def frameChunks(bytes: Array[Byte]): Option[IndexedSeq[(Int, Int)]] =
    try {
      def str(o: Int) = new String(bytes, o, 4, "US-ASCII")
      def u32(o: Int): Long =
        (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      if (bytes.length < 12 || str(0) != "RIFF" || str(8) != "AVI ")
        return None
      val found = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      def isFrameId(id: String): Boolean =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.endsWith("dc") || id.endsWith("db"))
      def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
        var o = start
        while (o + 8 <= end) {
          val id = str(o)
          val sz = u32(o + 4)
          val dataStart = o + 8
          val dataEnd = dataStart + sz
          // a truncated LIST still yields its intact prefix (clamped
          // descent); a truncated leaf chunk is skipped, not emitted
          if (id == "LIST" && dataStart + 4 <= math.min(dataEnd, end)) {
            val sub = str(dataStart)
            walk(dataStart + 4, math.min(dataEnd, end).toInt,
              inMovi || sub == "movi" || sub == "rec ")
          } else if (inMovi && isFrameId(id) && sz > 0 && dataEnd <= end) {
            found += ((dataStart, sz.toInt))
          }
          o = (dataEnd + (sz & 1)).toInt // chunks pad to even
        }
      }
      walk(12, bytes.length, inMovi = false)
      if (found.isEmpty) None else Some(found.toIndexedSeq)
    } catch { case _: Exception => None }

  /** Decode one frame chunk (a JPEG payload) via ImageIO. */
  def decodeFrame(bytes: Array[Byte], chunk: (Int, Int)): Option[BufferedImage] =
    try {
      val (off, len) = chunk
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes, off, len)))
    } catch { case _: Exception => None }
}
