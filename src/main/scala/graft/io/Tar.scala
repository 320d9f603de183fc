package graft.io

/** TAR ARCHIVE INDEXING (POSIX ustar / PAX + the GNU long-name
  * extension, public formats) — the training-shard container: the
  * WebDataset convention (tar shards of `key.jpg` + `key.txt` +
  * `key.json` members) is the de-facto format for image-text
  * training corpora, and a 100 TB shard collection needs member
  * byte spans + names WITHOUT extracting anything — stride/key
  * sampling then fetches exactly the chosen member ranges.
  *
  * Walk: 512-byte header blocks (name, octal size, typeflag,
  * checksum over the header with the checksum field blanked —
  * validated per entry), data rounded up to 512, two zero blocks at
  * the end (trailing zero blocks tolerated, mid-archive garbage
  * refused). Long names arrive via the GNU 'L' entry (next member's
  * name rides its data) or a PAX 'x' extended header (`len path=…`
  * records) — both applied to the following member and not emitted
  * as members themselves, like every real extractor.
  *
  * Strictness (the container family's sniff contract): the first
  * header must carry the ustar magic ("ustar\0" POSIX or "ustar "
  * GNU), EVERY header checksum must validate, sizes must be sane
  * octal within the archive, and entries must tile to the trailing
  * zero blocks / EOF. Corrupt bytes yield None, never an exception.
  */
object Tar {

  /** One indexed member: entry order, full (possibly long) name,
    * typeflag ('0'/NUL file, '5' dir, '1'/'2' links…), the data
    * byte span, size and mtime (epoch seconds). */
  final case class TarEntry(entryIdx: Int, name: String, typeflag: Char,
      dataStart: Long, dataLen: Long, mtime: Long)

  private def octal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    var i = off
    val end = off + len
    // leading spaces/NULs tolerated; GNU base-256 (top bit set) for
    // >8 GiB sizes. The field is two's complement UNDER the 0x80
    // flag — bit 6 of the flag byte is the sign (GNU tar list.c
    // from_header) — so a negative encoding (leading 0xFF, e.g. a
    // pre-1970 mtime) decodes negative like real tar readers, not
    // as a huge positive; size fields reject negatives at the call
    // sites
    if ((b(i) & 0x80) != 0) {
      var v = (b(i) & 0x3fL) - (b(i) & 0x40L)
      i += 1
      while (i < end) {
        // a 12-byte field can encode 95 bits; overflow that WRAPS
        // past Long would pass downstream sign checks and index a
        // wrong size — refuse before the shift loses bits (shift-in
        // is exact iff the top 9 bits are all sign)
        val top = v >> 55
        if (top != 0L && top != -1L) return None
        v = (v << 8) | (b(i) & 0xffL)
        i += 1
      }
      return Some(v)
    }
    while (i < end && (b(i) == ' ')) i += 1
    var v = 0L
    var any = false
    while (i < end && b(i) != 0 && b(i) != ' ') {
      val c = b(i)
      if (c < '0' || c > '7') return None
      v = v * 8 + (c - '0')
      if (v < 0) return None
      any = true
      i += 1
    }
    if (any) Some(v) else Some(0L) // an all-blank numeric field = 0
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var n = 0
    while (n < len && b(off + n) != 0) n += 1
    new String(b, off, n, "ISO-8859-1")
  }

  /** Header checksum (all 512 bytes with the chksum field as
    * spaces) == the stored octal value. */
  private def checksumOk(h: Array[Byte]): Boolean = {
    val stored = octal(h, 148, 8).getOrElse(return false)
    var sum = 0L
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' '.toInt else h(i) & 0xff)
      i += 1
    }
    sum == stored
  }

  private def isZeroBlock(h: Array[Byte]): Boolean = {
    var i = 0
    while (i < 512) { if (h(i) != 0) return false; i += 1 }
    true
  }

  /** Parse PAX extended-header records (`len key=value\n`) for the
    * overrides we honor (path, size). None on malformed records. */
  private def paxRecords(data: Array[Byte])
      : Option[Map[String, String]] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < data.length) {
      var j = i
      var len = 0L
      while (j < data.length && data(j) != ' ') {
        val c = data(j)
        if (c < '0' || c > '9') return None
        len = len * 10 + (c - '0')
        if (len > data.length) return None
        j += 1
      }
      if (j >= data.length || len <= 0 || i + len > data.length ||
          data((i + len - 1).toInt) != '\n') return None
      val rec = new String(data, j + 1, (i + len - 1 - (j + 1)).toInt,
        "UTF-8")
      val eq = rec.indexOf('=')
      if (eq <= 0) return None
      out(rec.substring(0, eq)) = rec.substring(eq + 1)
      i += len.toInt
    }
    Some(out.toMap)
  }

  /** The member index over a seekable source — THE implementation
    * (byte columns wrap [[graft.multimodal.Mp4Index.BytesRangeReader]]).
    * Header-block I/O only: member data is SKIPPED by seek, so a
    * 10 GB WebDataset shard indexes in KBs of reads.
    */
  def entryIndexSeekable(r: graft.multimodal.Mp4Index.RangeReader)
      : Option[IndexedSeq[TarEntry]] = {
    val total = r.length
    if (total < 512) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[TarEntry]
    var pos = 0L
    var pendingLongName: Option[String] = None
    var pendingPax: Option[Map[String, String]] = None
    var sawZero = false
    while (pos + 512 <= total && !sawZero) {
      val h = r.readFully(pos, 512)
      if (isZeroBlock(h)) {
        sawZero = true // the terminator; remaining blocks must be zero
      } else {
        // POSIX magic "ustar" + NUL, or the GNU variant "ustar "
        val magicOk = h(257) == 'u' && h(258) == 's' && h(259) == 't' &&
          h(260) == 'a' && h(261) == 'r' &&
          (h(262) == 0 || h(262) == ' ')
        if (!magicOk) return None // every real header carries it
        if (!checksumOk(h)) return None
        val size = octal(h, 124, 12).getOrElse(return None)
        if (size < 0 || size > total - (pos + 512)) return None
        val typeflag = (h(156) & 0xff).toChar match {
          case '\u0000' => '0' // old-style regular file
          case c => c
        }
        val dataStart = pos + 512
        var advance = size // PAX may override the data length below
        typeflag match {
          case 'L' => // GNU long name: data = next entry's name
            if (size > 64 * 1024) return None
            val nameBytes = r.readFully(dataStart, size.toInt)
            pendingLongName = Some(cstr(nameBytes, 0, nameBytes.length))
          case 'x' | 'X' => // PAX extended header for the next entry
            if (size > 1024 * 1024) return None
            pendingPax = paxRecords(r.readFully(dataStart, size.toInt))
            if (pendingPax.isEmpty) return None
          case 'g' => // global PAX header: skipped (no overrides kept)
            ()
          case _ =>
            val base = {
              // bytes 345..500 are the POSIX prefix field ONLY under
              // the "ustar\0" magic; GNU format ("ustar ") keeps
              // atime/ctime/sparse data there — prepending it would
              // corrupt every name in a --format=gnu shard
              val prefix =
                if (h(262) == 0) cstr(h, 345, 155) else ""
              val nm = cstr(h, 0, 100)
              if (prefix.nonEmpty) s"$prefix/$nm" else nm
            }
            val name = pendingLongName
              .orElse(pendingPax.flatMap(_.get("path")))
              .getOrElse(base)
            // PAX size overrides BOTH the span and the walk advance
            // (a >8 GiB member's header field may be zero/truncated;
            // the data really occupies the PAX size)
            val realSize = pendingPax.flatMap(_.get("size"))
              .flatMap(s => try Some(s.toLong) catch {
                case _: NumberFormatException => None
              }).getOrElse(size)
            if (realSize < 0 || realSize > total - dataStart) return None
            advance = realSize
            val mtime = octal(h, 136, 12).getOrElse(return None)
            out += TarEntry(out.length, name, typeflag, dataStart,
              realSize, mtime)
            pendingLongName = None
            pendingPax = None
        }
        pos = dataStart + (advance + 511) / 512 * 512
      }
      if (sawZero) pos += 512
    }
    if (sawZero) {
      // everything after the first zero block must be zero blocks
      while (pos + 512 <= total) {
        if (!isZeroBlock(r.readFully(pos, 512))) return None
        pos += 512
      }
      if (pos != total) return None // a partial trailing block
    } else if (pos != total) return None // truncated mid-entry
    if (out.isEmpty) None else Some(out.toIndexedSeq)
  }

  /** The member index of a byte-column shard. */
  def entryIndex(b: Array[Byte]): Option[IndexedSeq[TarEntry]] =
    entryIndexSeekable(new graft.multimodal.Mp4Index.BytesRangeReader(b))

  // ---------------------------------------------------------------
  // Spark seams
  // ---------------------------------------------------------------

  /** One member row; `indexed = false` flags non-TAR assets. The
    * WebDataset key/extension split rides along: `sample_key` is the
    * member path up to the FIRST dot of its basename, `ext` the rest
    * — the convention's grouping rule. */
  final case class TarRow(asset_id: Long, entry_idx: Int, name: String,
      sample_key: String, ext: String, typeflag: String,
      data_start: Long, data_len: Long, mtime: Long, indexed: Boolean)

  /** The WebDataset key/extension split of a member name (public
    * convention: the sample key is the path up to the FIRST dot of
    * the basename; everything after that dot is the modality
    * extension — so `a.seg.jpg` splits to key `a`, ext `seg.jpg`,
    * letting multi-dot extensions group under one sample). */
  def splitKey(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    if (dot < 0) (name, "")
    else (name.substring(0, dot), name.substring(dot + 1))
  }

  /** TAR member indexing over a (id, bytes) corpus, WebDataset
    * key/ext split included — `groupBy(sample_key)` then IS the
    * WebDataset sample assembly, and the byte spans are the fetch
    * ranges. mapPartitions, flagged fallback. */
  /** Rows for one asset's index result — the single materialization
    * both seam functions share (no fallback-row twin drift). */
  private def toRows(id: Long, indexed: Option[IndexedSeq[TarEntry]])
      : Iterator[TarRow] = indexed match {
    case Some(es) => es.iterator.map { e =>
      val (key, ext) = splitKey(e.name)
      TarRow(id, e.entryIdx, e.name, key, ext, e.typeflag.toString,
        e.dataStart, e.dataLen, e.mtime, indexed = true)
    }
    case None =>
      Iterator.single(TarRow(id, -1, "", "", "", "", 0L, 0L, 0L,
        indexed = false))
  }

  def extractEntries(df: org.apache.spark.sql.DataFrame, idCol: String,
      bytesCol: String)(implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[TarRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          toRows(id,
            try Option(bytes).flatMap(entryIndex)
            catch { case scala.util.control.NonFatal(_) => None })
        }
      }
  }

  /** Path-columned TAR indexing for >2 GiB shards: the seekable walk
    * reads header blocks only. Paths route through [[PathIO]]
    * (Hadoop FS for scheme-qualified URIs, `java.io` otherwise).
    * Unreadable/ill-formed paths emit the flagged row. */
  def extractEntriesByPath(df: org.apache.spark.sql.DataFrame,
      idCol: String, pathCol: String)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[TarRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val confBc = PathIO.confBroadcast(spark)
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.flatMap { case (id, path) =>
          toRows(id,
            try {
              val r = PathIO.openRange(path, conf)
              try entryIndexSeekable(r) finally r.close()
            } catch { case scala.util.control.NonFatal(_) => None })
        }
      }
  }

  // ---------------------------------------------------------------
  // synthetic encoder (specs/oracles)
  // ---------------------------------------------------------------

  /** Synthetic ustar for specs/oracles: `members` gives (name,
    * content, mtime); names >100 chars emit a GNU 'L' entry;
    * `paxFor` names get a PAX 'x' header carrying their path
    * instead (the bsdtar/python-tarfile shape). Checksums real;
    * two zero-block terminator. */
  def encodeSynthetic(members: Seq[(String, Array[Byte], Long)],
      paxFor: Set[String] = Set.empty): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def header(name: String, size: Long, typeflag: Char,
        mtime: Long): Array[Byte] = {
      val h = new Array[Byte](512)
      val nb = name.getBytes("ISO-8859-1")
      System.arraycopy(nb, 0, h, 0, math.min(nb.length, 100))
      def oct(v: Long, off: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        padded.getBytes("ISO-8859-1").copyToArray(h, off)
        h(off + len - 1) = 0
      }
      oct(420, 100, 8) // mode 0644
      oct(0, 108, 8); oct(0, 116, 8)
      oct(size, 124, 12)
      oct(mtime, 136, 12)
      h(156) = typeflag.toByte
      "ustar".getBytes("ISO-8859-1").copyToArray(h, 257)
      h(262) = 0; h(263) = '0'; h(264) = '0' // version "00"
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      h.foreach(b => sum += (b & 0xff))
      val cs = java.lang.Long.toOctalString(sum)
      val padded = ("0" * (6 - cs.length)) + cs
      padded.getBytes("ISO-8859-1").copyToArray(h, 148)
      h(154) = 0; h(155) = ' '
      h
    }
    def pad(n: Long): Unit = {
      val rem = (512 - (n % 512)) % 512
      out.write(new Array[Byte](rem.toInt))
    }
    members.foreach { case (name, content, mtime) =>
      if (paxFor.contains(name)) {
        val rec = {
          // PAX record: "len key=value\n" where len covers ITSELF —
          // pick the digit width d where d + |body| has d digits
          val body = s" path=$name\n"
          val len = (1 to 9).map(_ + body.length)
            .find(t => t.toString.length + body.length == t).get
          s"$len$body"
        }.getBytes("UTF-8")
        out.write(header("./PaxHeaders/" + name.takeRight(40),
          rec.length.toLong, 'x', mtime))
        out.write(rec); pad(rec.length.toLong)
        out.write(header(name.take(100), content.length.toLong, '0',
          mtime))
      } else if (name.length > 100) {
        val nb = name.getBytes("ISO-8859-1") ++ Array[Byte](0)
        out.write(header("././@LongLink", nb.length.toLong, 'L', mtime))
        out.write(nb); pad(nb.length.toLong)
        out.write(header(name.take(100), content.length.toLong, '0',
          mtime))
      } else {
        out.write(header(name, content.length.toLong, '0', mtime))
      }
      out.write(content); pad(content.length.toLong)
    }
    out.write(new Array[Byte](1024)) // two zero blocks
    out.toByteArray
  }
}
