package graft.io

/** GZIP MEMBER INDEXING (RFC 1952, public spec) — the parallel-split
  * key for member-per-record archives: a `.warc.gz` is a
  * concatenation of gzip members (one per record), and a cluster
  * job that knows the COMPRESSED byte span of every member can fan
  * records out as independent ranged fetches + inflates — the way
  * Common Crawl is actually processed at scale (its CDX indexes
  * carry exactly these offsets). This walk derives them from the
  * bytes alone: per member, parse the header (FEXTRA/FNAME/
  * FCOMMENT/FHCRC honored), run the DEFLATE stream through an
  * Inflater counting consumed/produced bytes (output discarded —
  * O(buffer) memory), then validate the 8-byte trailer: CRC-32 of
  * the inflated output and ISIZE = length mod 2³².
  *
  * Strictness: every member's magic/method must parse, the CRC and
  * ISIZE must validate, and members must tile the stream exactly —
  * a truncated or corrupt archive yields None, never an exception.
  */
object GzipMembers {

  /** One member: its COMPRESSED span (the ranged-fetch unit) and the
    * uncompressed length it inflates to. */
  final case class Member(memberIdx: Int, compStart: Long, compLen: Long,
      uncompLen: Long)

  /** The member index. None unless ≥1 member tiles the bytes with
    * valid headers and trailers. */
  def memberIndex(b: Array[Byte]): Option[IndexedSeq[Member]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Member]
    var p = 0
    try {
      while (p < b.length) {
        val start = p
        if (p + 10 > b.length) return None
        if ((b(p) & 0xff) != 0x1f || (b(p + 1) & 0xff) != 0x8b)
          return None
        if ((b(p + 2) & 0xff) != 8) return None // CM must be deflate
        val flg = b(p + 3) & 0xff
        if ((flg & 0xe0) != 0) return None // reserved flag bits
        p += 10
        if ((flg & 0x04) != 0) { // FEXTRA
          if (p + 2 > b.length) return None
          val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
          p += 2 + xlen
          if (p > b.length) return None
        }
        if ((flg & 0x08) != 0) { // FNAME: NUL-terminated
          while (p < b.length && b(p) != 0) p += 1
          if (p >= b.length) return None
          p += 1
        }
        if ((flg & 0x10) != 0) { // FCOMMENT
          while (p < b.length && b(p) != 0) p += 1
          if (p >= b.length) return None
          p += 1
        }
        if ((flg & 0x02) != 0) { // FHCRC
          p += 2
          if (p > b.length) return None
        }
        // the raw deflate stream: count in/out, CRC the output
        val inf = new java.util.zip.Inflater(true)
        val crc = new java.util.zip.CRC32()
        try {
          inf.setInput(b, p, b.length - p)
          val buf = new Array[Byte](64 * 1024)
          var produced = 0L
          while (!inf.finished()) {
            val n = inf.inflate(buf)
            if (n > 0) { crc.update(buf, 0, n); produced += n }
            else if (inf.needsInput() || inf.needsDictionary())
              return None // truncated / preset-dictionary stream
          }
          val consumed = inf.getBytesRead
          val trailerAt = p + consumed.toInt
          if (trailerAt + 8 > b.length) return None
          def u32le(i: Int): Long =
            (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
              ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
          if (u32le(trailerAt) != crc.getValue) return None
          if (u32le(trailerAt + 4) != (produced & 0xffffffffL))
            return None
          p = trailerAt + 8
          out += Member(out.length, start.toLong, (p - start).toLong,
            produced)
        } finally inf.end()
      }
      if (out.isEmpty) None else Some(out.toIndexedSeq)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One member row; `indexed = false` flags non-gzip assets. */
  final case class GzipMemberRow(asset_id: Long, member_idx: Int,
      comp_start: Long, comp_len: Long, uncomp_len: Long,
      indexed: Boolean)

  /** Member indexing over a (id, bytes) corpus: the compressed spans
    * a fan-out join hands to ranged fetchers. mapPartitions, flagged
    * fallback. */
  def extractMembers(df: org.apache.spark.sql.DataFrame, idCol: String,
      bytesCol: String)(implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[GzipMemberRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val indexed =
            try Option(bytes).flatMap(memberIndex)
            catch { case scala.util.control.NonFatal(_) => None }
          indexed match {
            case Some(ms) => ms.iterator.map(m =>
              GzipMemberRow(id, m.memberIdx, m.compStart, m.compLen,
                m.uncompLen, indexed = true))
            case None =>
              Iterator.single(GzipMemberRow(id, -1, 0L, 0L, 0L,
                indexed = false))
          }
        }
      }
  }
}
