package graft.io

/** TFRECORD INDEXING (the TensorFlow record format, public spec in
  * the TF docs/source) — the other dominant training-shard
  * container beside WebDataset tars: a TFRecord file is a sequence
  * of [u64le length][masked CRC32C of the length bytes][payload]
  * [masked CRC32C of the payload], and a shard collection needs the
  * record byte spans + integrity verdicts without deserializing any
  * Example proto — stride/split sampling then fetches exactly the
  * chosen payload ranges.
  *
  * The mask is TF's: `((crc >> 15) | (crc << 17)) + 0xa282ead8`
  * over CRC32C (Castagnoli — `java.util.zip.CRC32C`, in the JDK).
  *
  * Strictness (the container family's contract): every length CRC
  * must validate (it is the framing's own integrity bit — a corrupt
  * length would otherwise send the walk into payload bytes), every
  * payload CRC must validate, and records must tile the stream
  * exactly. Corrupt bytes yield None, never an exception.
  */
object TfRecord {

  /** One record: its payload byte span (the fetch unit — the
    * serialized Example proto). */
  final case class Record(recordIdx: Int, dataStart: Long, dataLen: Long)

  private def maskedCrc(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(b, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def u32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def u64le(b: Array[Byte], i: Int): Long =
    (u32le(b, i) & 0xffffffffL) | ((u32le(b, i + 4) & 0xffffffffL) << 32)

  /** The record index. None unless ≥1 record tiles the bytes with
    * both CRCs green per record. */
  def recordIndex(b: Array[Byte]): Option[IndexedSeq[Record]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Record]
    var i = 0
    while (i < b.length) {
      if (i + 12 > b.length) return None
      val len = u64le(b, i)
      if (u32le(b, i + 8) != maskedCrc(b, i, 8)) return None
      if (len < 0 || len > b.length - (i + 12) - 4) return None
      val dataStart = i + 12
      if (u32le(b, dataStart + len.toInt) !=
          maskedCrc(b, dataStart, len.toInt)) return None
      out += Record(out.length, dataStart.toLong, len)
      i = dataStart + len.toInt + 4
    }
    if (out.isEmpty) None else Some(out.toIndexedSeq)
  }

  /** One record row; `indexed = false` flags non-TFRecord assets.
    * `crc_ok` is definitionally true for indexed rows (the strict
    * walk refuses otherwise) — it rides along so a future lenient
    * mode keeps the schema. */
  final case class TfRecordRow(asset_id: Long, record_idx: Int,
      data_start: Long, data_len: Long, indexed: Boolean)

  /** Record indexing over a (id, bytes) corpus. mapPartitions,
    * flagged fallback — the shard-manifest step before any proto
    * decoding. */
  def extractRecords(df: org.apache.spark.sql.DataFrame, idCol: String,
      bytesCol: String)(implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[TfRecordRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val indexed =
            try Option(bytes).flatMap(recordIndex)
            catch { case scala.util.control.NonFatal(_) => None }
          indexed match {
            case Some(rs) => rs.iterator.map(r =>
              TfRecordRow(id, r.recordIdx, r.dataStart, r.dataLen,
                indexed = true))
            case None =>
              Iterator.single(TfRecordRow(id, -1, 0L, 0L,
                indexed = false))
          }
        }
      }
  }

  /** Synthetic TFRecord stream for specs/oracles: real masked
    * CRC32Cs over the given payloads. */
  def encodeSynthetic(payloads: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit =
      (0 until 4).foreach(j => out.write((v >> (8 * j)) & 0xff))
    payloads.foreach { p =>
      val lenBytes = new Array[Byte](8)
      (0 until 8).foreach(j =>
        lenBytes(j) = ((p.length.toLong >> (8 * j)) & 0xff).toByte)
      out.write(lenBytes)
      le32(maskedCrc(lenBytes, 0, 8))
      out.write(p)
      le32(maskedCrc(p, 0, p.length))
    }
    out.toByteArray
  }
}
