package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving summary state: at most k counters of
  * `key → (hi, err)` with the invariant `hi − err ≤ true(key) ≤ hi`
  * for every tracked key, and `true(key) ≤ minHi` for every key NOT
  * tracked once the summary has been full (`sawEviction`).
  */
final class SpaceSavingBuffer(val k: Int) {
  val counters: mutable.HashMap[Any, (Long, Long)] = mutable.HashMap.empty
  var sawEviction: Boolean = false
  def minHi: Long = if (counters.isEmpty) 0L else counters.valuesIterator.map(_._1).min
  /** upper bound for a key this summary does not track */
  def absentBound: Long = if (sawEviction) minHi else 0L
}

/** Heavy-hitters sketch — `space_saving_topk(col, k)` → the
  * Space-Saving summary (Metwally et al., "Efficient Computation of
  * Frequent and Top-k Elements in Data Streams") as a mergeable
  * aggregate: O(k) state per partition instead of a full groupBy
  * shuffle of every distinct key, which is the difference between a
  * bounded side-summary and a billion-key exchange at 100 TB.
  *
  * Update: tracked key → hi+1; room → new counter (1, 0); full →
  * evict a min-hi counter and take over its budget as error
  * (minHi+1, minHi). Merge (mergeable-summaries construction): for
  * every key in either summary, hi and err each add the other side's
  * tracked value, or its `absentBound` (an untracked key's true count
  * is ≤ that side's min counter once it has evicted) — then keep the
  * k largest by hi. Both steps preserve `hi − err ≤ true ≤ hi`, and
  * any key with true frequency > N/k is guaranteed tracked.
  *
  * Output: `array<struct<key, est, err>>` sorted (est desc, err asc,
  * key asc) — `est` is the UPPER bound, `est − err` the lower.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuffer] {

  require(k > 0, s"space_saving_topk: k must be positive, got $k")
  require(child.dataType == StringType || child.dataType == LongType,
    s"space_saving_topk: key must be string or bigint, got ${child.dataType}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "space_saving_topk"

  private def isString = child.dataType == StringType

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", child.dataType),
    StructField("est", LongType), StructField("err", LongType))))

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(k)

  /** UTF8String inputs may point into reused scan buffers — copy to a
    * stable JVM value before it becomes a map key. */
  private def stableKey(v: Any): Any = v match {
    case s: UTF8String => s.toString
    case other => other
  }

  override def update(b: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v == null) return b
    val key = stableKey(v)
    b.counters.get(key) match {
      case Some((hi, err)) => b.counters.update(key, (hi + 1, err))
      case None if b.counters.size < b.k => b.counters.update(key, (1L, 0L))
      case None =>
        val (evictKey, (minHi, _)) = b.counters.minBy(_._2._1)
        b.counters.remove(evictKey)
        b.counters.update(key, (minHi + 1, minHi))
        b.sawEviction = true
    }
    b
  }

  override def merge(b: SpaceSavingBuffer, o: SpaceSavingBuffer): SpaceSavingBuffer = {
    if (o.counters.isEmpty && !o.sawEviction) return b
    val bAbsent = b.absentBound
    val oAbsent = o.absentBound
    val merged = mutable.HashMap.empty[Any, (Long, Long)]
    (b.counters.keySet ++ o.counters.keySet).foreach { key =>
      val (bHi, bErr) = b.counters.getOrElse(key, (bAbsent, bAbsent))
      val (oHi, oErr) = o.counters.getOrElse(key, (oAbsent, oAbsent))
      merged.update(key, (bHi + oHi, bErr + oErr))
    }
    val kept =
      if (merged.size <= b.k) merged
      else {
        val top = merged.toSeq.sortBy { case (_, (hi, _)) => -hi }.take(b.k)
        mutable.HashMap(top: _*)
      }
    b.counters.clear()
    b.counters ++= kept
    b.sawEviction = b.sawEviction || o.sawEviction || merged.size > b.k
    b
  }

  override def eval(b: SpaceSavingBuffer): Any = {
    val sorted = b.counters.toSeq
      .map { case (key, (hi, err)) => (key, hi, err) }
      .sortBy { case (key, hi, err) => (-hi, err, key.toString) }
    new GenericArrayData(sorted.map { case (key, hi, err) =>
      val outKey = if (isString) UTF8String.fromString(key.asInstanceOf[String])
        else key
      InternalRow(outKey, hi, err)
    })
  }

  override def serialize(b: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeBoolean(b.sawEviction)
    out.writeInt(b.counters.size)
    b.counters.foreach { case (key, (hi, err)) =>
      if (isString) out.writeUTF(key.asInstanceOf[String])
      else out.writeLong(key.asInstanceOf[Number].longValue())
      out.writeLong(hi); out.writeLong(err)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new SpaceSavingBuffer(in.readInt())
    b.sawEviction = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val key: Any = if (isString) in.readUTF() else java.lang.Long.valueOf(in.readLong())
      val hi = in.readLong(); val err = in.readLong()
      b.counters.update(key, (hi, err))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
}
