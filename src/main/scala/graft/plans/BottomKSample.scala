package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded buffer of the k smallest (priority, value) pairs — a
  * max-heap so the current worst survivor is O(1) to test against.
  */
final class BottomKBuffer(val k: Int) {
  // max-heap on (priority, value): head = largest kept pair
  val heap: mutable.PriorityQueue[(Long, Double)] =
    mutable.PriorityQueue.empty(Ordering.Tuple2[Long, Double])
  def offer(p: Long, v: Double): Unit =
    if (heap.size < k) heap.enqueue((p, v))
    else if (Ordering.Tuple2[Long, Double].lt((p, v), heap.head)) {
      heap.dequeue(); heap.enqueue((p, v))
    }
}

/** Bottom-k sample — `bottom_k_sample(value, priority, k)` → the k
  * rows with the smallest (priority, value), as
  * `array<struct<pri, v>>` sorted ascending. With a priority that is
  * a fixed hash/permutation of a row id, this is the classic KMV /
  * bottom-k uniform sample (Cohen & Kaplan, "Summarizing data using
  * bottom-k sketches"): a mergeable row sample whose selection is a
  * pure SET operation — min-k under union is associative, commutative
  * and idempotent, so the result is BIT-DETERMINISTIC regardless of
  * partitioning or merge order. That is the property KLL/t-digest
  * lack (their compaction depends on merge order), and what lets a
  * quantile estimate from this sample be oracle-checked exactly.
  *
  * Scale shape: O(k) state per group per partition, map-side
  * combined; the exchange carries k pairs per group instead of the
  * group's rows. Quantile estimates from a k-sample carry
  * O(1/√k) rank error; the sample also answers distinct-ish
  * cardinality (KMV estimator) and subset-sum estimates.
  */
case class BottomKSample(
    value: Expression,
    priority: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKBuffer] {

  require(k > 0, s"bottom_k_sample: k must be positive, got $k")
  require(Seq(IntegerType, LongType, FloatType, DoubleType)
    .contains(value.dataType),
    s"bottom_k_sample: value must be numeric, got ${value.dataType}")
  require(Seq(IntegerType, LongType).contains(priority.dataType),
    s"bottom_k_sample: priority must be integral, got ${priority.dataType}")

  override def children: Seq[Expression] = Seq(value, priority)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_sample"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pri", LongType), StructField("v", DoubleType))))

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(b: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val v = value.eval(input)
    val p = priority.eval(input)
    if (v != null && p != null)
      b.offer(p.asInstanceOf[Number].longValue(),
        v.asInstanceOf[Number].doubleValue())
    b
  }

  override def merge(b: BottomKBuffer, o: BottomKBuffer): BottomKBuffer = {
    o.heap.foreach { case (p, v) => b.offer(p, v) }
    b
  }

  override def eval(b: BottomKBuffer): Any =
    new GenericArrayData(b.heap.toSeq.sorted.map { case (p, v) =>
      InternalRow(p, v)
    })

  override def serialize(b: BottomKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.heap.size)
    b.heap.foreach { case (p, v) => out.writeLong(p); out.writeDouble(v) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new BottomKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { b.offer(in.readLong(), in.readDouble()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKSample =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKSample =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKSample =
    copy(value = newChildren(0), priority = newChildren(1))
}
