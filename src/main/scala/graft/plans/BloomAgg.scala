package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_agg(col, expectedItems)` — a Bloom filter as a mergeable
  * GROUPED aggregate (Spark's own `stat.bloomFilter` builds exactly
  * one filter for a whole DataFrame on the driver; this one yields a
  * filter PER GROUP inside a normal aggregation, which is what a
  * per-file skipping manifest needs). Same update/merge machinery as
  * the other sketch aggregates: O(filter bytes) state per group,
  * map-side combined, bitwise-OR merge.
  *
  * Output is the filter's serialized bytes (probe with
  * `bloom_might_contain` or driver-side `BloomFilter.readFrom`).
  * False positives only — a membership NO is exact, which is the
  * direction file pruning needs.
  */
case class BloomAggregate(
    child: Expression,
    expectedItems: Long,
    fpp: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, s"bloom_agg: expectedItems must be positive")
  require(child.dataType == StringType || child.dataType == LongType ||
    child.dataType == IntegerType,
    s"bloom_agg: key must be string/int/bigint, got ${child.dataType}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(b: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => b.putBinary(s.getBytes)
      case n: Number => b.putLong(n.longValue())
      case other => b.putBinary(other.toString.getBytes("UTF-8"))
    }
    b
  }

  override def merge(b: BloomFilter, o: BloomFilter): BloomFilter = {
    b.mergeInPlace(o); b
  }

  override def eval(b: BloomFilter): Any = serialize(b)

  override def serialize(b: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(o: Int): BloomAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAggregate =
    copy(child = newChildren.head)
}
