package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Profile accumulator: every metric the reference's per-column stats
  * pass needs (`schema_analyzer.py:74-90`, `type_inference_engine.py:
  * 85-131`), O(1) state.
  */
final class ProfileBuffer(
    var count: Long = 0L,
    var nulls: Long = 0L,
    var minN: Double = Double.NaN,
    var maxN: Double = Double.NaN,
    var allIntegral: Boolean = true,
    var maxDec: Int = 0,
    var maxLen: Int = 0)

/** Single-buffer column profiler — `profile_col(col)` →
  * struct(count, nulls, min_n, max_n, all_integral, max_dec, max_len).
  *
  * Why a TypedImperativeAggregate (SURVEY §2.11/§7.3): the composed
  * form needs one aggregate expression per metric, and EXACT
  * countDistinct across many columns makes Catalyst plan an Expand
  * (input replicated once per distinct aggregate). This computes all
  * order-insensitive metrics for a column in ONE O(1)-state buffer;
  * pair it with approx_count_distinct (HLL, no Expand) for
  * cardinality. One scan, one shuffle of tiny buffers, any number of
  * columns.
  */
case class ColumnProfileAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ProfileBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "profile_col"

  override def dataType: DataType = StructType(Seq(
    StructField("count", LongType), StructField("nulls", LongType),
    StructField("min_n", DoubleType), StructField("max_n", DoubleType),
    StructField("all_integral", BooleanType),
    StructField("max_dec", IntegerType), StructField("max_len", IntegerType)))

  override def createAggregationBuffer(): ProfileBuffer = new ProfileBuffer()

  private def updateNumeric(b: ProfileBuffer, d: Double): Unit = {
    if (b.minN.isNaN || d < b.minN) b.minN = d
    if (b.maxN.isNaN || d > b.maxN) b.maxN = d
    if (d != math.floor(d) || d.isInfinite) {
      b.allIntegral = false
      // decimal places of the value's shortest decimal representation
      // (`type_inference_engine.py:103-107` semantics). Doubles ≥1e7
      // stringify scientific ("1.23456785E7") — expand those to the
      // positional form first, or the fraction is invisible and a
      // fractional column would profile as 0-decimal (→ INTEGER DDL).
      val s = d.toString
      if (!d.isInfinite) {
        val positional =
          if (s.indexOf('E') >= 0)
            new java.math.BigDecimal(s).stripTrailingZeros().toPlainString
          else s
        val dot = positional.indexOf('.')
        if (dot >= 0 && !positional.endsWith(".0")) {
          val places = positional.length - dot - 1
          if (places > b.maxDec) b.maxDec = places
        }
      }
    }
  }

  override def update(b: ProfileBuffer, input: InternalRow): ProfileBuffer = {
    b.count += 1
    val v = child.eval(input)
    if (v == null) b.nulls += 1
    else child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        updateNumeric(b, v.asInstanceOf[Number].doubleValue())
      case FloatType | DoubleType =>
        updateNumeric(b, v.asInstanceOf[Number].doubleValue())
      case dt: DecimalType =>
        updateNumeric(b,
          v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
      case StringType =>
        val len = v.asInstanceOf[UTF8String].numChars()
        if (len > b.maxLen) b.maxLen = len
      case _ =>
        val len = v.toString.length
        if (len > b.maxLen) b.maxLen = len
    }
    b
  }

  override def merge(b: ProfileBuffer, o: ProfileBuffer): ProfileBuffer = {
    b.count += o.count
    b.nulls += o.nulls
    if (b.minN.isNaN || (!o.minN.isNaN && o.minN < b.minN)) b.minN = o.minN
    if (b.maxN.isNaN || (!o.maxN.isNaN && o.maxN > b.maxN)) b.maxN = o.maxN
    b.allIntegral &&= o.allIntegral
    b.maxDec = math.max(b.maxDec, o.maxDec)
    b.maxLen = math.max(b.maxLen, o.maxLen)
    b
  }

  override def eval(b: ProfileBuffer): Any =
    InternalRow(b.count, b.nulls, b.minN, b.maxN, b.allIntegral,
      b.maxDec, b.maxLen)

  override def serialize(b: ProfileBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.count); out.writeLong(b.nulls)
    out.writeDouble(b.minN); out.writeDouble(b.maxN)
    out.writeBoolean(b.allIntegral)
    out.writeInt(b.maxDec); out.writeInt(b.maxLen)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ProfileBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    new ProfileBuffer(in.readLong(), in.readLong(), in.readDouble(),
      in.readDouble(), in.readBoolean(), in.readInt(), in.readInt())
  }

  override def withNewMutableAggBufferOffset(offset: Int): ColumnProfileAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ColumnProfileAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ColumnProfileAgg =
    copy(child = newChildren.head)
}
