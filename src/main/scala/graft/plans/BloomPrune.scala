package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(filter_binary, key)` — membership probe
  * against a serialized Spark [[BloomFilter]] (the public
  * `df.stat.bloomFilter` builder). The hand-rolled twin of Catalyst's
  * internal runtime-filter machinery (`InjectRuntimeFilter` /
  * `BloomFilterMightContain`, which Catalyst only deploys on its own
  * schedule): here the filter is an explicit value, so library code
  * can build one from a SMALL side and prune a HUGE scan before the
  * shuffle — see [[graft.store.ScaleJoins.bloomPrunedAntiJoin]].
  *
  * Contract: NO false negatives — a key that was put in always probes
  * true, so pruning with it is lossless for joins keyed on the probed
  * column; false positives (rate `fpp`) only let extra rows through.
  *
  * Encoding matches the builder's `put(Object)` dispatch
  * (`BloomFilterImpl`): strings as UTF-8 bytes, integrals via
  * `putLong`. Eval-only (CodegenFallback) with a same-buffer
  * deserialization cache: the filter argument is a broadcast literal,
  * decoded once per task, probed per row as two hash computations.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, StringType | LongType | IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs (binary filter, string|bigint|int key), got ($l, $r)")
  }

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedFilter: BloomFilter = _

  private def filterFor(bytes: Array[Byte]): BloomFilter = {
    if (!(bytes eq cachedBytes)) {
      cachedFilter = BloomFilter.readFrom(bytes)
      cachedBytes = bytes
    }
    cachedFilter
  }

  override def nullSafeEval(filterBytes: Any, key: Any): Any = {
    val bf = filterFor(filterBytes.asInstanceOf[Array[Byte]])
    key match {
      case s: UTF8String => bf.mightContainBinary(s.getBytes)
      case l: java.lang.Long => bf.mightContainLong(l)
      case i: java.lang.Integer => bf.mightContainLong(i.longValue())
      case other => throw new IllegalArgumentException(
        s"bloom_might_contain: unsupported key $other")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
