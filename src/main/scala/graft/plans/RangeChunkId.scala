package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Range-chunk membership for pre-sampled bounds: O(log P) per row.
  *
  * [[graft.transform.RangeChunks.chunkIdExpr]]'s round-10 form summed
  * P−1 codegen'd lexicographic comparison chains per row — O(P) work
  * per row with P tied to `spark.sql.shuffle.partitions`, measured as
  * a 3.3× slowdown of the bare chunk-local window at 10× scale. This
  * kernel holds the SAME strictly-increasing bound tuples (converted
  * once to Catalyst internal values) and binary-searches them:
  * `chunk = #bounds strictly below the row's sort tuple`, ~log2(P)
  * tuple comparisons per row, one tiny reference object in the
  * generated code (the [[NearestCentroid]] posture).
  *
  * Ordering matches Spark's ascending sort and the round-10 Column
  * comparisons: nulls first; NaN last; `-0.0 == 0.0` (SQL comparison
  * semantics); UTF8String binary order for strings; field-by-field
  * lexicographic across the tuple.
  */
final class ChunkBoundsKernel(val bounds: Array[Array[Any]])
    extends Serializable {

  // The binary search REQUIRES bounds strictly increasing under THIS
  // kernel's comparison. The driver samples and pre-sorts bounds with
  // java.lang.String (UTF-16 code-unit) ordering, which diverges from
  // UTF8String's UTF-8 byte (code-point) ordering for supplementary
  // characters vs high-BMP characters — so the kernel must never
  // trust the incoming order: [[ChunkBoundsKernel.build]] re-sorts
  // and re-dedupes in kernel order at construction, and this check
  // makes any other construction path fail loudly instead of
  // returning wrong (non-monotone) chunk ids.
  require((1 until bounds.length).forall(i =>
    ChunkBoundsKernel.cmpTuple(bounds(i - 1), bounds(i)) < 0),
    "range-chunk bounds are not strictly increasing in kernel order")

  /** Chunk id of one tuple of Catalyst-internal values (nulls are
    * values, not missing): the count of bound tuples strictly below
    * it, found by binary search (first bound >= tuple).
    */
  def chunkOf(tuple: Array[Any]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ChunkBoundsKernel.cmpTuple(bounds(mid), tuple) < 0) lo = mid + 1
      else hi = mid
    }
    lo
  }
}

object ChunkBoundsKernel {

  /** Null-first, NaN-last, `-0.0 == 0.0` comparison of two Catalyst
    * internal values of the same atomic type — the SQL ascending-sort
    * order the window branches sort by.
    */
  def cmpAny(a: Any, b: Any): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else (a, b) match {
      case (x: java.lang.Double, y: java.lang.Double) =>
        if (x.doubleValue() == y.doubleValue()) 0
        else java.lang.Double.compare(x, y)
      case (x: java.lang.Float, y: java.lang.Float) =>
        if (x.floatValue() == y.floatValue()) 0
        else java.lang.Float.compare(x, y)
      case (x: java.lang.Comparable[_], _) =>
        x.asInstanceOf[java.lang.Comparable[Any]].compareTo(b)
      case _ => throw new IllegalArgumentException(
        s"range-chunk sort column holds non-orderable value " +
          s"class ${a.getClass.getName}; use atomic orderable columns")
    }

  private[plans] def cmpTuple(a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < a.length) {
      val c = cmpAny(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Kernel from EXTERNAL bound rows (as collected by
    * [[graft.transform.RangeChunks.sampleBounds]]) + the resolved
    * column types: every bound value is converted ONCE to its
    * Catalyst internal form so row-side comparisons are
    * internal-vs-internal (UTF8String vs UTF8String, micros-long vs
    * micros-long, Decimal vs Decimal) — then RE-SORTED AND RE-DEDUPED
    * in that internal order. The driver's bound selection sorts
    * external values (java.lang.String UTF-16 order), which diverges
    * from UTF8String's UTF-8 byte order on supplementary characters;
    * the divergence may only influence WHICH bounds were picked
    * (balance), never the binary search's sortedness invariant
    * (correctness), because order is re-established here.
    */
  def build(types: Seq[DataType], rows: Seq[Row]): ChunkBoundsKernel = {
    val convs = types.map(CatalystTypeConverters.createToCatalystConverter)
      .toArray
    val internal = rows.map { r =>
      Array.tabulate(types.length)(i => convs(i)(r.get(i)))
    }.toArray
    java.util.Arrays.sort(internal,
      ((a: Array[Any], b: Array[Any]) => cmpTuple(a, b)):
        java.util.Comparator[Array[Any]])
    val deduped = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
    internal.foreach { t =>
      if (deduped.isEmpty || cmpTuple(deduped.last, t) != 0) deduped += t
    }
    new ChunkBoundsKernel(deduped.toArray)
  }
}

/** `range_chunk_id(c1, …, cn)` over driver-sampled bound rows: the
  * pure-projection chunk id of [[graft.transform.RangeChunks]],
  * binary-searched in O(log P) per row. Deterministic (the bounds are
  * literals of the plan), non-nullable, null INPUTS are ordered
  * null-first like Spark's ascending sort. Constructed via
  * [[org.apache.spark.sql.graft.ColumnBridge]] (carries driver-built
  * rows, so it cannot be a registered SQL function).
  */
case class RangeChunkId(children: Seq[Expression], boundRows: Seq[Row])
    extends Expression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "range_chunk_id"

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).zipWithIndex.collectFirst {
      case (dt, i) if !RangeChunkId.orderable(dt) => (dt, i)
    }
    bad match {
      case Some((dt, i)) => TypeCheckResult.TypeCheckFailure(
        s"range_chunk_id column $i has non-orderable atomic type " +
          dt.simpleString)
      case None if boundRows.exists(_.length != children.length) =>
        TypeCheckResult.TypeCheckFailure(
          s"bound arity != column count ${children.length}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  @transient private lazy val kernel: ChunkBoundsKernel =
    ChunkBoundsKernel.build(children.map(_.dataType), boundRows)

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val tup = new Array[Any](n)
    var i = 0
    while (i < n) { tup(i) = children(i).eval(input); i += 1 }
    kernel.chunkOf(tup)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chunkBoundsKernel", kernel,
      classOf[ChunkBoundsKernel].getName)
    val evals = children.map(_.genCode(ctx))
    val tup = ctx.freshName("chunkTuple")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val fills = evals.zipWithIndex.map { case (e, i) =>
      s"if (!${e.isNull}) $tup[$i] = ${e.value};"
    }.mkString("\n")
    ev.copy(
      code = code"""
        $childCode
        Object[] $tup = new Object[${children.length}];
        $fills
        int ${ev.value} = $ref.chunkOf($tup);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RangeChunkId =
    copy(children = newChildren)
}

object RangeChunkId {
  /** Atomic types whose internal values this kernel can compare —
    * everything Spark can range-sort except raw binary.
    */
  def orderable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType | DateType | TimestampType |
        TimestampNTZType | NullType => true
    case _: DecimalType => true
    case _: YearMonthIntervalType | _: DayTimeIntervalType => true
    case _ => false
  }
}
