package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `nTables` random-hyperplane LSH bucket ids of a vector in ONE
  * codegen pass — the scale fix for
  * [[graft.sim.Similarity.lshSignature]]'s composed form, whose
  * per-plane `aggregate(zip_with(vec, sequence(...), …))` lambdas run
  * INTERPRETED: nTables × nPlanes (128 at the q_sim_lsh settings)
  * interpreted vector walks per corpus row, each allocating the
  * zipped pair array. Here one primitive loop reads each element once
  * and accumulates every (table, plane) projection.
  *
  * Bit-parity with the composed form (LshSignaturesSpec pins it):
  *
  *  - plane components are the same chained xxhash64 —
  *    `XXH64.hashInt(dim, hashInt(plane, hashInt(table, 42)))`, the
  *    (table, plane) prefix precomputed once — cast to double and
  *    divided by Long.MaxValue, multiplied by the element's
  *    double-cast value and summed LEFT-TO-RIGHT from 0.0, exactly
  *    the `aggregate` fold;
  *  - a null element nulls the running sum from its position on
  *    (zip_with product null → fold sticky-null), so EVERY plane's
  *    `sum > 0` is null and every bit falls to the `otherwise(0)` —
  *    bucket 0 on all tables; same for a NULL vector (null sequence →
  *    null fold). The expression is therefore NEVER null: it emits
  *    the all-zero-bucket array for those rows, exactly like the
  *    composed `array(struct(t, when(null > 0, …).otherwise(0)))`;
  *  - an empty vector folds to 0.0 → `0 > 0` false → bucket 0 (the
  *    composed form reaches the same buckets through zip_with's
  *    null-padding against `sequence(0, -1)`).
  *
  * Output `array<struct<t int, b bigint>>`, one entry per table in
  * table order — `explode` replaces the composed `explode(array(
  * struct(...)))` verbatim.
  */
final class LshSigKernel(val nPlanes: Int, val nTables: Int)
    extends Serializable {
  require(nPlanes >= 1 && nPlanes <= 63, s"nPlanes in [1,63], got $nPlanes")
  require(nTables >= 1, s"nTables >= 1, got $nTables")

  // seed(t·nPlanes + p) = xxhash64 chain of the (table, plane) prefix
  private val seeds: Array[Long] = Array.tabulate(nTables * nPlanes) {
    tp => XXH64.hashInt(tp % nPlanes, XXH64.hashInt(tp / nPlanes, 42L))
  }
  private val LongMaxD = Long.MaxValue.toDouble

  /** The all-zero-bucket array — null/null-element rows' signatures. */
  def zeros(): ArrayData = {
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      out(t) = new GenericInternalRow(Array[Any](t, 0L)); t += 1
    }
    new GenericArrayData(out)
  }

  def signatures(x: ArrayData, isFloat: Boolean): ArrayData = {
    val n = x.numElements()
    val nTP = seeds.length
    val sums = new Array[Double](nTP)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return zeros() // sticky-null fold: all bits 0
      val xd = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      var tp = 0
      while (tp < nTP) {
        sums(tp) += xd * (XXH64.hashInt(i, seeds(tp)).toDouble / LongMaxD)
        tp += 1
      }
      i += 1
    }
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var b = 0L
      var p = 0
      while (p < nPlanes) {
        if (sums(t * nPlanes + p) > 0) b |= 1L << p
        p += 1
      }
      out(t) = new GenericInternalRow(Array[Any](t, b))
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `lsh_signatures(vec)` — see [[LshSigKernel]]. Built by
  * [[graft.sim.Similarity.lshTopK]]; not registered as a SQL function
  * (table/plane counts are plan-time parameters — the
  * [[NearestCentroid]] posture).
  */
case class LshSignatures(child: Expression, nPlanes: Int, nTables: Int)
    extends UnaryExpression {

  private lazy val kernel = new LshSigKernel(nPlanes, nTables)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", IntegerType, nullable = false),
    StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "lsh_signatures"
  // never null: a null vector still has a (all-zero) bucket per table,
  // exactly like the composed form's array(struct(t, 0L))
  override def nullable: Boolean = false

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_signatures needs array<float|double>, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) kernel.zeros()
    else kernel.signatures(v.asInstanceOf[ArrayData], isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("lshSigKernel", kernel,
      classOf[LshSigKernel].getName)
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  ${childGen.isNull}
        |    ? $ref.zeros()
        |    : $ref.signatures(${childGen.value}, $isFloat);
        |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LshSignatures = copy(child = newChild)
}
