package graft.plans

import java.math.{MathContext, RoundingMode}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization code assignment as ONE pure-projection codegen
  * call — the scale fix for the component-form assignment plan
  * ([[graft.sim.ProductQuantization.assignCodes]]), which joins the
  * exploded (id, sub, q, x) table against the broadcast codebooks on
  * (sub, q) and so materializes N·d·ksub distance rows through two
  * hash aggregates (at d = 64, ksub = 16 that is 1024 rows per corpus
  * vector through an exchange — and codebook training replays the
  * assignment iters+1 times).
  *
  * Semantics are BIT-IDENTICAL to the join form, including its decimal
  * arithmetic: per (vector, subspace, code) the join form computes
  * `sum(cast((x − c)² as decimal(27,12)))` — every squared term
  * HALF_UP-rounded to 12 decimal places via the decimal value of
  * `Double.toString`, then summed exactly — and takes
  * `min_by(cid, struct(d2, cid))`. The kernel reproduces exactly that:
  * each term is rounded to the identical scale-12 unscaled long
  * ([[PqKernel.roundScale12]], pinned against Spark's own cast in
  * PqKernelSpec) and accumulated exactly in a long (terms are bounded
  * — inputs are unit-normalized, so (x−c)² ≤ ~4 and a subspace holds
  * ≤ d terms; overflow would throw loudly, not wrap). Join-form edge
  * semantics carry over precisely:
  *
  *  - a (sub, q) with no codebook row contributes NO term (inner-join
  *    drop), and a code with no matching q at all produces NO group —
  *    it is not a candidate;
  *  - a null vector element nulls the whole row's normalized values
  *    (the norm's zip_with/aggregate chain propagates null), so every
  *    matched group's d2 is null and `min_by`'s struct ordering
  *    (null-first ascending) hands the code to the smallest matched
  *    cid — the kernel replays that ordering;
  *  - an all-zero vector divides by 1.0 (the `when(nrm === 0, 1.0)`
  *    guard), a null/empty vector emits no codes.
  *
  * Scale posture: the codebooks ride a BROADCAST built once on the
  * driver from the bounded books table (m·ksub·(d/m) component rows —
  * thousands); the operator is a map, embeds in whole-stage codegen,
  * and shuffles nothing.
  */
final class PqKernel(
    val subIds: Array[Int],
    val cidsBySub: Array[Array[Int]],
    // cVal(subIdx)(cidIdx)(q); cState: 0 = no codebook row for this
    // (sub, cid, q), 1 = present, 2 = present with NULL c
    val cVal: Array[Array[Array[Double]]],
    val cState: Array[Array[Array[Byte]]]) extends Serializable {

  require(subIds.length == cidsBySub.length &&
    subIds.length == cVal.length && subIds.length == cState.length,
    "PqKernel: per-subspace array length mismatch")
  require((1 until subIds.length).forall(i => subIds(i - 1) < subIds(i)),
    "PqKernel: subspace ids must be strictly ascending")
  cidsBySub.foreach { cs =>
    require((1 until cs.length).forall(i => cs(i - 1) < cs(i)),
      "PqKernel: code ids must be strictly ascending per subspace")
  }

  /** One (sub, cid) struct per subspace the row and the codebooks
    * share — the argmin codes of [[graft.sim.ProductQuantization]]'s
    * join form, in ascending-sub order.
    */
  def encode(x: ArrayData, isFloat: Boolean, m: Int): ArrayData = {
    val n = x.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])

    var anyNull = false
    val xd = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) anyNull = true
      else xd(i) = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    // Similarity.norm: left-to-right double sum of squares, then sqrt;
    // any null element nulls the whole sum (zip_with product null →
    // aggregate null), which nulls every normalized component
    var div = 1.0
    if (!anyNull) {
      var s = 0.0
      i = 0
      while (i < n) { s += xd(i) * xd(i); i += 1 }
      val nrm = math.sqrt(s)
      if (java.lang.Double.isNaN(nrm)) throw new ArithmeticException(
        "pq_encode: NaN vector norm (NaN component?) — the join-form " +
          "decimal cast would fail here too")
      div = if (nrm == 0.0) 1.0 else nrm
    }
    val dsub = n / m // (d / m).cast("int") — int truncation for positives

    val out = Array.newBuilder[Any]
    var p = 0
    while (p < n) {
      // sub = (p·m / d).cast("int"): double-divide + truncate equals
      // integer division for positive ints in range
      val sub = ((p.toLong * m) / n).toInt
      var end = p + 1
      while (end < n && ((end.toLong * m) / n).toInt == sub) end += 1
      val subIdx = java.util.Arrays.binarySearch(subIds, sub)
      if (subIdx >= 0) {
        val cids = cidsBySub(subIdx)
        val vals = cVal(subIdx)
        val states = cState(subIdx)
        var bestCi = -1
        var bestNull = false
        var bestSum = 0L
        var ci = 0
        while (ci < cids.length) {
          var matched = false
          var hasTerm = false
          var sum = 0L
          val v = vals(ci)
          val st = states(ci)
          var pp = p
          while (pp < end) {
            val q = pp - sub * dsub
            if (q >= 0 && q < st.length && st(q) != 0) {
              matched = true
              if (!anyNull && st(q) == 1) {
                val xv = xd(pp) / div
                val diff = xv - v(q)
                sum = Math.addExact(sum,
                  PqKernel.roundScale12(diff * diff))
                hasTerm = true
              }
            }
            pp += 1
          }
          if (matched) {
            // min_by(cid, struct(d2, cid)): null d2 sorts FIRST
            // (ascending struct ordering); ties fall to the smaller
            // cid — ascending scan + strict improvement keeps it
            val better =
              if (bestCi < 0) true
              else if (!hasTerm) !bestNull // null beats values only
              else !bestNull && sum < bestSum
            if (better) {
              bestCi = ci; bestNull = !hasTerm; bestSum = sum
            }
          }
          ci += 1
        }
        if (bestCi >= 0)
          out += new GenericInternalRow(Array[Any](sub, cids(bestCi)))
      }
      p = end
    }
    new GenericArrayData(out.result())
  }
}

object PqKernel {

  private val Scale12 = 1e12

  /** `cast(sq as decimal(27,12))`'s unscaled long, bit-for-bit: Spark
    * casts a double through the decimal value of `Double.toString`
    * and HALF_UP-rounds to scale 12 (pinned against the real cast in
    * PqKernelSpec). The fast path rounds `sq · 1e12` directly and is
    * exact whenever the fraction is farther than the combined
    * representation error (≤ ~0.5 ulp(sq)·1e12 + 0.5 ulp(y), well
    * under the 0.01 guard for sq ≤ 40) from the half-way point; near
    * half-way — or for the large values the unit-normalized dataflow
    * never produces — it falls back to the exact string-decimal form.
    */
  def roundScale12(sq: Double): Long = {
    if (java.lang.Double.isNaN(sq) || java.lang.Double.isInfinite(sq))
      throw new ArithmeticException(
        s"pq_encode: non-finite squared distance $sq cannot round to " +
          "decimal(27,12) (the join-form ANSI cast throws here too)")
    val y = sq * Scale12
    if (y < 4e13) { // sq < 40: repr error < 4.5e-3 ≪ the 0.01 guard
      val fl = math.floor(y)
      val f = y - fl
      if (math.abs(f - 0.5) > 0.01)
        return fl.toLong + (if (f > 0.5) 1L else 0L)
    }
    slowRound(sq)
  }

  private def slowRound(sq: Double): Long = {
    // scala.math.BigDecimal(double) = java BigDecimal of
    // Double.toString under MathContext.DECIMAL128 (≤ 17 sig digits,
    // so the context never rounds); changePrecision rounds HALF_UP
    val d = new java.math.BigDecimal(java.lang.Double.toString(sq),
      MathContext.DECIMAL128).setScale(12, RoundingMode.HALF_UP)
    if (d.precision > 27) throw new ArithmeticException(
      s"pq_encode: $sq does not fit decimal(27,12) (the join-form " +
        "ANSI cast overflows here too)")
    d.unscaledValue.longValueExact // ≤ 27 digits > long is unreachable
  }                                // for unit-normalized inputs

  /** Build the broadcast kernel from collected codebook rows
    * (sub, cid, q, c) — [[graft.sim.ProductQuantization.train]]'s
    * output shape. Validates the layout loudly: a duplicate
    * (sub, cid, q) would silently double a distance term in the join
    * form's sum; here it is a build-time error.
    */
  def fromRows(spark: org.apache.spark.sql.SparkSession,
      rows: Array[org.apache.spark.sql.Row]): Broadcast[PqKernel] = {
    final case class Ent(sub: Int, cid: Int, q: Int, c: Any)
    val ents = rows.map { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2),
        "pq kernel: codebook row with NULL sub/cid/q")
      Ent(r.getInt(0), r.getInt(1), r.getInt(2),
        if (r.isNullAt(3)) null else r.getDouble(3))
    }
    require(ents.map(e => (e.sub, e.cid, e.q)).distinct.length ==
      ents.length, "pq kernel: duplicate (sub, cid, q) codebook row")
    val bySub = ents.groupBy(_.sub).toArray.sortBy(_._1)
    val subIds = bySub.map(_._1)
    val cidsBySub = bySub.map(_._2.map(_.cid).distinct.sorted)
    val cVal = new Array[Array[Array[Double]]](subIds.length)
    val cState = new Array[Array[Array[Byte]]](subIds.length)
    var si = 0
    while (si < subIds.length) {
      val entries = bySub(si)._2
      val cids = cidsBySub(si)
      val maxQ = entries.map(_.q).max
      require(entries.forall(_.q >= 0),
        "pq kernel: negative subspace offset q")
      cVal(si) = Array.fill(cids.length)(new Array[Double](maxQ + 1))
      cState(si) = Array.fill(cids.length)(new Array[Byte](maxQ + 1))
      entries.foreach { e =>
        val ci = java.util.Arrays.binarySearch(cids, e.cid)
        e.c match {
          case null => cState(si)(ci)(e.q) = 2
          case d: java.lang.Double =>
            cVal(si)(ci)(e.q) = d; cState(si)(ci)(e.q) = 1
        }
      }
      si += 1
    }
    spark.sparkContext.broadcast(
      new PqKernel(subIds, cidsBySub, cVal, cState))
  }
}

/** `pq_encode(vec)` against a broadcast [[PqKernel]]: the row's PQ
  * codes as `array<struct<sub int, cid int>>` in ascending-sub order
  * (explode to the join form's (sub, cid) rows). Built by
  * [[graft.sim.ProductQuantization.encodeCodes]]; not registered as a
  * SQL function because the kernel is a runtime object, not a literal
  * — the [[NearestCentroid]] posture.
  */
case class PqEncode(child: Expression, kernel: Broadcast[PqKernel],
    m: Int) extends UnaryExpression {

  require(m >= 1, s"pq_encode needs m >= 1, got $m")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sub", IntegerType, nullable = false),
    StructField("cid", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pq_encode"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<float|double>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    kernel.value.encode(a.asInstanceOf[ArrayData], isFloat, m)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val ref = ctx.addReferenceObj("pqKernel", kernel,
        classOf[Broadcast[_]].getName)
      s"""${ev.value} = ((graft.plans.PqKernel) $ref.value())
         |  .encode($x, $isFloat, $m);""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PqEncode = copy(child = newChild)
}
