package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigInteger, MathContext, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Scale-12 decimal rounding shared by the PQ assignment kernel and
  * the covariance pair-sum aggregate: the unscaled value of
  * `cast(double as decimal(p, 12))`, bit-for-bit (Spark casts through
  * the decimal value of `Double.toString` and HALF_UP-rounds;
  * ProductQuantizationSpec pins the long form against the real cast).
  */
object Scale12 {

  /** Exact unscaled value, any magnitude below the precision bound. */
  def roundBig(d: Double, maxPrecision: Int): BigInteger = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      throw new ArithmeticException(
        s"scale-12 round: non-finite $d cannot round to " +
          s"decimal($maxPrecision,12) (the ANSI cast throws here too)")
    val dec = new java.math.BigDecimal(java.lang.Double.toString(d),
      MathContext.DECIMAL128).setScale(12, RoundingMode.HALF_UP)
    if (dec.precision > maxPrecision) throw new ArithmeticException(
      s"scale-12 round: $d does not fit decimal($maxPrecision,12) " +
        "(the ANSI cast overflows here too)")
    dec.unscaledValue
  }

  /** Long fast path: rounds `d · 1e12` directly when the fraction is
    * farther than the representation error (≤ ~0.5 ulp(d)·1e12 +
    * 0.5 ulp(y), under 4.5e-3 for |d| ≤ 40) from the half-way point;
    * near half-way or beyond |y| = 4e13 it takes the exact
    * string-decimal form. Throws when the unscaled value exceeds a
    * long — callers with a wider domain use [[roundBig]] directly.
    */
  def round(d: Double, maxPrecision: Int): Long = {
    val y = d * 1e12
    if (math.abs(y) < 4e13) {
      val fl = math.floor(y)
      val f = y - fl
      if (math.abs(f - 0.5) > 0.01)
        return fl.toLong + (if (f > 0.5) 1L else 0L)
    }
    roundBig(d, maxPrecision).longValueExact()
  }
}

/** Per-partition state: exact scale-12 sums for every upper-triangle
  * (p ≤ q) dimension pair touched so far. Cell index `q(q+1)/2 + p`
  * is dimension-count independent, so a longer vector only APPENDS
  * cells — growth is a plain copy. Sums live in longs (a cell escapes
  * to BigInteger only if a term or sum outgrows 63 bits — unreachable
  * for bounded embeddings, exact if reached).
  */
final class CovPairBuffer {
  var d: Int = 0
  var flags: Array[Byte] = Array.emptyByteArray // 0 absent, 1 long sum,
  var sums: Array[Long] = Array.emptyLongArray  // 2 touched-null, 3 big
  var big: java.util.HashMap[Integer, BigInteger] = _

  def grow(nd: Int): Unit = if (nd > d) {
    val cells = nd * (nd + 1) / 2
    flags = java.util.Arrays.copyOf(flags, cells)
    sums = java.util.Arrays.copyOf(sums, cells)
    d = nd
  }

  def touchNull(idx: Int): Unit = if (flags(idx) == 0) flags(idx) = 2

  def add(idx: Int, term: Long): Unit = flags(idx) match {
    case 1 =>
      try sums(idx) = Math.addExact(sums(idx), term)
      catch { case _: ArithmeticException =>
        escalate(idx, BigInteger.valueOf(sums(idx))
          .add(BigInteger.valueOf(term)))
      }
    case 3 => escalate(idx, big.get(Integer.valueOf(idx))
      .add(BigInteger.valueOf(term)))
    case _ => sums(idx) = term; flags(idx) = 1
  }

  def addBig(idx: Int, term: BigInteger): Unit = flags(idx) match {
    case 1 => escalate(idx, BigInteger.valueOf(sums(idx)).add(term))
    case 3 => escalate(idx, big.get(Integer.valueOf(idx)).add(term))
    case _ => escalate(idx, term); // flags set by escalate
  }

  private def escalate(idx: Int, v: BigInteger): Unit = {
    if (big == null) big = new java.util.HashMap[Integer, BigInteger]()
    big.put(Integer.valueOf(idx), v)
    flags(idx) = 3
  }
}

/** `cov_pair_sums(vec)` — every upper-triangle co-moment sum in ONE
  * aggregate pass: `array<struct<i, j, sxy decimal(38,12)>>` with
  * 1-based dimension indexes, where sxy is EXACTLY
  * `sum(cast(x_i · x_j as decimal(30,12)))` over the input rows — the
  * value [[graft.sim.Similarity.covarianceMatrix]]'s pair-explode plan
  * aggregates from N·d(d+1)/2 generated rows. The explode form is
  * already map-side combined (no pair crosses an exchange), so what
  * this removes is the generate + d(d+1)/2-per-row hash-agg probes +
  * one Decimal box per product: the same sums accumulate in a flat
  * long array per partition, merged cell-wise.
  *
  * Null semantics mirror the explode form exactly: a null element
  * nulls every product it joins (the pair's group exists but
  * contributes no term — an all-null group yields a null sxy), a
  * null/empty vector generates nothing. Each product is
  * HALF_UP-rounded to scale 12 through the decimal value of
  * `Double.toString` ([[Scale12]]) — the bit-exact ANSI cast — and
  * summed exactly, so the emitted decimals (and their double casts)
  * are identical to the explode form's (CovPairSumsSpec pins it).
  */
case class CovPairSums(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CovPairBuffer] {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"cov_pair_sums needs array<float|double>, got ${other.simpleString}")
    }
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "cov_pair_sums"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("sxy", DecimalType(38, 12), nullable = true))))

  override def createAggregationBuffer(): CovPairBuffer = new CovPairBuffer

  override def update(b: CovPairBuffer, input: InternalRow): CovPairBuffer = {
    val a = child.eval(input)
    if (a == null) return b
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n == 0) return b
    b.grow(n)
    val xd = new Array[Double](n)
    val xn = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) xn(i) = true
      else xd(i) =
        if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var p = 0
    while (p < n) {
      val xNull = xn(p)
      val x = xd(p)
      var q = p
      while (q < n) {
        val idx = q * (q + 1) / 2 + p
        if (xNull || xn(q)) b.touchNull(idx)
        else {
          val v = x * xd(q)
          val y = v * 1e12
          if (math.abs(y) < 4e13) {
            val fl = math.floor(y)
            val f = y - fl
            if (math.abs(f - 0.5) > 0.01)
              b.add(idx, fl.toLong + (if (f > 0.5) 1L else 0L))
            else b.addBig(idx, Scale12.roundBig(v, 30))
          } else b.addBig(idx, Scale12.roundBig(v, 30))
        }
        q += 1
      }
      p += 1
    }
    b
  }

  override def merge(b: CovPairBuffer, o: CovPairBuffer): CovPairBuffer = {
    b.grow(o.d)
    val cells = o.d * (o.d + 1) / 2
    var idx = 0
    while (idx < cells) {
      o.flags(idx) match {
        case 1 => b.add(idx, o.sums(idx))
        case 2 => b.touchNull(idx)
        case 3 => b.addBig(idx, o.big.get(Integer.valueOf(idx)))
        case _ => ()
      }
      idx += 1
    }
    b
  }

  override def eval(b: CovPairBuffer): Any = {
    val out = Array.newBuilder[Any]
    var p = 0
    while (p < b.d) {
      var q = p
      while (q < b.d) {
        val idx = q * (q + 1) / 2 + p
        b.flags(idx) match {
          case 1 => out += InternalRow(p + 1, q + 1,
            Decimal(new java.math.BigDecimal(
              BigInteger.valueOf(b.sums(idx)), 12), 38, 12))
          case 2 => out += InternalRow(p + 1, q + 1, null)
          case 3 => out += InternalRow(p + 1, q + 1,
            Decimal(new java.math.BigDecimal(
              b.big.get(Integer.valueOf(idx)), 12), 38, 12))
          case _ => ()
        }
        q += 1
      }
      p += 1
    }
    new GenericArrayData(out.result())
  }

  override def serialize(b: CovPairBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.d)
    val cells = b.d * (b.d + 1) / 2
    out.write(b.flags, 0, cells)
    var idx = 0
    while (idx < cells) {
      b.flags(idx) match {
        case 1 => out.writeLong(b.sums(idx))
        case 3 =>
          val bytes = b.big.get(Integer.valueOf(idx)).toByteArray
          out.writeInt(bytes.length); out.write(bytes)
        case _ => ()
      }
      idx += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CovPairBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new CovPairBuffer
    b.grow(in.readInt())
    val cells = b.d * (b.d + 1) / 2
    in.readFully(b.flags, 0, cells)
    var idx = 0
    while (idx < cells) {
      b.flags(idx) match {
        case 1 => b.sums(idx) = in.readLong()
        case 3 =>
          val len = in.readInt()
          val raw = new Array[Byte](len)
          in.readFully(raw)
          b.flags(idx) = 0 // addBig escalates back to 3
          b.addBig(idx, new BigInteger(raw))
        case _ => ()
      }
      idx += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): CovPairSums =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CovPairSums =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CovPairSums =
    copy(child = newChildren(0))
}
