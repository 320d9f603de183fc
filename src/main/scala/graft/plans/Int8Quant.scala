package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric per-vector int8 quantization: scale = max|x|/127,
  * qᵢ = round(xᵢ/scale) — 4× (float) / 8× (double) smaller embedding
  * storage, the difference between 100 TB of vectors and 25 TB. The
  * reconstruction error bound |xᵢ − qᵢ·scale| ≤ scale/2 is exact, and
  * cosine between two quantized vectors needs no dequantization at all
  * (per-vector scales cancel — see [[Int8Cosine]]).
  *
  * Why native (SURVEY §7.3 escalation): the composed form is three
  * interpreted higher-order-function passes (max-abs, divide-round,
  * clamp) per vector; this is one primitive loop with real `doGenCode`,
  * staying inside whole-stage codegen on the scan that writes the
  * quantized corpus.
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def prettyName: String = "int8_quantize"

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_quantize needs array<float|double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val a = math.abs(v)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    val q = new Array[Byte](n)
    if (scale > 0) {
      i = 0
      while (i < n) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        q(i) = Math.round(v / scale).toByte
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](scale, new GenericArrayData(q)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val a = ctx.freshName("a")
      val maxAbs = ctx.freshName("maxAbs")
      val scale = ctx.freshName("scale")
      val q = ctx.freshName("q")
      val get = if (isFloat) s"(double) $arr.getFloat" else s"$arr.getDouble"
      s"""
         |int $n = $arr.numElements();
         |double $maxAbs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = Math.abs($get($i));
         |  if ($a > $maxAbs) $maxAbs = $a;
         |}
         |double $scale = $maxAbs / 127.0;
         |byte[] $q = new byte[$n];
         |if ($scale > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = $get($i);
         |    $q[$i] = (byte) Math.round($v / $scale);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $scale,
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($q) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** Cosine similarity between two int8-quantized vectors, scale-free:
  * cos(a·sₐ, b·s_b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²) — the per-vector scales
  * cancel, so similarity search over a quantized corpus touches only
  * int8 payloads (integer multiply-adds; one double division at the
  * end). 0.0 when either vector is all-zero, matching
  * [[graft.sim.Similarity.cosine]].
  */
case class Int8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int8_cosine needs two array<tinyint>, got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L; var nx = 0L; var ny = 0L
    var i = 0
    while (i < n) {
      val xi = x.getByte(i).toLong
      val yi = y.getByte(i).toLong
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val d = math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble)
    if (d == 0) 0.0 else dot / d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val d = ctx.freshName("d")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |long $dot = 0L; long $nx = 0L; long $ny = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = (long) $x.getByte($i);
         |  long $yi = (long) $y.getByte($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |double $d = Math.sqrt((double) $nx) * Math.sqrt((double) $ny);
         |${ev.value} = ($d == 0) ? 0.0 : $dot / $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Cosine =
    copy(left = newLeft, right = newRight)
}
