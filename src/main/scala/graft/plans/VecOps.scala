package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity between two float/double vectors as ONE primitive
  * codegen loop (dot + both norms in a single pass).
  *
  * Why native (SURVEY §7.3 escalation): the composed form —
  * `aggregate(zip_with(a,b,*))` for the dot product, twice more for the
  * norms — runs its lambdas INTERPRETED and walks each array three
  * times with per-element closure dispatch; on the brute-force /
  * IVF-probe similarity scans that expression IS the query. The loop
  * accumulates left-to-right in double precision, exactly the
  * interpreted form's order, so both paths produce bit-identical
  * doubles and the DuckDB oracles don't move.
  *
  * Zero-vector (or empty) inputs yield 0.0, matching
  * [[graft.sim.Similarity.cosine]]'s `when(d === 0, 0.0)` guard; NaN
  * inputs propagate in both paths.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  private def elem(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }
  private lazy val leftIsFloat = elem(left.dataType).contains(FloatType)
  private lazy val rightIsFloat = elem(right.dataType).contains(FloatType)

  override def checkInputDataTypes(): TypeCheckResult =
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_cosine needs two array<float|double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val d = math.sqrt(nx) * math.sqrt(ny)
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
      val getX = if (leftIsFloat) s"(double) $x.getFloat" else s"$x.getDouble"
      val getY = if (rightIsFloat) s"(double) $y.getFloat" else s"$y.getDouble"
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $getX($i);
         |  double $yi = $getY($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |double $d = Math.sqrt($nx) * Math.sqrt($ny);
         |${ev.value} = ($d == 0) ? 0.0 : $dot / $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

/** Set Jaccard of two SORTED-DISTINCT long arrays via an allocation-
  * free merge walk — the candidate-verification kernel of MinHash
  * dedup. The composed form (`array_intersect` + sizes) builds a hash
  * set per candidate PAIR; sorting each document's shingle set once at
  * materialization (O(len log len), per doc) converts every pairwise
  * verification into a linear two-pointer walk (per pair — and on a
  * dup-heavy corpus pairs outnumber docs many times over).
  *
  * Semantics are exactly `|a ∩ b| / |a ∪ b|` with 0.0 for two empty
  * sets, bit-identical to the composed form on distinct inputs (small
  * integer counts divided in double precision). Inputs MUST be sorted
  * ascending with distinct elements — [[graft.dedup.Dedup]] guarantees
  * both (ngram_hashes dedupes; sort_array sorts).
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted needs two array<bigint>, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    val union = (nx + ny - inter).toDouble
    if (union == 0) 0.0 else inter / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val union = ctx.freshName("union")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xi = $x.getLong($i); long $yj = $y.getLong($j);
         |  if ($xi == $yj) { $inter++; $i++; $j++; }
         |  else if ($xi < $yj) $i++;
         |  else $j++;
         |}
         |double $union = (double) ($nx + $ny - $inter);
         |${ev.value} = ($union == 0) ? 0.0 : $inter / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}
