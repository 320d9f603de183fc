package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expression: 64-bit SimHash from an `array<bigint>`
  * of token hashes — bit i of the result is set iff the sum over
  * tokens of ±1 (sign chosen by bit i of the token hash) is positive.
  *
  * The composed-builtin form needs 64 interpreted `aggregate` passes
  * over the hash array (one per bit); this is one pass with a 64-slot
  * counter array in a primitive loop, codegen'd.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      // loop variables also need freshName: bare `i`/`j` shadow any
      // enclosing generated local of the same name (e.g. a
      // higher-order-function index var) and janino rejects local
      // shadowing — the silent cost is an interpreted fallback of the
      // whole stage, the exact path this expression exists to codegen
      val i = ctx.freshName("i")
      val i2 = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int[] $counts = new int[64];
         |int $n = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $arr.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ((($h >>> $i) & 1L) == 1L) $counts[$i]++; else $counts[$i]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $i2 = 0; $i2 < 64; $i2++) {
         |  if ($counts[$i2] > 0) $sig |= (1L << $i2);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
