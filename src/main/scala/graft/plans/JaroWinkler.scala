package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen expression — the fuzzy
  * name-matching scalar Spark lacks (it ships only `levenshtein`).
  * Semantics match DuckDB/rapidfuzz `jaro_winkler_similarity`: match
  * window ⌊max(len)/2⌋−1, transpositions = mismatched-match-pairs/2,
  * Winkler prefix boost (≤ 4 chars, weight 0.1) applied only when the
  * Jaro score exceeds 0.7, and 0.0 when either string is empty — the
  * reference vectors in JaroWinklerSpec pin each of those choices
  * against DuckDB's own outputs.
  *
  * Why native (SURVEY §7.3 escalation): per-row fuzzy scoring sits in
  * scan-side hot loops (dedup candidate verification, entity
  * resolution); the generated code calls one static JVM method — no
  * interpreted lambda, no UDF serialization wall, whole-stage codegen
  * unbroken. O(len₁·len₂) worst case like every JW implementation;
  * candidate PRUNING stays the job of the q-gram/prefix machinery
  * (EditDistJoin, setSimJoinPrefix) — this is the verifier, not the
  * pair generator.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs (string, string), got $other")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerSim.similarity(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.plans.JaroWinklerSim.similarity($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {

  /** Static entry point shared by interpreted eval and generated code. */
  def similarity(a: UTF8String, b: UTF8String): Double =
    sim(a.toString, b.toString)

  private def sim(s1: String, s2: String): Double = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val m1 = new Array[Boolean](len1)
    val m2 = new Array[Boolean](len2)
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: mismatches between the two matched sequences
    var mismatches = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val t = mismatches / 2.0
    val jaro = (m / len1 + m / len2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var prefix = 0
      val maxPrefix = math.min(4, math.min(len1, len2))
      while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix))
        prefix += 1
      jaro + prefix * 0.1 * (1.0 - jaro)
    }
  }
}
