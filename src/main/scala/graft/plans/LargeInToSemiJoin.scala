package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, In, InSet, Literal}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §4's "only plausible custom rule"): rewrite
  * a Filter's `attr IN (v1 … vN)` with a large literal list into a
  * broadcast-able LEFT SEMI join against a LocalRelation of the
  * values.
  *
  * Rationale: Spark evaluates big IN lists per-row through InSet (a
  * boxed hash set above `spark.sql.optimizer.inSetConversionThreshold`)
  * — fine at hundreds of values, but the per-row probe cost grows
  * with set size while a broadcast semi join's unsafe-row hash build
  * stays flat, and the relation form participates in join-side
  * optimizations (dynamic pruning, semi pushdown) a filter cannot.
  *
  * DEFAULT-ON above 8192 values, decided by measurement
  * (`graft.InProbe`, ScaleUp 10×/100× lineitem, min of 5 reps):
  *
  *   n_values   InSet    rewrite   hand semi join
  *      500     0.15 s   0.19 s    0.19 s
  *    2 000     0.18 s   0.24 s    0.21 s
  *   10 000     0.35 s   0.31 s    0.22 s
  *   50 000     1.31 s   1.00 s    0.31 s   (100×: 3.58 / 2.69 / 1.87)
  *
  * Below the crossover (≈2k-10k) InSet wins — no exchange, no build —
  * so the 8192 threshold keeps small lists untouched; above it the
  * semi join wins and keeps winning as the list grows (the residual
  * gap to the hand-written join is the driver-side cost of ANALYZING
  * a 50k-literal In expression, which the rewrite cannot recover —
  * callers who own the value list should join a values frame
  * directly; this rule is the safety net for generated SQL).
  * Kill switch: `spark.graft.rewriteLargeIn=false`; threshold:
  * `spark.graft.rewriteLargeIn.threshold`.
  *
  * Null semantics: IN with a NULL probe yields NULL (row filtered);
  * LEFT SEMI on an equi-condition also drops NULL probes —
  * equivalent under Filter.
  */
case class LargeInToSemiJoin(spark: SparkSession) extends Rule[LogicalPlan] {

  val EnableKey = "spark.graft.rewriteLargeIn"
  val ThresholdKey = "spark.graft.rewriteLargeIn.threshold"

  // kill-switch parsing accepts the common spellings of "off" — a
  // default-ON rule whose disable key only matched the exact string
  // "false" would silently stay enabled under =off/=False/=0
  private def enabled: Boolean =
    spark.conf.getOption(EnableKey).map(_.trim.toLowerCase) match {
      case Some("false") | Some("off") | Some("no") | Some("0") => false
      case _ => true
    }
  private def threshold: Int =
    spark.conf.getOption(ThresholdKey).map(_.toInt).getOrElse(8192)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) plan
    else plan.transformUp {
      // user rules run after the main batches, where OptimizeIn has
      // already folded big literal lists into InSet — match both forms
      case Filter(In(attr: Attribute, values), child)
          if values.length > threshold &&
            values.forall(_.isInstanceOf[Literal]) &&
            !values.exists(_.asInstanceOf[Literal].value == null) =>
        semiJoin(child, attr,
          values.map(_.asInstanceOf[Literal].value).distinct)
      case Filter(InSet(attr: Attribute, hset), child)
          if hset.size > threshold && !hset.contains(null) =>
        semiJoin(child, attr, hset.toSeq)
    }
  }

  private def semiJoin(child: LogicalPlan, attr: Attribute,
      values: Seq[Any]): LogicalPlan = {
    val valueAttr = AttributeReference("__in_value", attr.dataType,
      nullable = false)()
    val valuesRel = LocalRelation(Seq(valueAttr), values.map(InternalRow(_)))
    Join(child, valuesRel, LeftSemi,
      Some(EqualTo(attr, valueAttr)), JoinHint.NONE)
  }
}
