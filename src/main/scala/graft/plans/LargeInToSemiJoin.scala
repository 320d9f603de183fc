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
  * Rationale: Spark evaluates big IN lists fine per-row (InSet hash
  * above `spark.sql.optimizer.inSetConversionThreshold`), but a
  * thousands-long literal list bloats the plan/codegen and cannot
  * participate in join-side optimizations (dynamic pruning, semi-join
  * pushdown on sources that support it). As a relation, the value set
  * goes through the normal join machinery.
  *
  * Opt-in (`spark.graft.rewriteLargeIn=true`) — the built-in InSet
  * path is already good, so this ships as a demonstration of the
  * `injectOptimizerRule` escalation path with a correctness spec, not
  * as a default. Null semantics: IN with a NULL probe yields NULL
  * (row filtered); LEFT SEMI on an equi-condition also drops NULL
  * probes — equivalent under Filter.
  */
case class LargeInToSemiJoin(spark: SparkSession) extends Rule[LogicalPlan] {

  val EnableKey = "spark.graft.rewriteLargeIn"
  val ThresholdKey = "spark.graft.rewriteLargeIn.threshold"

  private def enabled: Boolean =
    spark.conf.getOption(EnableKey).contains("true")
  private def threshold: Int =
    spark.conf.getOption(ThresholdKey).map(_.toInt).getOrElse(64)

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
