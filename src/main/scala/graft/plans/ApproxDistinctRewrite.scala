package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule (injected by [[GraftExtensions]]): when the
  * session flag `spark.graft.approxDistinct` is true, every
  * single-column `COUNT(DISTINCT x)` in the plan is rewritten to
  * `approx_count_distinct(x)` (HyperLogLog++, default 5% rsd) — the
  * "approximation switch" big engines expose (BigQuery APPROX mode,
  * Druid) expressed as a Catalyst rewrite instead of a query edit.
  *
  * Why a RULE and not a helper function: dashboards and generated SQL
  * can't be edited per-run; flipping one session conf turns an exact
  * Expand+double-shuffle distinct plan into fixed-size mergeable sketch
  * state across the whole workload — the 100 TB knob. The rewrite
  * preserves the expression id, so downstream references and aliases
  * are untouched; multi-column distincts and filtered aggregates pass
  * through unchanged (HLL++ takes one child; a FILTER clause changes
  * semantics the sketch can honor, so it is kept as-is with the
  * original exact Count).
  */
case class ApproxDistinctRewrite(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!session.conf.get("spark.graft.approxDistinct", "false").toBoolean) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(c: Count, _, true, None, _)
          if c.children.size == 1 =>
        ae.copy(aggregateFunction = HyperLogLogPlusPlus(c.children.head),
          isDistinct = false)
    }
}
