package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Lower, StringTrim, Upper}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: collapse idempotent string-normalization stacks —
  * `upper(upper(x)) → upper(x)`, `lower(lower(x)) → lower(x)`,
  * `trim(trim(x)) → trim(x)`. Only true idempotent pairs are folded:
  * the absorbing compositions upper∘lower / lower∘upper are NOT
  * semantics-preserving under Unicode case mapping (lower(upper('ß'))
  * = "ss" ≠ lower('ß')) and must not be rewritten.
  *
  * These stacks arise naturally in layered cleansing pipelines (a view
  * upper-cases a code, a downstream consumer defensively upper-cases
  * again — exactly the reference's UPPER-at-view + UPPER-at-aggregate
  * pattern, dag_datapelangan.py:71/73 vs :190). Catalyst does not fold
  * them (checked on Spark 4.1); each redundant call is a per-row
  * string copy in the hot path.
  *
  * Injected via GraftExtensions.injectOptimizerRule — the (c)-level
  * extension point demonstrated end-to-end (SURVEY.md §4 note).
  */
object SimplifyRedundantCase extends Rule[LogicalPlan] {
  // direct pattern cases so transformAllExpressions does ONE linear
  // pass (a catch-all delegating to an inner transformUp re-walks
  // every subtree once per ancestor — O(n²) per optimizer iteration)
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Upper(Upper(c))  => Upper(c)
      case Lower(Lower(c))  => Lower(c)
      case StringTrim(StringTrim(c, None), None) => StringTrim(c, None)
    }
}
