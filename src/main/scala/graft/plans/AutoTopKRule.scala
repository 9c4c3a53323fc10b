package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite `Filter(row_number <= k, Window(row_number
  * over partition/order))` into the bounded-heap [[TopKPerGroup]]
  * operator — for the regime Spark's own `InferWindowGroupLimit`
  * DECLINES (k above `spark.sql.optimizer.windowGroupLimitThreshold`,
  * default 1000), where the built-in window falls back to shuffling
  * and fully sorting every input row. With this rule installed, ANY
  * query in that shape — including plain `spark.sql` with a
  * `row_number() OVER (...) <= k` subquery — gets map-side bounded
  * heaps (≤ k·groups·partitions shuffle rows) without the user
  * knowing the custom operator exists. That is the top-N-per-domain
  * sampling shape of training-data pipelines.
  *
  * Guarded tightly — the rewrite fires only when:
  *  - the Window computes EXACTLY ONE expression, a `row_number()`
  *    (its frame is fixed ROWS UNBOUNDED PRECEDING..CURRENT ROW by
  *    construction, so no frame check is needed);
  *  - the partition spec is non-empty (a global top-k is
  *    TakeOrderedAndProject's job, and this engine bans unpartitioned
  *    windows outright — PlanSpec);
  *  - the filter is a single comparison pinning that row_number to at
  *    most a literal k, and k exceeds the built-in rule's threshold
  *    (below it, `WindowGroupLimit` already gives the window form the
  *    same map-side limiting — rewriting would only churn plans);
  *  - the rank attribute keeps its original exprId, so downstream
  *    references resolve unchanged.
  *
  * The per-element comparator honors SortOrder null ordering
  * (TopKHeap.Cmp), so null sort keys rank exactly as the window sort
  * would place them.
  *
  * Install via [[GraftExtensions]] (`spark.sql.extensions=graft.plans.GraftExtensions`)
  * or `graft.ops.TopK.install` — both also register [[TopKStrategy]],
  * which plans the logical node this rule emits.
  */
object AutoTopKRule extends Rule[LogicalPlan] {

  private def threshold: Int =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.sql.optimizer.windowGroupLimitThreshold", "1000").toInt

  /** `rn <= k` in any orientation; returns the effective k. */
  private def boundOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(r: Attribute, Literal(v: Int, IntegerType))
      if r.semanticEquals(rn) => Some(v)
    case LessThan(r: Attribute, Literal(v: Int, IntegerType))
      if r.semanticEquals(rn) => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), r: Attribute)
      if r.semanticEquals(rn) => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), r: Attribute)
      if r.semanticEquals(rn) => Some(v - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window)
        if w.windowExpressions.size == 1 && w.partitionSpec.nonEmpty &&
          w.orderSpec.nonEmpty =>
      w.windowExpressions.head match {
        case a @ Alias(WindowExpression(_: RowNumber, _), _) =>
          boundOf(cond, a.toAttribute) match {
            case Some(k) if k > threshold =>
              TopKPerGroup(
                w.partitionSpec,
                w.orderSpec,
                k,
                AttributeReference(a.name, IntegerType, nullable = false)(
                  exprId = a.exprId),
                w.child)
            case _ => f
          }
        case _ => f
      }
  }
}
