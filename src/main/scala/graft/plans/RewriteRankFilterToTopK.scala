package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: plans the ubiquitous top-k-per-key window idiom —
  *
  * {{{
  *   df.withColumn("rn", row_number().over(W.partitionBy(k).orderBy(o)))
  *     .filter(col("rn") <= k)
  *     .drop("rn")
  * }}}
  *
  * — directly into [[TopKPerKeyNode]], removing the full partition sort
  * that the Exchange → Sort → Window → Filter formulation pays (Spark's
  * own `InferWindowGroupLimit` only bounds the rows ENTERING the sort;
  * the sort itself stays). The rewrite fires only when it is safe:
  *
  *  - exactly one window expression, and it is `row_number()` (rank /
  *    dense_rank emit ties past k — different semantics);
  *  - the filter is a simple bound on that rank output (`rn <= k`,
  *    `rn < k`, `rn = 1`, or the reversed comparisons);
  *  - a Project above DISCARDS the rank column (references only the
  *    window child's output) — if the rank value itself is consumed,
  *    the window must stay;
  *  - the partition spec is non-empty (global top-k already plans as
  *    TakeOrderedAndProject).
  *
  * Results are identical to the window formulation whenever the window
  * ordering is total — the same caveat `row_number` itself carries: with
  * ties, ANY plan change (partitioning, Spark version) may pick a
  * different survivor, so callers should always tie-break on a unique
  * column. A `Window` whose child Spark already rewrote into
  * `WindowGroupLimit` matches too (the group-limit pre-filter is
  * subsumed by the heap).
  *
  * Injected per session via `SparkSessionExtensions
  * .injectOptimizerRule` ([[graft.ext.GraftExtensions]]); disable for a
  * session by adding `graft.plans.RewriteRankFilterToTopK` to
  * `spark.sql.optimizer.excludedRules`.
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  /** k such that `cond` ⇔ rank ≤ k, if `cond` is such a bound. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
          if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k))
          if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1))
          if a.semanticEquals(rn) => Some(1)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute)
          if a.semanticEquals(rn) => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute)
          if a.semanticEquals(rn) => Some(k - 1)
      case _ => None
    }

  /** The group-limit pre-filter is subsumed by the heap ONLY when it
    * limits the same groups in the same order to at least k rows — stock
    * `InferWindowGroupLimit` always inserts a matching node, but another
    * rule/extension could insert a stricter one whose filtering is part
    * of the plan's semantics and must not be discarded. */
  private def subsumed(
      wgl: WindowGroupLimit,
      part: Seq[Expression],
      order: Seq[SortOrder],
      k: Int): Boolean =
    wgl.limit >= k &&
      wgl.rankLikeFunction.isInstanceOf[RowNumber] &&
      wgl.partitionSpec.length == part.length &&
      wgl.partitionSpec.zip(part).forall { case (a, b) => a.semanticEquals(b) } &&
      wgl.orderSpec.length == order.length &&
      wgl.orderSpec.zip(order).forall { case (a, b) => a.semanticEquals(b) }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond,
        Window(Seq(al @ Alias(WindowExpression(RowNumber(), _), _)),
          part, order, wchild, _))) if part.nonEmpty && order.nonEmpty =>
      limitOf(cond, al.toAttribute) match {
        case Some(k) if k > 0 =>
          // Spark's InferWindowGroupLimit may already have slid a
          // group-limit under the window; strip it only when its fields
          // prove the heap subsumes it — a non-matching one stays as the
          // heap's child (it was in the original plan, so keeping it
          // preserves semantics either way)
          val child = wchild match {
            case wgl: WindowGroupLimit if subsumed(wgl, part, order, k) =>
              wgl.child
            case other => other
          }
          if (projList.forall(_.references.subsetOf(child.outputSet)))
            Project(projList, TopKPerKeyNode(k, part, order, child))
          else p
        case _ => p
      }
  }
}
