package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Cast, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, CurrentRow, UnspecifiedFrame, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite (the `Rule[LogicalPlan]` tier of the extension
  * ladder, next to the `graft_dot` Expression, the KmvSketch Aggregator,
  * and the TopKPerKey Strategy/Exec): users who write the idiomatic
  * built-in form
  *
  * {{{ row_number().over(Window.partitionBy(k).orderBy(o)) <= K }}}
  *
  * get the native bounded-heap [[TopKPerKey]] operator automatically.
  * The window form must fully sort every key group on the ordering
  * columns before it can rank; the rewritten plan streams each group
  * through a K-heap — O(n log K) comparisons and K rows resident — the
  * difference between "sort 100 TB of candidate pairs" and "stream them
  * through fixed memory". (Spark's own InferWindowGroupLimit bounds the
  * sort's input but still sorts and still ranks; it also runs in a later
  * batch than injected rules, so this rewrite sees the plain pattern.)
  *
  * Fires only on the exactly-safe shape: ONE window expression in the
  * node, and it is `row_number()` over a non-empty partition spec with
  * the standard running frame; the filter carries a `rn <= K` (or
  * equivalent) conjunct. Ties: row_number is only deterministic under a
  * total per-key order — the same contract under which the rewrite is
  * row-identical. Remaining conjuncts stay in a Filter above; downstream
  * references survive because the replacement projection reuses the rank
  * attribute's exprId (cast back to the window function's IntegerType).
  */
class RankLimitToTopK extends Rule[LogicalPlan] with PredicateHelper {

  private def supportedFrame(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case UnspecifiedFrame => true
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
      case _ => false
    }

  /** `conjunct` as an upper bound on `rn`: Some(K) iff it pins rn <= K. */
  private def limitOf(conjunct: Expression, rn: Attribute): Option[Int] =
    conjunct match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, spec), _)),
          partitionSpec, orderSpec, child, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty &&
          supportedFrame(spec) =>
      val rn = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val ks = conjuncts.flatMap(limitOf(_, rn))
      if (ks.isEmpty || ks.min < 1) f
      else {
        val k = ks.min
        val topk = TopKPerKey(k, partitionSpec, orderSpec, child)
        val restored = Project(
          child.output :+
            Alias(Cast(topk.rankAttr, IntegerType), rn.name)(exprId = rn.exprId),
          topk)
        val rest = conjuncts.filter(limitOf(_, rn).isEmpty)
        if (rest.isEmpty) restored
        else Filter(rest.reduce(And), restored)
      }
  }
}
