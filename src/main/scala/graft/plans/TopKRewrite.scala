package graft.plans

import graft.expr.TopKAgg

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate,
  LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule: rewrite the ranked-window top-k idiom
  *
  * {{{
  *   SELECT ... FROM (
  *     SELECT g, ord, id,
  *            row_number() OVER (PARTITION BY g ORDER BY ord DESC, id) AS rn
  *     FROM t) WHERE rn <= k
  * }}}
  *
  * into the bounded-heap `topk_agg` plan (Aggregate → PosExplode →
  * Project). The window form shuffles EVERY row of a group to one
  * partition and sorts the whole group; the rewritten plan's map-side
  * combine sends at most k rows per group per map task into the
  * shuffle — users write the natural SQL, the extension provides the
  * 100 TB plan. This is the repo's `Rule[LogicalPlan]` extension point
  * (SparkSessionExtensions.injectOptimizerRule), complementing the
  * injected functions, the `synth()` table function, and the `graft`
  * DataSource V2.
  *
  * The rewrite is SEMANTICS-PRESERVING, so it fires only when it can
  * prove equivalence:
  *   - single window expression, and it is `row_number()`;
  *   - order is exactly (DOUBLE attr DESC, BIGINT attr ASC) — the total
  *     order [[TopKAgg]] implements; the aggregate runs in
  *     `nanFirst` mode to replicate the window's NaN-above-reals
  *     descending order bit-for-bit;
  *   - ord/id attributes are NON-NULLABLE (a null ord would rank after
  *     NaN in the window form; the aggregate skips nulls — no claim of
  *     equivalence, so no rewrite);
  *   - the filter is `rn <= lit` / `rn < lit` on the window's own rank;
  *   - partition keys are plain attributes and the window's input
  *     carries NOTHING beyond (keys, ord, id) — every output column is
  *     then reconstructible from the aggregate (same exprIds, so parent
  *     plans resolve unchanged).
  * Anything else keeps its window. ScaleOpsSpec pins both the firing
  * rewrite (plan shape + result equality vs the window) and the
  * non-firing guards.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def kOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        Window(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)),
          partSpec,
          Seq(SortOrder(ord: AttributeReference, Descending, _, _),
            SortOrder(id: AttributeReference, Ascending, _, _)),
          child, _))
        if ord.dataType == DoubleType && !ord.nullable &&
          id.dataType == LongType && !id.nullable &&
          partSpec.forall(_.isInstanceOf[AttributeReference]) &&
          child.outputSet == AttributeSet(
            partSpec.map(_.asInstanceOf[AttributeReference]) ++ Seq(ord, id)) &&
          kOf(cond, al.toAttribute).exists(k => k >= 1 && k <= 65536) =>
      val k = kOf(cond, al.toAttribute).get
      val partAttrs = partSpec.map(_.asInstanceOf[AttributeReference])
      val tkAlias = Alias(
        TopKAgg(ord, id, k, nanFirst = true).toAggregateExpression(), "__tk")()
      val agg = Aggregate(partAttrs, partAttrs :+ tkAlias, child)
      val tkAttr = tkAlias.toAttribute
      val elemT = tkAttr.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType
      val posAttr = AttributeReference("__pos", IntegerType, nullable = false)()
      val elAttr = AttributeReference("__e", elemT, nullable = false)()
      val gen = Generate(PosExplode(tkAttr), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(posAttr, elAttr), child = agg)
      // rebuild the window's full output under the ORIGINAL exprIds so
      // every parent reference resolves without touching the rest of
      // the plan
      val rebuilt: Seq[NamedExpression] = child.output.map { a =>
        if (a.exprId == ord.exprId)
          Alias(GetStructField(elAttr, 0, Some("ord")), a.name)(exprId = a.exprId)
        else if (a.exprId == id.exprId)
          Alias(GetStructField(elAttr, 1, Some("id")), a.name)(exprId = a.exprId)
        else a
      }
      val rnAttr = al.toAttribute
      val rn = Alias(Add(posAttr, Literal(1)), rnAttr.name)(exprId = rnAttr.exprId)
      Project(rebuilt :+ rn, gen)
  }
}
