package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.MinBy
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan,
  Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, MapType,
  NullType, StructType}

/** Optimizer rule: rewrite the keep-first dedup idiom
  *
  * {{{
  *   SELECT ... FROM (
  *     SELECT *, row_number() OVER (PARTITION BY fp ORDER BY id) AS rn
  *     FROM t) WHERE rn = 1
  * }}}
  *
  * into a `min_by(struct(payload), id)` aggregate. The window form
  * shuffles EVERY row to its fingerprint's partition and then sorts the
  * whole partition just to pick each group's minimum — at 100 TB the
  * dedup shuffle is the dominant stage of a curation pass, the network
  * is its bottleneck, and a single hot fingerprint skews one reducer.
  * The aggregate form is map-side combinable: each map task forwards
  * ONE candidate row per fingerprint it saw, so the exchange carries
  * the distinct-key count, not the corpus, and giant duplicate classes
  * collapse before they can skew. (Struct-valued min_by buffers aren't
  * hash-aggregable, so the physical plan is a SortAggregate pair — the
  * map-side key-sort it adds runs embarrassingly parallel over local
  * runs and is the standard combiner price; a TypedImperativeAggregate
  * would fall back to the same sort past ObjectHashAggregate's 128-key
  * threshold at dedup cardinalities. VERDICT r10 "what's wrong" #3;
  * the k>1 descending cousin of this rule is [[TopKRewrite]] — the
  * shapes are disjoint, a single ascending sort column here vs the
  * (DOUBLE DESC, LONG ASC) pair there.)
  *
  * Fires only when equivalence is provable:
  *   - single window expression, and it is `row_number()`;
  *   - order is exactly ONE ASCENDING, NON-NULLABLE, atomic-typed
  *     attribute (nullable would rank nulls first in the window while
  *     `min_by` skips them — no equivalence claim, no rewrite);
  *   - the filter keeps exactly rank 1 (`rn = 1` / `rn <= 1` /
  *     `rn < 2`) and is the ENTIRE filter condition;
  *   - partition keys are plain attributes.
  * Ordering ties pick an arbitrary row under BOTH forms (the window's
  * sort is unstable, `min_by`'s tie is first-encountered), so the
  * rewrite introduces no new nondeterminism. Every original output
  * attribute (and the rank column, constant 1 after the filter) is
  * rebuilt under its original exprId, so parent plans resolve
  * unchanged. ScaleOpsSpec pins the firing rewrite (no Window/Sort in
  * the optimized plan + result equality) and the non-firing guards.
  */
object KeepFirstRewrite extends Rule[LogicalPlan] {

  /** Scalar orderable types only (AtomicType is private[sql] in Spark
    * 4): complex types order recursively and NaN/array corner cases
    * would need their own equivalence argument — out of scope.
    */
  private def scalarOrderable(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType | NullType => false
    case _ => RowOrdering.isOrderable(dt)
  }

  /** Does `cond` keep exactly rank 1 of `rn`? */
  private def keepsRankOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, Literal(1, IntegerType)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, IntegerType), a: Attribute) => a.semanticEquals(rn)
    case LessThanOrEqual(a: Attribute, Literal(1, IntegerType)) => a.semanticEquals(rn)
    case LessThan(a: Attribute, Literal(2, IntegerType)) => a.semanticEquals(rn)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond,
        Window(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)),
          partSpec,
          Seq(SortOrder(ord: AttributeReference, Ascending, _, _)),
          child, _))
        if !ord.nullable && scalarOrderable(ord.dataType) &&
          partSpec.nonEmpty &&
          partSpec.forall(_.isInstanceOf[AttributeReference]) &&
          keepsRankOne(cond, al.toAttribute) &&
          // payload non-empty: at least the sort column itself is not a
          // partition key (all-keys output would be a plain distinct —
          // out of scope)
          child.output.exists(a =>
            !partSpec.exists(_.asInstanceOf[AttributeReference].exprId == a.exprId)) =>
      val partAttrs = partSpec.map(_.asInstanceOf[AttributeReference])
      val payload = child.output.filterNot(a =>
        partAttrs.exists(_.exprId == a.exprId))
      val kfAlias = Alias(
        MinBy(CreateStruct(payload), ord).toAggregateExpression(), "__kf")()
      val agg = Aggregate(partAttrs, partAttrs :+ kfAlias, child)
      val kf = kfAlias.toAttribute
      // rebuild the window's full output under the ORIGINAL exprIds.
      // min_by over a non-empty group of non-null structs never returns
      // null, so non-nullable originals stay provably non-null
      // (KnownNotNull) — parents compiled against the original
      // nullability stay sound.
      val rebuilt: Seq[NamedExpression] = child.output.map { a =>
        partAttrs.find(_.exprId == a.exprId).getOrElse {
          val g = GetStructField(kf, payload.indexWhere(_.exprId == a.exprId),
            Some(a.name))
          Alias(if (a.nullable) g else KnownNotNull(g), a.name)(exprId = a.exprId)
        }
      }
      val rnAttr = al.toAttribute
      val rn = Alias(Literal(1), rnAttr.name)(exprId = rnAttr.exprId)
      Project(rebuilt :+ rn, agg)
  }
}
