package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product over two array<long> columns — the hot
  * loop of every QUANTIZED similarity kernel (int8 ANN q68, quantized
  * IVF g86, SemDeDup q70): those queries evaluate one dot per
  * CANDIDATE PAIR, and the `aggregate(zip_with(...))` formulation
  * allocates a zipped ArrayData plus three lambda evaluations per
  * element per pair. Measured on the sf0.1 bench this was ~100 s per
  * query; the fused primitive loop below splices into whole-stage
  * codegen like [[CosineSimilarity]] does for the float path.
  *
  * Overflow is the caller's contract (int8 codes: |a·b| ≤ 127²·d —
  * nowhere near 2^63). Mismatched lengths or null elements yield NULL,
  * bit-matching the HOF formulation (zip_with pads with null, nulling
  * the sum), so the HOF fallback is result-identical.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int_dot needs two array<bigint> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $dot = 0L;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $dot += $a.getLong($i) * $b.getLong($i);
          }
          if (!${ev.isNull}) {
            ${ev.value} = $dot;
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}
