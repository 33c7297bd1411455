package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native running-sum over an array<double>: out(i) = sum(in(0..i)).
  *
  * This is the closed column form of the generator's cumulative series
  * (event arrival clocks, random-walk positions) inside flat sequences.
  * The pure-built-in formulation — `aggregate` folding with
  * `array_append` — copies the accumulator array on every step: O(n²)
  * element copies per row, which at a 100-element series and millions of
  * rows dominates the whole generation stage (measured 4× slower than
  * the row-at-a-time interpreter at 2M rows). This expression is one
  * O(n) primitive loop spliced into whole-stage codegen.
  *
  * Accumulation is in index order with a single double accumulator —
  * bit-identical to the `aggregate` fold it replaces, so swapping
  * lowerings never changes generated data.
  *
  * A null input array yields NULL; a null element yields NULL (the
  * fold's `acc + null` semantics — every later partial sum is unknown).
  */
case class PrefixSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"prefix_sum needs array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "prefix_sum"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      s += a.getDouble(i)
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      s"""
        int $n = $a.numElements();
        double[] $out = new double[$n];
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
          $s += $a.getDouble($i);
          $out[$i] = $s;
        }
        if (!${ev.isNull}) {
          ${ev.value} = ${classOf[UnsafeArrayData].getName}.fromPrimitiveArray($out);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PrefixSum =
    copy(child = newChild)
}
