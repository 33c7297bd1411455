package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native argmin-L2 centroid assignment — the per-row kernel under every
  * IVF fit/probe path (ops/Similarity.assignClusters). Replaces the
  * former Scala UDF, which deserialized a Seq[Double] per corpus row;
  * this is one fused primitive loop spliced into whole-stage codegen,
  * with the centroid matrix attached as a codegen reference object
  * (nCentroids × dim doubles — dimension-sized, shipped once per task
  * with the plan).
  *
  * Semantics (bit-identical to the old UDF and to the staged
  * higher-order-function fallback in Similarity.assignClusters — same
  * IEEE op order): unit-normalize the input in index order (zero
  * vectors stay zero), then per centroid accumulate Σ(c_i − x_i)² in
  * index order, strict `<` argmin so the FIRST best centroid wins.
  * Null elements or a centroid/input dimension mismatch yield NULL
  * (matching the zip_with-pads-with-null fallback semantics).
  */
case class NearestCentroid(child: Expression, centroids: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {

  // The field is an IndexedSeq so case-class equals/hashCode are
  // structural — with Array fields two identical nearest_centroid calls
  // never compare equal and semanticEquals / subexpression elimination /
  // exchange reuse silently degrade. The hot loops run over this
  // transient flat copy (rebuilt per deserialized task, dimension-sized).
  @transient private lazy val centroidArr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid needs array<double> input, got $other")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val x = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val xi = a.getDouble(i)
      x(i) = xi
      s += xi * xi
      i += 1
    }
    val nm = math.sqrt(s)
    if (nm > 0) { i = 0; while (i < n) { x(i) /= nm; i += 1 } }
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    val cents = centroidArr
    while (c < cents.length) {
      val cc = cents(c)
      if (cc.length != n) return null
      var d = 0.0
      i = 0
      while (i < n) { val t = cc(i) - x(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", centroidArr, "double[][]")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val nm = ctx.freshName("nm")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val cc = ctx.freshName("cc")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
        int $n = $a.numElements();
        double[] $x = new double[$n];
        double $s = 0.0;
        for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
          if ($a.isNullAt($i)) { ${ev.isNull} = true; }
          else { $x[$i] = $a.getDouble($i); $s += $x[$i] * $x[$i]; }
        }
        if (!${ev.isNull}) {
          double $nm = java.lang.Math.sqrt($s);
          if ($nm > 0) for (int $i = 0; $i < $n; $i++) $x[$i] /= $nm;
          int $best = 0;
          double $bestD = Double.MAX_VALUE;
          for (int $c = 0; $c < $cents.length && !${ev.isNull}; $c++) {
            double[] $cc = $cents[$c];
            if ($cc.length != $n) { ${ev.isNull} = true; break; }
            double $d = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              double $t = $cc[$i] - $x[$i];
              $d += $t * $t;
            }
            if ($d < $bestD) { $bestD = $d; $best = $c; }
          }
          if (!${ev.isNull}) ${ev.value} = $best;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
