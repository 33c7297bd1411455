package graft.expr

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * array<double> columns — the hot loop of ANN scans.
  *
  * Why an Expression and not `aggregate(zip_with(...))`: the
  * higher-order-function composition allocates a zipped ArrayData per
  * row and evaluates three lambda closures per element; this expression
  * is one fused primitive loop, and `doGenCode` splices it straight into
  * whole-stage codegen (SURVEY §4: "custom Expressions only if UDF/HOF
  * overhead shows up in BENCH" — it does, see the ANN bench queries).
  *
  * Accumulation is in index order with separate dot/norm accumulators —
  * bit-identical to the engine-portable HOF formulation, so swapping
  * implementations never changes results.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs two array<double> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // length mismatch / null elements
  override def prettyName: String = "cosine_sim"

  /** Mismatched lengths or null elements yield NULL — matching the
    * higher-order-function formulation (zip_with pads with nulls, which
    * null the sum), so swapping lowerings never changes results.
    */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0, $nx = 0.0, $ny = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            double $xi = $a.getDouble($i);
            double $yi = $b.getDouble($i);
            $dot += $xi * $yi;
            $nx += $xi * $xi;
            $ny += $yi * $yi;
          }
          if (!${ev.isNull}) {
            ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering graft's native functions; enable with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.expr.GraftExtensions`.
  *
  * Besides the scalar `cosine_sim`, this registers the `synth` TABLE
  * function — the pure-SQL face of the generator:
  *
  * {{{
  * SELECT * FROM synth('[{"name":"ip","class":"ipv4"}]', 1000)       -- seed 42
  * SELECT * FROM synth('[...]', 1000, 7)                             -- explicit seed
  * }}}
  *
  * Arguments must be literals (the schema compiles at analysis time —
  * that is what fixes the output schema). The plan it expands to is the
  * same `dataFrameAuto` lowering the Scala API produces: Catalyst fast
  * path when the schema is stateless, the mapPartitions source
  * otherwise.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension point: the native as-of join
    // (graft.plans.AsOfJoinNode / AsOfJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)

    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"cosine_sim takes 2 arguments, got ${children.length}")
        CosineSimilarity(children(0), children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"kmv_sketch(hash, k) takes 2 arguments, got ${children.length}")
        require(children(1).foldable, "kmv_sketch: k must be a literal")
        KmvSketchAgg(children.head, children(1).eval().toString.toInt)
      }))

    ext.injectFunction((
      new FunctionIdentifier("nearest_centroid"),
      new ExpressionInfo(classOf[NearestCentroid].getName, "nearest_centroid"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"nearest_centroid(vec, centroids) takes 2 arguments, got ${children.length}")
        require(children(1).foldable,
          "nearest_centroid: centroids must be a literal array<array<double>>")
        val ad = children(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val cents = IndexedSeq.tabulate(ad.numElements())(i =>
          ad.getArray(i).toDoubleArray().toIndexedSeq)
        NearestCentroid(children(0), cents)
      }))

    ext.injectFunction((
      new FunctionIdentifier("int_dot"),
      new ExpressionInfo(classOf[IntDotProduct].getName, "int_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"int_dot takes 2 arguments, got ${children.length}")
        IntDotProduct(children(0), children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("freq_sketch"),
      new ExpressionInfo(classOf[FreqSketchAgg].getName, "freq_sketch"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"freq_sketch(item, capacity) takes 2 arguments, got ${children.length}")
        require(children(1).foldable, "freq_sketch: capacity must be a literal")
        FreqSketchAgg(children.head, children(1).eval().toString.toInt)
      }))

    ext.injectFunction((
      new FunctionIdentifier("topk_agg"),
      new ExpressionInfo(classOf[TopKAgg].getName, "topk_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 3, s"topk_agg(ord, id, k) takes 3 arguments, got ${children.length}")
        require(children(2).foldable, "topk_agg: k must be a literal")
        TopKAgg(children(0), children(1), children(2).eval().toString.toInt)
      }))

    ext.injectFunction((
      new FunctionIdentifier("quantile_sketch"),
      new ExpressionInfo(classOf[QuantileSketchAgg].getName, "quantile_sketch"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"quantile_sketch(value, capacity) takes 2 arguments, got ${children.length}")
        require(children(1).foldable, "quantile_sketch: capacity must be a literal")
        QuantileSketchAgg(children.head, children(1).eval().toString.toInt)
      }))

    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"nfc_normalize takes 1 argument, got ${children.length}")
        NfcNormalize(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("psl_domain"),
      new ExpressionInfo(classOf[PslDomain].getName, "psl_domain"),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"psl_domain takes 1 argument, got ${children.length}")
        PslDomain(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("html_unescape"),
      new ExpressionInfo(classOf[HtmlUnescape].getName, "html_unescape"),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"html_unescape takes 1 argument, got ${children.length}")
        HtmlUnescape(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("decode_charset"),
      new ExpressionInfo(classOf[DecodeCharset].getName, "decode_charset"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"decode_charset(payload, charset) takes 2 arguments, got ${children.length}")
        DecodeCharset(children(0), children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("charset_known"),
      new ExpressionInfo(classOf[CharsetKnown].getName, "charset_known"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"charset_known(charset) takes 1 argument, got ${children.length}")
        CharsetKnown(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("robots_allowed"),
      new ExpressionInfo(classOf[RobotsAllowed].getName, "robots_allowed"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"robots_allowed(rules, agent, path) takes 3 arguments, got ${children.length}")
        RobotsAllowed(children(0), children(1), children(2))
      }))

    ext.injectFunction((
      new FunctionIdentifier("robots_crawl_delay"),
      new ExpressionInfo(classOf[RobotsCrawlDelay].getName, "robots_crawl_delay"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"robots_crawl_delay(rules, agent) takes 2 arguments, got ${children.length}")
        RobotsCrawlDelay(children(0), children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("hll_sketch"),
      new ExpressionInfo(classOf[HllSketchAgg].getName, "hll_sketch"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"hll_sketch(hash, p) takes 2 arguments, got ${children.length}")
        require(children(1).foldable, "hll_sketch: p must be a literal")
        HllSketchAgg(children.head, children(1).eval().toString.toInt)
      }))

    ext.injectFunction((
      new FunctionIdentifier("prefix_sum"),
      new ExpressionInfo(classOf[PrefixSum].getName, "prefix_sum"),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"prefix_sum takes 1 argument, got ${children.length}")
        PrefixSum(children.head)
      }))

    // sketch primitives (expr/SketchExprs.scala): trailing arguments
    // are literals fixed at plan time
    ext.injectFunction((
      new FunctionIdentifier("hash64_array"),
      new ExpressionInfo(classOf[Hash64Array].getName, "hash64_array"),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"hash64_array takes 1 argument, got ${children.length}")
        Hash64Array(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"minhash_sigs(hashes, k) takes 2 arguments, got ${children.length}")
        require(children(1).foldable, "minhash_sigs: k must be a literal")
        MinHashSigs(children.head, children(1).eval().toString.toInt)
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"simhash64 takes 1 argument, got ${children.length}")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("srp_sig"),
      new ExpressionInfo(classOf[SrpSig].getName, "srp_sig"),
      (children: Seq[Expression]) => {
        require(children.length == 4, s"srp_sig(v, seed, t, nBits) takes 4 arguments, got ${children.length}")
        require(children.drop(1).forall(_.foldable), "srp_sig: seed/t/nBits must be literals")
        def lng(i: Int): Long = children(i).eval() match {
          case l: Long => l; case x: Int => x.toLong; case o => o.toString.toLong
        }
        SrpSig(children.head, lng(1), lng(2).toInt, lng(3).toInt)
      }))

    // synth_series(kind, id, n, saltA, saltB, d1, d2, d3, fmt): the
    // native flat-sequence series generator (expr/SynthSeries.scala).
    // Everything but `id` is a literal — the series shape is fixed at
    // plan time, only the row id varies.
    ext.injectFunction((
      new FunctionIdentifier("synth_series"),
      new ExpressionInfo(classOf[SynthSeries].getName, "synth_series"),
      (args: Seq[Expression]) => {
        require(args.length == 9,
          s"synth_series(kind, id, n, saltA, saltB, d1, d2, d3, fmt) takes 9 arguments, got ${args.length}")
        require(args.patch(1, Nil, 1).forall(_.foldable),
          "synth_series: all arguments except id must be literals")
        def str(i: Int): String = String.valueOf(args(i).eval())
        def lng(i: Int): Long = args(i).eval() match {
          case l: Long => l; case x: Int => x.toLong; case o => o.toString.toLong
        }
        def dbl(i: Int): Double = args(i).eval() match {
          case d: Double => d; case l: Long => l.toDouble; case x: Int => x.toDouble
          case o => o.toString.toDouble
        }
        SynthSeries(args(1), str(0), lng(2).toInt, lng(3), lng(4),
          dbl(5), dbl(6), dbl(7), str(8))
      }))

    ext.injectTableFunction((
      new FunctionIdentifier("synth"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "synth"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          s"synth(schemaJson, n[, seed]) takes 2 or 3 arguments, got ${args.length}")
        require(args.forall(_.foldable), "synth() arguments must be literals")
        val schemaJson = args(0).eval() match {
          case null => throw new IllegalArgumentException("synth(): schema is null")
          case s    => s.toString
        }
        val n = args(1).eval() match {
          case i: Int  => i.toLong
          case l: Long => l
          case other   => other.toString.toLong
        }
        val seed = if (args.length == 3) args(2).eval().toString.toLong else 42L
        graft.synth.Synth
          .dataFrameAuto(org.apache.spark.sql.SparkSession.active, schemaJson, n, seed)
          .queryExecution.logical
      }))

    // optimizer extension point: ranked-window top-k SQL rewrites to
    // the bounded-heap topk_agg plan when provably equivalent (see
    // plans/TopKRewrite)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    // keep-first dedup: row_number()=1 windows become min_by aggregates
    // (plans/KeepFirstRewrite)
    ext.injectOptimizerRule(_ => graft.plans.KeepFirstRewrite)
    // bounded edit distance: levenshtein(a,b) <= k gains a length
    // prefilter + the banded 3-arg DP (plans/EditDistanceRewrite)
    ext.injectOptimizerRule(_ => graft.plans.EditDistanceRewrite)
  }
}
