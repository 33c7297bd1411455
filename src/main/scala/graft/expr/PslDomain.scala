package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression,
  ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registrable domain under full publicsuffix.org semantics as a
  * codegen'd scalar expression probing STATIC rule sets.
  *
  * Why an expression and not the pure-column InSet composition that
  * shipped in r9: with the full ~10k-rule PSL bundled
  * ([[graft.runtime.PslData]]), the column form carries every rule as
  * an expression-tree literal — measured ~350 ms of analyzer/optimizer
  * walk per plan and a ~1.1 MB task binary per stage. Here the rules
  * live in JVM-static hash sets loaded from the bundled resource on
  * each executor: the plan holds ONE node regardless of list size,
  * the task binary carries none of it, and the per-row work is at
  * most `maxPsLen` hash probes. The column composition remains in
  * [[graft.ops.UrlOps]] as the no-extensions fallback, semantics
  * identical (UrlOpsSpec pins both paths).
  */
case class PslDomain(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  // implicit casts (NullType, castable inputs) keep this path
  // analysis-equivalent to the column fallback, which inherits split()'s
  // implicit cast — the two lowerings must accept the same queries
  // (narrowed result type: AbstractDataType is private[sql])
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "psl_domain"

  override protected def nullSafeEval(input: Any): Any =
    PslDomain.registrable(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expr.PslDomain.registrable($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): PslDomain =
    copy(child = newChild)
}

object PslDomain {
  import graft.runtime.PslData

  // rule sets indexed by label count, JVM-static (built once per
  // executor from the bundled resource — nothing rides in the closure)
  private val maxK: Int = PslData.maxPsLen
  private val normalAt: Array[java.util.HashSet[String]] = {
    val a = Array.fill(maxK + 2)(new java.util.HashSet[String]())
    PslData.normalByLen.foreach { case (k, s) =>
      if (k <= maxK + 1) s.foreach(a(k).add)
    }
    a
  }
  private val wildAt: Array[java.util.HashSet[String]] = {
    val a = Array.fill(maxK + 2)(new java.util.HashSet[String]())
    PslData.wildBaseByLen.foreach { case (k, s) =>
      if (k <= maxK + 1) s.foreach(a(k).add)
    }
    a
  }
  private val excKeysDesc: Array[Int] =
    PslData.excByLen.keys.toArray.sorted.reverse
  private val excAt: Map[Int, java.util.HashSet[String]] =
    PslData.excByLen.map { case (k, s) =>
      val hs = new java.util.HashSet[String](); s.foreach(hs.add); k -> hs
    }

  /** Static entry shared by the interpreted and generated paths. The
    * label split mirrors Spark's `split(host, "\\.")` with limit -1
    * (trailing empty labels KEPT), so this path and the column
    * fallback agree byte-for-byte on every input.
    */
  def registrable(host: UTF8String): UTF8String = {
    val h = host.toString
    val labels = h.split("\\.", -1)
    val n = labels.length
    // suffix strings of the last k labels, k = 1..min(n, maxK+1)
    val upTo = math.min(n, maxK + 1)
    val suffixes = new Array[String](upTo + 1)
    var k = 1
    while (k <= upTo) {
      suffixes(k) =
        if (k == 1) labels(n - 1)
        else labels(n - k) + "." + suffixes(k - 1)
      k += 1
    }
    var psLen = -1
    // exception rules win: k matching labels -> public suffix of k-1
    var ei = 0
    while (psLen < 0 && ei < excKeysDesc.length) {
      val ek = excKeysDesc(ei)
      if (n >= ek && ek <= upTo && excAt(ek).contains(suffixes(ek)))
        psLen = ek - 1
      ei += 1
    }
    // else the longest normal/wildcard rule
    if (psLen < 0) {
      k = math.min(upTo, maxK)
      while (psLen < 0 && k >= 2) {
        if (n >= k && (normalAt(k).contains(suffixes(k)) ||
            wildAt(k - 1).contains(suffixes(k - 1))))
          psLen = k
        k -= 1
      }
    }
    // else the implicit default rule "*": the bare TLD
    if (psLen < 0) psLen = 1
    if (n > psLen) {
      // registrable = public suffix + one label
      var start = n - psLen - 1
      val sb = new java.lang.StringBuilder(labels(start))
      start += 1
      while (start < n) { sb.append('.').append(labels(start)); start += 1 }
      UTF8String.fromString(sb.toString)
    } else null
  }
}
