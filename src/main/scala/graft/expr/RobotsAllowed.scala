package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression,
  ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `robots_allowed(rulesText, agent, path)` — the RFC 9309 (Robots
  * Exclusion Protocol) crawl-permission decision as a codegen'd scalar
  * expression, completing the crawl stack (URL canonicalization → THIS
  * gate → HTML extraction → dedup → rollup). The robots.txt body is a
  * per-SITE dimension column (broadcast-joined onto the fetch frame);
  * evaluation is per row, no UDF, no shuffle.
  *
  * Implemented semantics, from the public RFC:
  *  - group selection: the group(s) whose user-agent line is the
  *    LONGEST match for the crawler's product token (case-insensitive,
  *    token prefix match), falling back to the `*` group; multiple
  *    groups for the same agent merge;
  *  - rule precedence: the longest-matching rule path wins; on a
  *    length tie, allow wins over disallow (RFC 9309 §2.2.2);
  *  - pattern matching: `*` matches any run, `$` anchors the end;
  *    otherwise the rule is a path PREFIX;
  *  - no matching rule, no selected group, or an empty disallow value
  *    ⇒ allowed (the protocol's default-open stance); null inputs ⇒
  *    null (unknown robots ≠ permission decision).
  */
/** `robots_crawl_delay(rulesText, agent)` — the selected group's
  * crawl-delay in seconds (the de-facto politeness extension), as a
  * nullable DOUBLE: null when the group declares none, the value is
  * unparsable, or an input is null. Shares [[RobotsAllowed]]'s group
  * selection exactly (same agent matching, same merge, same §2.5 parse
  * cap), so the delay can never come from a different group than the
  * allow decision.
  */
case class RobotsCrawlDelay(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_crawl_delay"

  override protected def nullSafeEval(rules: Any, agent: Any): Any = {
    val d = RobotsAllowed.crawlDelay(rules.asInstanceOf[UTF8String].toString,
      agent.asInstanceOf[UTF8String].toString)
    if (d == null) null else d.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("delay")
    nullSafeCodeGen(ctx, ev, (r, a) => s"""
      java.lang.Double $boxed = graft.expr.RobotsAllowed.crawlDelay(
        $r.toString(), $a.toString());
      if ($boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $boxed.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): RobotsCrawlDelay =
    copy(left = newLeft, right = newRight)
}

case class RobotsAllowed(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType, StringType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_allowed"

  override protected def nullSafeEval(rules: Any, agent: Any, path: Any): Any =
    RobotsAllowed.allowed(rules.asInstanceOf[UTF8String].toString,
      agent.asInstanceOf[UTF8String].toString,
      path.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, a, p) => s"""
      ${ev.value} = graft.expr.RobotsAllowed.allowed(
        $r.toString(), $a.toString(), $p.toString());
    """)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): RobotsAllowed =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RobotsAllowed {

  /** RFC 9309 §2.5: a parser must process at least 500 KiB and may
    * ignore the rest. We honor exactly the lines FULLY CONTAINED in the
    * first 500 KiB (a rule straddling the cap is dropped, never
    * half-parsed) — deterministic, and the safe failure mode for a
    * hostile multi-megabyte robots.txt: directives beyond the cap
    * silently vanish toward the protocol's default-open stance rather
    * than blowing up executor memory/CPU on every fetch row.
    */
  private[graft] val ParseCap: Int = 500 * 1024

  private def capped(rulesText: String): String =
    if (rulesText.length <= ParseCap) rulesText
    else {
      // last newline INSIDE the first ParseCap chars (index ParseCap-1
      // is the cap's final char) — the partial trailing line drops
      val cut = rulesText.lastIndexOf('\n', ParseCap - 1)
      if (cut < 0) "" else rulesText.substring(0, cut)
    }

  /** The merged rule group selected for `agent` (longest user-agent
    * token match, `*` fallback, same-specificity groups merge) plus its
    * crawl-delay: the common de-facto extension — not part of RFC 9309,
    * group-scoped like allow/disallow in every crawler that honors it.
    * When merged groups disagree, the LARGEST delay wins (the polite
    * reading). Null when absent or unparsable.
    */
  private[graft] final class Group(
      val rules: Seq[(Boolean, String)],
      val crawlDelay: java.lang.Double)

  private[graft] def selectGroup(rulesText: String, agent: String): Group = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // parse line-oriented: groups start at user-agent lines; a
    // user-agent line directly following another extends the same
    // group header (RFC: multiple agents may share one rule block)
    var bestAgentLen = -1 // longest matching user-agent token; * = 0
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    val pending = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var selectedDelay: java.lang.Double = null
    var pendingDelay: java.lang.Double = null
    var groupAgentLen = -1 // best matching agent token of the OPEN group
    var inHeader = false
    def closeGroup(): Unit = {
      if (groupAgentLen > bestAgentLen) {
        bestAgentLen = groupAgentLen
        selected.clear()
        selected ++= pending
        selectedDelay = pendingDelay
      } else if (groupAgentLen >= 0 && groupAgentLen == bestAgentLen) {
        selected ++= pending // same-specificity groups merge
        if (pendingDelay != null &&
          (selectedDelay == null || pendingDelay > selectedDelay))
          selectedDelay = pendingDelay
      }
      pending.clear()
      pendingDelay = null
      groupAgentLen = -1
    }
    capped(rulesText).split("\n", -1).foreach { raw =>
      // strip comments and whitespace
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0) {
          val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          key match {
            case "user-agent" =>
              if (!inHeader) closeGroup()
              inHeader = true
              val tok = value.toLowerCase(java.util.Locale.ROOT)
              val matchLen =
                if (tok == "*") 0
                else if (agentLc.startsWith(tok)) tok.length
                else -1
              if (matchLen > groupAgentLen) groupAgentLen = matchLen
            case "allow" | "disallow" =>
              inHeader = false
              if (groupAgentLen >= 0)
                pending += ((key == "allow", value))
            case "crawl-delay" =>
              inHeader = false
              if (groupAgentLen >= 0)
                try { pendingDelay = java.lang.Double.valueOf(value) }
                catch { case _: NumberFormatException => () }
            case _ => inHeader = false // sitemap / unknown
          }
        }
      }
    }
    closeGroup()
    new Group(selected.toSeq, selectedDelay)
  }

  /** Static entry shared by the interpreted and generated paths. */
  def allowed(rulesText: String, agent: String, path: String): Boolean = {
    val selected = selectGroup(rulesText, agent).rules
    // longest-match rule wins; ties prefer allow; empty disallow = allow-all
    var bestLen = -1
    var bestAllow = true
    selected.foreach { case (isAllow, pat) =>
      if (pat.isEmpty) {
        // "Disallow:" with no value allows everything — only relevant
        // when nothing longer matches; treat as length-0 allow
        if (bestLen < 0) { bestLen = 0; bestAllow = true }
      } else if (patternMatches(pat, path)) {
        val len = pat.length
        if (len > bestLen || (len == bestLen && isAllow && !bestAllow)) {
          bestLen = len
          bestAllow = isAllow
        }
      }
    }
    if (bestLen < 0) true else bestAllow
  }

  /** The selected group's crawl-delay in seconds; null when absent. */
  def crawlDelay(rulesText: String, agent: String): java.lang.Double =
    selectGroup(rulesText, agent).crawlDelay

  /** RFC 9309 path pattern: prefix match with `*` (any run) and a
    * trailing `$` (end anchor). Greedy-with-backtracking over the `*`
    * segments — the standard linear two-pointer matcher.
    */
  private[graft] def patternMatches(pattern0: String, path: String): Boolean = {
    val anchored = pattern0.nonEmpty && pattern0.last == '$'
    val pattern = if (anchored) pattern0.dropRight(1) else pattern0
    val segs = pattern.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else if (i == segs.length - 1 && anchored) {
        // last segment with an end anchor must be a SUFFIX at/after pos
        return path.length - seg.length >= pos && path.endsWith(seg)
      } else {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }
}
