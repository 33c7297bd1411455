package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Native as-of join — the repo's whole-operator extension point
  * (custom `LogicalPlan` + `Strategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions.injectPlannerStrategy`), completing the
  * ladder next to the injected expressions, the optimizer rule
  * (TopKRewrite), the `synth()` table function and the DataSource V2.
  *
  * Semantics (identical to [[graft.ops.AsOfJoin.asOf]], the DuckDB
  * `ASOF JOIN ... ON l.t >= r.t` contract): for each left row, the
  * right row with the same key and the LARGEST rightTime <= leftTime;
  * unmatched left rows keep nulls on the right. Right rows with a null
  * key or time never match; left rows with a null key or time emit
  * unmatched.
  *
  * Why a custom operator when the union+window lowering already works:
  * the window form materializes and sorts the UNION of both sides in
  * one partition-wide pass and carries the right struct through a
  * last(ignoreNulls) frame. The native exec instead declares
  * (key-clustered, (key, time)-sorted) requirements — Catalyst inserts
  * exactly the exchanges/sorts needed (and elides them when a side is
  * already bucketed or sorted, which the union form can never exploit)
  * — and then streams BOTH sides through one merge pass with O(1)
  * state: a single buffered right row per partition. No union blowup,
  * no window buffer, early-projectable sides.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

/** Merge-pass as-of join. Both children arrive key-clustered and
  * (key, time)-sorted (Catalyst satisfies [[requiredChildDistribution]]
  * / [[requiredChildOrdering]], reusing existing layouts when it can).
  * Per partition the algorithm is the classic sorted merge with a
  * one-row memory: advance the right iterator while its (key, time)
  * is at or before the current left row, remembering the last same-key
  * candidate — left times are non-decreasing within a key, so the
  * right cursor never rewinds and every row on either side is visited
  * exactly once. State is one copied right row, regardless of
  * partition size — the 100 TB contract the union+window form (which
  * buffers a window frame) cannot make.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression)
    extends SparkPlan {

  override def children: Seq[SparkPlan] = Seq(left, right)
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // one output row per left row, in the left child's order/partitioning
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): AsOfJoinExec =
    copy(left = newChildren(0), right = newChildren(1))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.length

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val rBuf = ri.buffered
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      new Iterator[InternalRow] {
        // the single-row state: last same-key candidate, COPIED because
        // sorter iterators reuse their row objects
        private var lastMatch: InternalRow = null
        private var lastMatchKey: Any = null

        override def hasNext: Boolean = li.hasNext

        override def next(): InternalRow = {
          val l = li.next()
          val lKey = lk.eval(l)
          val lTime = lt.eval(l)
          if (lKey == null || lTime == null) return joined(l, nullRight)
          var done = false
          while (!done && rBuf.hasNext) {
            val head = rBuf.head
            val rKey = rk.eval(head)
            if (rKey == null) { rBuf.next(); () } // null keys sort first; skip
            else {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) rBuf.next() // stale key; its lastMatch can't be ours
              else if (c > 0) done = true
              else {
                val rTime = rt.eval(head)
                if (rTime == null) { rBuf.next(); () } // null times sort first; skip
                else if (timeOrd.compare(rTime, lTime) <= 0) {
                  lastMatch = rBuf.next().copy()
                  lastMatchKey = rk.eval(lastMatch)
                } else done = true
              }
            }
          }
          val matched = lastMatch != null && lastMatchKey != null &&
            keyOrd.compare(lastMatchKey, lKey) == 0
          joined(l, if (matched) lastMatch else nullRight)
        }
      }
    }
  }
}
