package graft.expr

import java.nio.ByteBuffer
import java.util.PriorityQueue

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** `topk_agg(ord, id, k)` — bounded-heap per-group top-k: the k best
  * (ord desc, id asc — a total order, so ties are deterministic)
  * (DOUBLE, BIGINT) pairs of the group, as array<struct<ord,id>> in
  * rank order.
  *
  * This is the scale-correct form of `row_number() OVER (PARTITION BY g
  * ORDER BY ord DESC) <= k`: the window form SORTS every candidate row
  * of a group after shuffling ALL of them to one partition, while this
  * aggregate's buffer never exceeds k entries — map-side combine sends
  * at most k rows per group per map task into the shuffle, and each
  * update is O(log k) against a heap instead of a group-wide sort.
  * With a million candidates per query key and k = 10, the shuffle
  * carries 10 rows per task instead of a million per key. Selection by
  * a total order is a pure function of the input value set —
  * partitioning-invariant, mergeable (union then re-cap), exactly
  * replayable by any engine's ranked window (the q27 oracle regime,
  * same contract as [[KmvSketchAgg]]).
  *
  * NaN ord sorts WORSE than every real (java.lang.Double.compare puts
  * NaN above reals, inverted here), so a NaN similarity can never crowd
  * out a real neighbor; callers that map NaN explicitly (Similarity's
  * nanvl to −1) are unaffected. Duplicate (ord, id) pairs count twice
  * (multiset semantics, like the window form).
  */
case class TopKAgg(
    left: Expression,
    right: Expression,
    k: Int,
    nanFirst: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PriorityQueue[(Double, Long)]]
    with BinaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"topk_agg: k must be in [1, 65536], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg requires a DOUBLE ord argument, got ${left.dataType.catalogString}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg requires a BIGINT id argument, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def prettyName: String = "topk_agg"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  // nanFirst replicates the ranked-window order exactly (descending
  // sort treats NaN as the LARGEST value, so rn 1..k admits NaN before
  // reals) — required by plans/TopKRewrite, which must be semantics-
  // preserving. The default ranks NaN last (the right ANN semantics).
  private def worstFirst: java.util.Comparator[(Double, Long)] =
    if (nanFirst) TopKAgg.WorstFirstNanTop else TopKAgg.WorstFirst

  override def createAggregationBuffer(): PriorityQueue[(Double, Long)] =
    new PriorityQueue[(Double, Long)](math.min(k + 1, 1024), worstFirst)

  private def insert(buf: PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size() < k) { buf.offer(e); () }
    else if (worstFirst.compare(e, buf.peek()) > 0) {
      buf.poll()
      buf.offer(e)
      ()
    }
  }

  override def update(
      buf: PriorityQueue[(Double, Long)],
      input: InternalRow): PriorityQueue[(Double, Long)] = {
    val o = left.eval(input)
    val i = right.eval(input)
    if (o != null && i != null)
      insert(buf, (o.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: PriorityQueue[(Double, Long)],
      other: PriorityQueue[(Double, Long)]): PriorityQueue[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: PriorityQueue[(Double, Long)]): Any = {
    val n = buf.size()
    val arr = new Array[(Double, Long)](n)
    var i = n - 1
    while (i >= 0) { arr(i) = buf.poll(); i -= 1 } // drain worst-first
    // refill the buffer (eval must not destroy it: partial aggregation
    // may evaluate the same buffer more than once)
    arr.foreach(buf.offer)
    val rows = new Array[Any](n)
    i = 0
    while (i < n) {
      rows(i) = new GenericInternalRow(Array[Any](arr(i)._1, arr(i)._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) { val e = it.next(); bb.putDouble(e._1); bb.putLong(e._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}

object TopKAgg {
  /** Heap comparator: WORST entry at the head (lowest ord; ties keep
    * the larger id as worse, matching `ORDER BY ord DESC, id ASC`).
    * NaN is the worst possible ord. A static Serializable object — the
    * expression ships to executors inside the physical plan.
    */
  sealed abstract class Cmp extends java.util.Comparator[(Double, Long)] with Serializable {
    protected def rank(d: Double): Double
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(rank(a._1), rank(b._1))
      if (c != 0) c
      else {
        val c2 = java.lang.Long.compare(b._2, a._2)
        // final raw-bits tiebreak totalizes NaN vs ±Inf at equal id
        if (c2 != 0) c2 else java.lang.Double.compare(b._1, a._1)
      }
    }
  }
  // NaN -> -Inf for ranking so it loses to every real; -Inf itself
  // ties with NaN (both unrankable-bad), resolved by the tiebreaks
  object WorstFirst extends Cmp {
    protected def rank(d: Double): Double =
      if (java.lang.Double.isNaN(d)) Double.NegativeInfinity else d
  }
  // NaN -> +Inf: descending window order ranks NaN above every real
  object WorstFirstNanTop extends Cmp {
    protected def rank(d: Double): Double =
      if (java.lang.Double.isNaN(d)) Double.PositiveInfinity else d
  }
}
