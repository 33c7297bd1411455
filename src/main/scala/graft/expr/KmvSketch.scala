package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch aggregate: keeps the k
  * smallest DISTINCT unsigned-64 values of an already-hashed column and
  * returns them in unsigned-ascending order.
  *
  * Why a TypedImperativeAggregate and not a window/collect_set
  * composition: the buffer is a capped sorted set of at most k longs, so
  * the partial aggregate is map-side combinable and the shuffle carries
  * at most k values per group per map task — at 100 TB the alternative
  * (dedupe all n distinct hashes, then a per-group sort to find the
  * bottom k) shuffles and sorts n rows to keep k of them. The sketch is
  * mergeable by construction (union then re-cap), which is also what
  * makes it incrementally maintainable.
  *
  * The output is a pure function of the input VALUE SET (dedupe + bottom
  * k is associative, commutative, idempotent), so it is partitioning-
  * invariant and exactly replayable by any engine that can sort unsigned
  * 64-bit integers — the property the q69 DuckDB oracle checks.
  *
  * Unsigned ordering over signed Java longs uses the sign-flip trick:
  * signed order of (h ^ Long.MinValue) == unsigned order of h. The
  * buffer stores flipped values; eval flips back.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"kmv_sketch: k must be in [1, 65536], got $k")

  // analysis-time gate: update() casts the child to Long, so a
  // wrong-typed SQL argument must fail with a clear message here, not
  // a ClassCastException at execution
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a BIGINT hash argument (e.g. xxhash64(...)), " +
        s"got ${child.dataType.catalogString}")

  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], flipped: Long): Unit = {
    // skip early when the buffer is full and the candidate can't enter —
    // the common case once the bottom-k stabilizes
    if (buf.size() < k) { buf.add(flipped); () }
    else if (flipped < buf.last()) {
      if (buf.add(flipped)) buf.pollLast()
      ()
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long] ^ Long.MinValue)
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next() ^ Long.MinValue; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}
