package graft.expr

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch aggregate over a string key:
  * at most `capacity` (item, count) counters per group, returned sorted
  * by (count desc, item asc).
  *
  * Why a TypedImperativeAggregate: the buffer is a capped counter map,
  * so the partial aggregate is map-side combinable and the shuffle
  * carries at most `capacity` counters per group per map task — at
  * 100 TB the exact alternative (groupBy key → count → top-k) shuffles
  * one row per DISTINCT key, which for an open domain (URLs, n-grams,
  * user agents) grows with the data. The sketch's shuffle volume is a
  * constant.
  *
  * Guarantees (classic Misra–Gries, and the "Mergeable Summaries"
  * merge of Agarwal et al., PODS'12, which preserves them):
  *   - reported count ≤ true count  (counts only ever lose via decrement)
  *   - true count − reported count ≤ n / (capacity + 1)  (n = group size)
  *   - every item with true count > n / (capacity + 1) is present.
  *
  * When the group's distinct-key count is ≤ capacity no decrement ever
  * fires and the sketch IS the exact per-key count table — deterministic
  * and partitioning-invariant, which is what the q71 DuckDB oracle
  * replays bit-for-bit. In the approximate regime the counter values
  * depend on merge order (like any MG implementation); only the
  * guarantee triple above is stable, and that is what the ScalaTest
  * asserts.
  */
case class FreqSketchAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(capacity >= 1 && capacity <= 65536,
    s"freq_sketch: capacity must be in [1, 65536], got $capacity")

  // analysis-time gate: update() casts the child to UTF8String, so a
  // wrong-typed SQL argument must fail with a clear message here, not
  // a ClassCastException at execution
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch requires a STRING item argument, " +
        s"got ${child.dataType.catalogString}")

  override def prettyName: String = "freq_sketch"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** Classic MG step: count if present, insert if room, else decrement
    * every counter (amortized O(1): a full-map decrement pass can fire
    * at most n/(capacity+1) times).
    */
  private def add(buf: java.util.HashMap[String, Long], item: String, by: Long): Unit = {
    val cur = buf.get(item)
    if (cur != 0L || buf.containsKey(item)) { buf.put(item, cur + by); () }
    else if (buf.size() < capacity) { buf.put(item, by); () }
    else {
      // decrement-all by min(by, current min) repeatedly is equivalent
      // to the merge rule below with a singleton map; reuse it
      val tmp = new java.util.HashMap[String, Long](1)
      tmp.put(item, by)
      mergeInto(buf, tmp)
    }
  }

  /** Mergeable-summaries rule: sum counters, then if over capacity
    * subtract the (capacity+1)-th largest counter value from all and
    * drop the non-positive ones.
    */
  private def mergeInto(
      buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): Unit = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, cur + e.getValue)
    }
    if (buf.size() > capacity) {
      val counts = new Array[Long](buf.size())
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      // (capacity+1)-th largest == index size-capacity-1 in ascending order
      val sub = counts(buf.size() - capacity - 1)
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - sub
        if (nv <= 0L) eit.remove() else e.setValue(nv)
      }
    }
  }

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    mergeInto(buf, other)
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size())
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    // count desc, item asc: a total order, so the exact-regime output is
    // a pure function of the counted multiset
    scala.util.Sorting.stableSort(entries,
      (a: (String, Long), b: (String, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    new GenericArrayData(entries.map { case (item, cnt) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), cnt))
    })
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.keySet().iterator()
    val keys = new scala.collection.mutable.ArrayBuffer[Array[Byte]](buf.size())
    while (it0.hasNext) {
      val k = it0.next().getBytes(StandardCharsets.UTF_8)
      keys += k
      bytes += 4 + k.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size())
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val k = keys(i)
      bb.putInt(k.length)
      bb.put(k)
      bb.putLong(e.getValue)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val k = new Array[Byte](len)
      bb.get(k)
      buf.put(new String(k, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}
