package graft.expr

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Compaction buffer: level l holds items of weight 2^l; levels beyond
  * the first exist only after compactions.
  */
final class QsBuffer(val levels: ArrayBuffer[ArrayBuffer[Long]])

/** `quantile_sketch(value, capacity)` — mergeable quantile summary by
  * deterministic binary compaction (the GK/KLL family: Greenwald–Khanna
  * SIGMOD'01, Karnin–Lang–Liberty FOCS'16, with the randomness removed),
  * completing this repo's "Mergeable Summaries" trio: distinct count
  * ([[KmvSketchAgg]]), frequent items ([[FreqSketchAgg]]), quantiles
  * (this).
  *
  * Each level holds ≤ `capacity` values of weight 2^level. A full level
  * sorts, promotes every second value (odd indices) to the next level at
  * doubled weight, and carries an odd leftover in place — no RNG
  * anywhere, so a given update/merge sequence is exactly reproducible.
  * The summary is the weighted value list; any rank/quantile query is
  * post-processing ([[graft.ops.Sketches.quantileFromSummary]]).
  *
  * Error: one compaction of a weight-w level displaces a query rank by
  * at most w/2; summing the geometric compaction schedule bounds total
  * rank error by ~n·levels/(2·capacity) (≈0.3% of n at capacity 1024,
  * n 100k) under ANY merge order — asserted empirically in ScalaTest.
  * Merge ORDER does change which values survive in the approximate
  * regime (like Misra–Gries), so only the bound is partition-invariant
  * there.
  *
  * EXACT regime — the oracle contract (same as freq_sketch's): while a
  * group's total count stays ≤ capacity no compaction ever fires and
  * the summary IS the sorted value multiset at weight 1: a pure,
  * partitioning-invariant function of the input that DuckDB replays
  * bit-for-bit (q79). The 100 TB contract is the buffer cap: the
  * shuffle carries ≤ capacity·levels values per group per map task
  * regardless of group size, where exact per-group quantiles
  * (ops/Quantiles) shuffle every row.
  */
case class QuantileSketchAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QsBuffer]
    with UnaryLike[Expression] {

  require(capacity >= 8 && capacity <= 65536,
    s"quantile_sketch: capacity must be in [8, 65536], got $capacity")

  // analysis-time gate: update() casts the child to Long (the repo's
  // integer-exact convention — counts, cents, micros), so a wrong-typed
  // SQL argument fails here with a clear message
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch requires a BIGINT value argument, " +
        s"got ${child.dataType.catalogString}")

  override def prettyName: String = "quantile_sketch"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", LongType, nullable = false),
      StructField("w", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): QsBuffer =
    new QsBuffer(ArrayBuffer(ArrayBuffer.empty[Long]))

  /** Compact level l if over capacity, cascading upward. Sort, promote
    * odd indices (each kept value represents the pair below it — the
    * deterministic half of a KLL compactor), carry an odd leftover (the
    * max) in place so total weight is preserved exactly.
    */
  private def compact(levels: ArrayBuffer[ArrayBuffer[Long]], l: Int): Unit = {
    val cur = levels(l)
    if (cur.length > capacity) {
      val arr = cur.toArray
      java.util.Arrays.sort(arr)
      if (levels.length <= l + 1) levels += ArrayBuffer.empty[Long]
      val even = arr.length & ~1
      var i = 1
      while (i < even) { levels(l + 1) += arr(i); i += 2 }
      cur.clear()
      if (even < arr.length) cur += arr(arr.length - 1)
      compact(levels, l + 1)
    }
  }

  override def update(buf: QsBuffer, input: InternalRow): QsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.levels(0) += v.asInstanceOf[Long]
      compact(buf.levels, 0)
    }
    buf
  }

  override def merge(buf: QsBuffer, other: QsBuffer): QsBuffer = {
    var l = 0
    while (l < other.levels.length) {
      if (buf.levels.length <= l) buf.levels += ArrayBuffer.empty[Long]
      buf.levels(l) ++= other.levels(l)
      l += 1
    }
    l = 0
    while (l < buf.levels.length) { compact(buf.levels, l); l += 1 }
    buf
  }

  override def eval(buf: QsBuffer): Any = {
    val pairs = ArrayBuffer.empty[(Long, Long)]
    var l = 0
    while (l < buf.levels.length) {
      val w = 1L << l
      buf.levels(l).foreach(v => pairs += ((v, w)))
      l += 1
    }
    val sorted = pairs.sortBy(identity) // (v asc, w asc): a total order
    val rows = new Array[Any](sorted.length)
    var i = 0
    while (i < sorted.length) {
      rows(i) = new GenericInternalRow(Array[Any](sorted(i)._1, sorted(i)._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: QsBuffer): Array[Byte] = {
    val total = buf.levels.map(_.length).sum
    val bb = ByteBuffer.allocate(4 + buf.levels.length * 4 + total * 8)
    bb.putInt(buf.levels.length)
    buf.levels.foreach { lvl =>
      bb.putInt(lvl.length)
      lvl.foreach(bb.putLong)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val nLevels = bb.getInt
    val levels = ArrayBuffer.fill(nLevels)(ArrayBuffer.empty[Long])
    var l = 0
    while (l < nLevels) {
      val n = bb.getInt
      var i = 0
      while (i < n) { levels(l) += bb.getLong; i += 1 }
      l += 1
    }
    new QsBuffer(levels)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}
