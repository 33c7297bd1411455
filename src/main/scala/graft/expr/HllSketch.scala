package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** HyperLogLog register aggregate (Flajolet et al. 2007): per group, the
  * dense array of 2^p max-rank registers over an already-hashed BIGINT
  * column. Completes the mergeable-summary family next to
  * [[KmvSketchAgg]] (distinct values), [[FreqSketchAgg]] (heavy hitters)
  * and [[QuantileSketchAgg]] (ranks): HLL is the constant-size option —
  * 2^p bytes per group NO MATTER the cardinality, where KMV is exact
  * below k but pays 8k bytes and gives up nothing-else; the two
  * estimators cross over around k ≈ m.
  *
  * Register j (top p hash bits) holds max over the group of
  * rho = (number of leading zeros among the remaining 64−p bits) + 1,
  * i.e. values in [0, 65−p] with 0 = "never touched". max() is
  * associative/commutative/idempotent, so the register array is a pure
  * function of the input VALUE SET — partitioning-invariant and exactly
  * replayable by any engine that can redo the same hash and integer bit
  * arithmetic (the q84 DuckDB oracle replays it including empty
  * registers). Estimation (harmonic mean, bias corrections) is
  * deliberately post-processing — see
  * [[graft.ops.Sketches.hllEstimate]] — never part of a bit oracle,
  * because it runs in doubles.
  *
  * Scale contract: the aggregation buffer is a fixed 2^p-byte array, so
  * the partial aggregate is map-side combinable and the shuffle carries
  * 2^p bytes per group per map task — constant where exact
  * count(DISTINCT) shuffles every distinct key. merge = elementwise max,
  * which is also what makes sketches computed per-slice combinable
  * without rescanning (hllUnion).
  */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"hll_sketch: p must be in [4, 16], got $p")

  private val m = 1 << p

  // analysis-time gate: update() casts the child to Long, so a
  // wrong-typed SQL argument must fail with a clear message here, not a
  // ClassCastException at execution
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_sketch requires a BIGINT hash argument (e.g. xxhash64(...)), " +
        s"got ${child.dataType.catalogString}")

  override def prettyName: String = "hll_sketch"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val reg = (h >>> (64 - p)).toInt
      val w = h << p // remaining 64-p bits, shifted to the top
      val rho =
        if (w == 0L) 64 - p + 1
        else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rho > buf(reg)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) {
      if (other(j) > buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var j = 0
    while (j < m) { out(j) = buf(j).toInt; j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}
