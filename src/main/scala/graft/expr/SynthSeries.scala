package graft.expr

import java.time.Instant
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TimeZoneAwareExpression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-element math of flat-sequence series, shared by interpreted
  * eval and codegen. Randomness replicates the ColumnCompiler's keyed
  * stream exactly: u(i) = (xxhash64(id, salt, i) >>> 11) * 2^-53 with
  * Spark's xxhash64 fold (seed 42, hashLong for the id and salt,
  * hashInt for the sequence index — the index array is array<int>), so
  * moving a series between the built-in and native lowerings never
  * changes generated data.
  */
object SeriesMath {
  private final val Scale = 1.1102230246251565e-16 // 2^-53
  private final val TwoPi = 2 * math.Pi

  @inline private def u(id: Long, salt: Long, i: Int): Double =
    (XXH64.hashInt(i, XXH64.hashLong(salt, XXH64.hashLong(id, 42L))) >>> 11) * Scale
  @inline private def bits(id: Long, salt: Long, i: Int): Long =
    XXH64.hashInt(i, XXH64.hashLong(salt, XXH64.hashLong(id, 42L)))
  // Spark's `log` expression evaluates via StrictMath.log (its
  // UnaryLogExpression), while `cos`/`sqrt` use java.lang.Math — match
  // both exactly or the lowerings drift by an ulp
  @inline private def slog(x: Double): Double = StrictMath.log(x)

  /** Box–Muller step stream summed in index order, offset by `start` —
    * the random-walk positions.
    */
  def walkSeries(id: Long, n: Int, saltA: Long, saltB: Long,
      start: Double, mean: Double, sd: Double): Array[Double] = {
    val out = new Array[Double](n)
    var cum = 0.0
    var i = 1
    while (i <= n) {
      cum += math.sqrt(slog(u(id, saltA, i) + 1e-300) * -2.0) *
        math.cos(u(id, saltB, i) * TwoPi) * sd + mean
      out(i - 1) = cum + start
      i += 1
    }
    out
  }

  def normalSeries(id: Long, n: Int, saltA: Long, saltB: Long,
      mean: Double, sd: Double): Array[Double] = {
    val out = new Array[Double](n)
    var i = 1
    while (i <= n) {
      out(i - 1) = math.sqrt(slog(u(id, saltA, i) + 1e-300) * -2.0) *
        math.cos(u(id, saltB, i) * TwoPi) * sd + mean
      i += 1
    }
    out
  }

  def doubleSeries(id: Long, n: Int, salt: Long, min: Double, max: Double): Array[Double] = {
    val out = new Array[Double](n)
    var i = 1
    while (i <= n) { out(i - 1) = u(id, salt, i) * (max - min) + min; i += 1 }
    out
  }

  def intSeries(id: Long, n: Int, salt: Long, min: Double, max: Double): Array[Long] = {
    val out = new Array[Long](n)
    var i = 1
    while (i <= n) { out(i - 1) = math.floor(u(id, salt, i) * (max - min) + min).toLong; i += 1 }
    out
  }

  /** Exponential inter-arrival gaps summed into an arrival clock, then
    * rendered: "s" = epoch seconds, "Q" = epoch millis (both via the
    * double division the Column lowering uses — Spark's `/` is always
    * fractional), else a date pattern via `fmt` in the session zone.
    */
  def eventSeries(id: Long, n: Int, salt: Long, startMs: Long, meanMs: Double,
      pattern: String, fmt: DateTimeFormatter): Array[Any] = {
    val out = new Array[Any](n)
    var clock = 0.0
    var i = 1
    while (i <= n) {
      clock += -slog(u(id, salt, i) + 1e-300) * meanMs
      val ms = startMs + clock.toLong
      out(i - 1) = UTF8String.fromString(pattern match {
        case "s" => (ms.toDouble / 1000.0).toLong.toString
        case "Q" => ms.toString
        case _   => fmt.format(Instant.ofEpochMilli(ms))
      })
      i += 1
    }
    out
  }

  /** RFC-4122 v4-shaped uuids from two keyed hash streams — same bit
    * surgery and %016x rendering as the scalar uuid column.
    */
  def uuidSeries(id: Long, n: Int, saltHi: Long, saltLo: Long): Array[Any] = {
    val out = new Array[Any](n)
    var i = 1
    while (i <= n) {
      val hiV = (bits(id, saltHi, i) & ~0xf000L) | 0x4000L
      val loV = (bits(id, saltLo, i) & 0x3fffffffffffffffL) | Long.MinValue
      val hs = java.lang.String.format("%016x", java.lang.Long.valueOf(hiV))
      val ls = java.lang.String.format("%016x", java.lang.Long.valueOf(loV))
      out(i - 1) = UTF8String.fromString(
        hs.substring(0, 8) + "-" + hs.substring(8, 12) + "-" + hs.substring(12, 16) +
          "-" + ls.substring(0, 4) + "-" + ls.substring(4, 16))
      i += 1
    }
    out
  }
}

/** Native flat-sequence series generator: one codegen'd call per input
  * row produces the full n-element array for one sub-field.
  *
  * Why not built-ins: the pure-Column formulation chains higher-order
  * functions (`transform` lambdas for the per-element draws, `aggregate`
  * for the cumulative clocks), and Spark evaluates HOF lambdas
  * interpreted — every element boxes through a lambda variable, and the
  * surrounding projection falls out of whole-stage codegen. Measured on
  * the 100-element IoT schema at 2M rows that lowering is ~2-4× slower
  * than the row-at-a-time interpreter it was meant to beat. This
  * expression is one primitive loop (SeriesMath) fused into codegen;
  * the generation stage stays a single WholeStageCodegen span.
  *
  * `kind`: walk | normal | int | double | event | uuid. Parameter slots
  * (saltA, saltB, d1..d3, fmt) are interpreted per kind; unused slots
  * are zero/empty. Registered as `synth_series(kind, id, n, saltA,
  * saltB, d1, d2, d3, fmt)` — all but `id` must be literals.
  */
case class SynthSeries(child: Expression, kind: String, n: Int,
    saltA: Long, saltB: Long, d1: Double, d2: Double, d3: Double,
    fmt: String, timeZoneId: Option[String] = None)
    extends UnaryExpression with TimeZoneAwareExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"synth_series id must be bigint, got ${child.dataType}")
    else if (!SynthSeries.kinds.contains(kind))
      TypeCheckResult.TypeCheckFailure(s"synth_series kind '$kind' not in ${SynthSeries.kinds}")
    else if (n < 0) TypeCheckResult.TypeCheckFailure(s"synth_series n < 0: $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = kind match {
    case "int"            => ArrayType(LongType, containsNull = false)
    case "event" | "uuid" => ArrayType(StringType, containsNull = false)
    case _                => ArrayType(DoubleType, containsNull = false)
  }
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "synth_series"
  override def withTimeZone(tz: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(tz))

  @transient private lazy val formatter: DateTimeFormatter =
    if (kind == "event" && fmt != "s" && fmt != "Q")
      DateTimeFormatter.ofPattern(fmt).withZone(zoneId)
    else null

  /** Shared by interpreted eval and the codegen'd call. */
  def compute(id: Long): ArrayData = kind match {
    case "walk"   => UnsafeArrayData.fromPrimitiveArray(
      SeriesMath.walkSeries(id, n, saltA, saltB, d1, d2, d3))
    case "normal" => UnsafeArrayData.fromPrimitiveArray(
      SeriesMath.normalSeries(id, n, saltA, saltB, d1, d2))
    case "double" => UnsafeArrayData.fromPrimitiveArray(
      SeriesMath.doubleSeries(id, n, saltA, d1, d2))
    case "int"    => UnsafeArrayData.fromPrimitiveArray(
      SeriesMath.intSeries(id, n, saltA, d1, d2))
    case "event"  => new GenericArrayData(
      SeriesMath.eventSeries(id, n, saltA, d1.toLong, d2, fmt, formatter))
    case "uuid"   => new GenericArrayData(
      SeriesMath.uuidSeries(id, n, saltA, saltB))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("synthSeries", this, classOf[SynthSeries].getName)
    nullSafeCodeGen(ctx, ev, id => s"${ev.value} = $ref.compute($id);")
  }

  override protected def withNewChildInternal(newChild: Expression): SynthSeries =
    copy(child = newChild)
}

object SynthSeries {
  val kinds: Set[String] = Set("walk", "normal", "int", "double", "event", "uuid")
}
