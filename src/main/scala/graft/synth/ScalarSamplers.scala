package graft.synth

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.runtime.{ChineseRestaurant, FancyTime, Gamma, Multinomial}

/** Scalar value generators — the §2.1.1 family. Reference semantics are
  * cited per class; the mechanics are original.
  */
object ScalarSamplers {

  /** `int` (samplers/IntegerSampler.java:78-151): uniform in [min,max);
    * `skew` k takes the min (k>0) or max (k<0) of |k|+1 draws; an optional
    * discrete `dist` (value→weight) overrides the uniform; `format`
    * renders to string.
    */
  final class IntSampler(min: Long, max: Long, skew: Int,
      dist: Option[Multinomial[Long]], format: Option[String]) extends Sampler {
    val dataType: DataType =
      if (format.isDefined) StringType else LongType
    def sample(ctx: GenContext): Any = {
      val v = dist match {
        case Some(m) => m.sample(ctx.rng)
        case None =>
          var best = min + (ctx.rng.nextDouble() * (max - min)).toLong
          var i = 0
          while (i < math.abs(skew)) {
            val next = min + (ctx.rng.nextDouble() * (max - min)).toLong
            best = if (skew > 0) math.min(best, next) else math.max(best, next)
            i += 1
          }
          best
      }
      format match {
        case Some(f) => f.format(v)
        case None    => v
      }
    }
  }

  /** `double` (samplers/DoubleSampler.java:125-153): same contract as
    * `int` over doubles, including the discrete `dist` override.
    */
  final class DoubleSampler(min: Double, max: Double, skew: Int,
      dist: Option[Multinomial[Double]], format: Option[String]) extends Sampler {
    val dataType: DataType = if (format.isDefined) StringType else DoubleType
    def sample(ctx: GenContext): Any = {
      val best = dist match {
        case Some(m) => m.sample(ctx.rng)
        case None =>
          var b = min + ctx.rng.nextDouble() * (max - min)
          var i = 0
          while (i < math.abs(skew)) {
            val next = min + ctx.rng.nextDouble() * (max - min)
            b = if (skew > 0) math.min(b, next) else math.max(b, next)
            i += 1
          }
          b
      }
      format match {
        case Some(f) => f.format(best)
        case None    => best
      }
    }
  }

  /** `normal` (samplers/NormalSampler.java:99-105): Gaussian with
    * optional [min,max] rejection loop.
    */
  final class NormalSampler(mean: Double, sd: Double,
      min: Option[Double], max: Option[Double]) extends Sampler {
    val dataType: DataType = DoubleType
    def sample(ctx: GenContext): Any = {
      var v = ctx.rng.nextGaussian() * sd + mean
      var guard = 0
      while ((min.exists(v < _) || max.exists(v > _)) && guard < 10000) {
        v = ctx.rng.nextGaussian() * sd + mean
        guard += 1
      }
      // pathological bounds (essentially no mass inside) exhaust the
      // rejection guard: clamp so the declared [min,max] contract holds
      // instead of silently emitting an out-of-range value
      min.foreach(m => v = math.max(v, m))
      max.foreach(m => v = math.min(v, m))
      v
    }
  }

  /** `gamma` (samplers/GammaSampler.java:106-125): alpha/beta(rate) or
    * dof/scale parameterization.
    */
  final class GammaSampler(shape: Double, scale: Double) extends Sampler {
    val dataType: DataType = DoubleType
    def sample(ctx: GenContext): Any = Gamma.sample(ctx.rng, shape, scale)
  }

  /** `uuid` (samplers/UUIDSampler.java:49-56): v4 UUID assembled from the
    * partition RNG — seeded runs are reproducible (the reference honors
    * `seed` the same way).
    */
  final class UuidSampler extends Sampler {
    val dataType: DataType = StringType
    def sample(ctx: GenContext): Any = {
      val hi = (ctx.rng.nextLong() & ~0xf000L) | 0x4000L          // version 4
      val lo = (ctx.rng.nextLong() & ~(0xc0L << 56)) | (0x80L << 56) // variant 10
      new java.util.UUID(hi, lo).toString
    }
  }

  /** `id` (samplers/IdSampler.java:45): monotonic counter from `start`.
    * Spark-first improvement: derived from the global row id, so the
    * sequence is exactly 0..n-1 across any number of partitions with no
    * coordination (the reference's multi-threaded runs interleave
    * per-thread counters).
    */
  final class IdSampler(start: Long) extends Sampler {
    val dataType: DataType = LongType
    def sample(ctx: GenContext): Any = start + ctx.rowId
  }

  /** `date` (samplers/DateSampler.java:47-76): default exponential (mean
    * 100 days) *before* epoch 2013-08-01; with start/end → uniform in
    * range; rendered through FancyTime.
    */
  final class DateSampler(format: String, startMs: Option[Long], endMs: Option[Long])
      extends Sampler {
    val dataType: DataType = StringType
    private val ft = FancyTime(format)
    private val epoch = 1375315200000L // 2013-08-01T00:00:00Z, the reference's anchor
    private val meanMs = 100.0 * 24 * 3600 * 1000
    def sample(ctx: GenContext): Any = (startMs, endMs) match {
      case (None, None) =>
        val back = (-math.log(ctx.rng.nextDouble()) * meanMs).toLong
        ft.formatMillis(epoch - back)
      case (so, eo) =>
        // one-sided bounds default the other side: start → epoch 1970,
        // end → the 2013-08-01 anchor, but never BEFORE the given start
        // (a start after the anchor must not invert the range)
        val s = so.getOrElse(0L)
        val e = eo.getOrElse(math.max(epoch, s + 86400000L))
        require(e > s, s"date: start must precede end ($s >= $e)")
        ft.formatMillis(s + (ctx.rng.nextDouble() * (e - s)).toLong)
    }
  }

  /** `event` (samplers/ArrivalSampler.java:93-100): progressive arrival
    * clock — each call advances now += Exp(meanInterval). State is
    * per-partition (the reference's is per-thread), so event times are
    * monotonic within a partition.
    */
  final class EventSampler(startMs: Long, meanIntervalMs: Double, format: String)
      extends Sampler {
    val dataType: DataType = StringType
    private val ft = FancyTime(format)
    private var now: Double = startMs.toDouble
    def sample(ctx: GenContext): Any = {
      now += -math.log(ctx.rng.nextDouble()) * meanIntervalMs
      ft.formatMillis(now.toLong)
    }
  }

  /** `random-walk` (samplers/RandomWalkSampler.java:70-77): cumulative
    * sum of N(mean, sd) steps from `start`; `verbose` returns
    * {value, step}. Per-partition walk state.
    */
  final class RandomWalkSampler(start: Double, mean: Double, sd: Double,
      verbose: Boolean) extends Sampler {
    val dataType: DataType =
      if (verbose)
        StructType(Seq(StructField("value", DoubleType), StructField("step", DoubleType)))
      else DoubleType
    private var value = start
    def sample(ctx: GenContext): Any = {
      val step = ctx.rng.nextGaussian() * sd + mean
      value += step
      if (verbose) Row(value, step) else value
    }
    // the reference's RandomWalkSampler.restart() resets to start
    // (RandomWalkSampler.java:65-67) — without this, record 2's walk
    // would continue from record 1's endpoint
    override def restart(): Unit = value = start
  }

  /** `foreign-key` (samplers/ForeignKeySampler.java:67-78): int key in
    * [0,size) with Zipf-ish skew p(i) ∝ (i+1)^-skew. Cumulative table for
    * small domains; closed-form power-law inverse CDF for huge ones (no
    * O(size) state on executors).
    */
  final class ForeignKeySampler(size: Long, skew: Double) extends Sampler {
    val dataType: DataType = LongType
    private val table: Option[Array[Double]] =
      if (size <= (1 << 20)) Some(ForeignKeySampler.cumulativeTable(size.toInt, skew))
      else None
    def sample(ctx: GenContext): Any = table match {
      case Some(a) =>
        val u = ctx.rng.nextDouble() * a(a.length - 1)
        val idx = java.util.Arrays.binarySearch(a, u)
        (if (idx < 0) -idx - 1 else idx).toLong.min(size - 1)
      case None =>
        // continuous power-law inverse CDF approximation of the Zipf tail
        val u = ctx.rng.nextDouble()
        if (skew == 1.0) (math.pow(size.toDouble, u) - 1).toLong.min(size - 1)
        else {
          val e = 1.0 - skew
          ((math.pow(u * (math.pow(size.toDouble, e) - 1) + 1, 1.0 / e)) - 1).toLong
            .max(0).min(size - 1)
        }
    }
  }

  object ForeignKeySampler {
    // the cumulative Zipf table is deterministic read-only data, so build
    // it ONCE per JVM per (size, skew) instead of per task: a 1M-entry
    // table costs ~1M pow() calls, and every partition re-deriving it
    // serialized a measurable chunk of generation time (per-executor
    // memoization is the right scale shape — no driver shipping, no
    // cross-executor coordination, bounded by distinct configs)
    private val tables =
      scala.collection.concurrent.TrieMap.empty[(Int, Double), Array[Double]]
    private[synth] def cumulativeTable(size: Int, skew: Double): Array[Double] =
      tables.getOrElseUpdate((size, skew), {
        val a = new Array[Double](size)
        var s = 0.0
        var i = 0
        while (i < size) { s += math.pow(i + 1.0, -skew); a(i) = s; i += 1 }
        a
      })
  }

  /** `pitman_yor` / `long-tail` (samplers/LongTailSampler.java:41,
    * distributions/ChineseRestaurant.java:67-91): rich-get-richer integer
    * stream. CRP state is per-partition (semantics-faithful: the
    * reference's NiFi shell already keeps per-thread CRPs — SURVEY §7.4).
    */
  final class PitmanYorSampler(alpha: Double, discount: Double) extends Sampler {
    val dataType: DataType = LongType
    private val crp = new ChineseRestaurant(alpha, discount)
    def sample(ctx: GenContext): Any = crp.sample(ctx.rng).toLong
  }

  /** `vector` (samplers/VectorSampler.java:77-188): double array from
    * uniform or normal, optional log/exp transform and resolution
    * rounding.
    */
  final class VectorSampler(length: Sampler, mode: String, min: Double, max: Double,
      mean: Double, sd: Double, transform: Option[String], resolution: Option[Double])
      extends Sampler {
    val dataType: DataType = ArrayType(DoubleType, containsNull = false)
    def sample(ctx: GenContext): Any = {
      val n = (length.sample(ctx) match {
        case l: Long   => l.toInt
        case i: Int    => i
        case d: Double => d.toInt
        case other     => other.toString.toDouble.toInt
      }).max(0)
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        var v =
          if (mode == "normal") ctx.rng.nextGaussian() * sd + mean
          else min + ctx.rng.nextDouble() * (max - min)
        transform foreach {
          case "exp" => v = math.exp(v)
          case "log" => v = math.log(v)
          case _     => ()
        }
        resolution.foreach(r => v = math.rint(v / r) * r)
        out(i) = v
        i += 1
      }
      out.toSeq
    }
  }

  /** Constant (used for literal `lengthDistribution: 100` etc.). */
  final class ConstSampler(v: Any, val dataType: DataType) extends Sampler {
    def sample(ctx: GenContext): Any = v
  }

  /** Exponential array-length draw, the `sequence` default
    * (SequenceSampler.java:70-78).
    */
  final class ExpLengthSampler(meanLength: Double) extends Sampler {
    val dataType: DataType = LongType
    def sample(ctx: GenContext): Any =
      math.floor(-meanLength * math.log(ctx.rng.nextDouble())).toLong
  }
}
