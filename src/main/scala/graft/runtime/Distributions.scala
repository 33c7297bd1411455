package graft.runtime

import java.util.Random
import scala.collection.mutable.ArrayBuffer

/** Weighted multinomial over values of T: cumulative-weight array +
  * binary search (O(log n) per draw). Replaces the reference's Mahout
  * `Multinomial` (used throughout com.mapr.synth.samplers.StringSampler
  * and friends) without the Mahout dependency.
  */
final class Multinomial[T](items: IndexedSeq[T], weights: IndexedSeq[Double]) extends Serializable {
  require(items.nonEmpty && items.length == weights.length, "multinomial needs matched items/weights")
  private val cum: Array[Double] = {
    val a = new Array[Double](weights.length)
    var s = 0.0
    var i = 0
    while (i < weights.length) { s += math.max(weights(i), 0.0); a(i) = s; i += 1 }
    a
  }
  private val total = cum.last
  require(total > 0, "multinomial needs positive total weight")

  def sample(rng: Random): T = {
    val u = rng.nextDouble() * total
    var idx = java.util.Arrays.binarySearch(cum, u)
    if (idx < 0) idx = -idx - 1
    items(math.min(idx, items.length - 1))
  }
  def size: Int = items.length
  def values: IndexedSeq[T] = items
}

object Multinomial {
  def apply[T](pairs: Seq[(T, Double)]): Multinomial[T] =
    new Multinomial(pairs.map(_._1).toIndexedSeq, pairs.map(_._2).toIndexedSeq)
  def uniform[T](items: Seq[T]): Multinomial[T] =
    new Multinomial(items.toIndexedSeq, IndexedSeq.fill(items.length)(1.0))
  /** 1/rank weights, like the reference's UsernameSampler name list. */
  def byRank[T](items: Seq[T]): Multinomial[T] =
    new Multinomial(items.toIndexedSeq, items.indices.map(i => 1.0 / (i + 1)))
}

/** Pitman–Yor / Chinese Restaurant Process sampler over table indices.
  * Same contract as the reference's
  * distributions/ChineseRestaurant.java:67-91: returns an int; a new
  * value appears with probability ∝ (alpha + discount·#tables); existing
  * table i with probability ∝ (count_i − discount).
  */
final class ChineseRestaurant(alpha: Double, discount: Double = 0.0) extends Serializable {
  require(alpha > 0 && discount >= 0 && discount <= 1)
  private val counts = ArrayBuffer[Long]()
  private var total = 0L // customers seated so far

  /** P(new table) = (alpha + K·d)/(n + alpha); P(table i) = (c_i − d)/(n + alpha). */
  def sample(rng: Random): Int = {
    if (counts.isEmpty) { counts += 1L; total = 1L; return 0 }
    val k = counts.length
    val u = rng.nextDouble() * (total + alpha)
    if (u < alpha + k * discount) {
      counts += 1L; total += 1L; k
    } else {
      var t = u - (alpha + k * discount) // ranges over sum(c_i − d) = n − K·d
      var i = 0
      while (i < k - 1 && t >= counts(i) - discount) { t -= counts(i) - discount; i += 1 }
      counts(i) += 1L
      total += 1L
      i
    }
  }
  def tableCount: Int = counts.length
}

/** Marsaglia–Tsang gamma variate (public-domain algorithm); replaces the
  * reference's Mahout Gamma (samplers/GammaSampler.java:48). shape>0, scale>0.
  */
object Gamma {
  def sample(rng: Random, shape: Double, scale: Double): Double = {
    require(shape > 0 && scale > 0, s"gamma needs shape>0, scale>0 (got $shape, $scale)")
    if (shape < 1.0) {
      val u = rng.nextDouble()
      sample(rng, shape + 1.0, scale) * math.pow(u, 1.0 / shape)
    } else {
      val d = shape - 1.0 / 3.0
      val c = 1.0 / math.sqrt(9.0 * d)
      var result = 0.0
      var done = false
      while (!done) {
        var x = 0.0
        var v = 0.0
        do { x = rng.nextGaussian(); v = 1.0 + c * x } while (v <= 0)
        v = v * v * v
        val u = rng.nextDouble()
        if (u < 1.0 - 0.0331 * x * x * x * x ||
            math.log(u) < 0.5 * x * x + d * (1.0 - v + math.log(v))) {
          result = d * v * scale
          done = true
        }
      }
      result
    }
  }
}
