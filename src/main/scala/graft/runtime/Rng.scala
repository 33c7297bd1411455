package graft.runtime

/** Seeded, splittable randomness for reproducible distributed generation.
  *
  * The reference engine (com.mapr.synth) seeds each NiFi worker thread's
  * sampler independently (ThreadLocal samplers,
  * nifi-datasynthesizer-processors/.../DataSynthesizerBase.java:130), which
  * makes multi-threaded runs non-reproducible. We do strictly better: every
  * Spark partition (or row) derives its RNG from the full 64-bit SplitMix64
  * mix of (seed, partitionId), so a run with the same seed is
  * bit-reproducible regardless of task scheduling, and streams are
  * decorrelated over the full 64-bit state (java.util.Random's 48-bit seed
  * truncation would invite birthday collisions at 100 TB partition counts).
  */
object Rng {
  /** SplitMix64 finalizer — decorrelates nearby seeds. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Combine two 64-bit streams (e.g. seed and a field-path hash). */
  def mix2(a: Long, b: Long): Long = mix(mix(a) ^ b)

  /** java.util.Random-compatible generator backed by SplitMix64: full
    * 64-bit state, every call advances by the golden-ratio increment and
    * finalizes — statistically strong and cheap (3 mul + shifts per draw).
    */
  final class SplitMix(seed0: Long) extends java.util.Random(0L) with Serializable {
    private var state: Long = seed0
    override def nextLong(): Long = { state += 0x9e3779b97f4a7c15L; finalizeMix(state) }
    private def finalizeMix(z0: Long): Long = {
      var z = z0
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    override protected def next(bits: Int): Int = (nextLong() >>> (64 - bits)).toInt
    override def nextInt(): Int = (nextLong() >>> 32).toInt
    override def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16 // 2^-53
    override def setSeed(s: Long): Unit = state = s // called by j.u.Random ctor before init
  }

  def forPartition(seed: Long, partitionId: Int): java.util.Random =
    new SplitMix(mix2(seed, partitionId.toLong * 0x9e3779b97f4a7c15L))

  def forKey(seed: Long, key: Long): java.util.Random =
    new SplitMix(mix2(seed, key))
}
