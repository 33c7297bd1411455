package graft.runtime

/** Seeded, splittable randomness for reproducible distributed generation.
  *
  * The reference engine (com.mapr.synth) seeds each NiFi worker thread's
  * sampler independently (ThreadLocal samplers,
  * nifi-datasynthesizer-processors/.../DataSynthesizerBase.java:130), which
  * makes multi-threaded runs non-reproducible. We do strictly better: every
  * Spark partition derives its RNG from `mix(seed, partitionId)`, so a run
  * with the same seed and partitioning is bit-reproducible regardless of
  * task scheduling, and partitions never share a stream.
  */
object Rng {
  /** SplitMix64 finalizer — decorrelates nearby seeds. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def forPartition(seed: Long, partitionId: Int): java.util.Random =
    new java.util.Random(mix(mix(seed) ^ (partitionId.toLong * 0x9e3779b97f4a7c15L)))
}
