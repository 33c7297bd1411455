package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / compliance operators for training-data curation: the
  * release-side counterpart of ops/TextAnalysis.scrubPii (which removes
  * PII from text, this family governs what leaves the pipeline).
  *
  *  - [[kAnonymityAudit]]: k-anonymity / l-diversity audit over a
  *    quasi-identifier set (Sweeney 2002; Machanavajjhala et al. 2007).
  *  - [[pseudonymizeKey]]: deterministic keyed tokenization — replaces a
  *    numeric identifier with a salted-hash token that preserves
  *    joinability across tables without exposing the raw id.
  *  - [[dpNoisyCounts]]: differentially-private histogram release via
  *    the truncated two-sided geometric mechanism (Ghosh–Roughgarden–
  *    Sundararajan 2009), with noise derived DETERMINISTICALLY from a
  *    seeded hash of the group key so a release is reproducible and
  *    partitioning-invariant (the standard trick for auditable DP
  *    pipelines: the "randomness" is a PRF of (seed, key)).
  *
  * Scale shape: every operator is a single keyed aggregation or a
  * scan-side projection — no corpus-sized shuffle beyond the one
  * groupBy each needs, no driver state beyond baked constants.
  */
object Privacy {

  /** Per-equivalence-class k-anonymity and l-diversity audit.
    *
    * Groups by the quasi-identifier columns, counts the class size and
    * the number of DISTINCT sensitive values, and flags classes that
    * violate k-anonymity (size < k) or l-diversity (distinct < l).
    * One shuffle on the QI key; count-distinct is Spark's two-phase
    * partial aggregation, map-side combinable.
    */
  def kAnonymityAudit(df: DataFrame, quasiIds: Seq[String],
      sensitive: Column, k: Int, l: Int): DataFrame = {
    require(quasiIds.nonEmpty && k >= 1 && l >= 1)
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("k_anonymous", (col("class_size") >= k).cast("int"))
      .withColumn("l_diverse", (col("n_sensitive") >= l).cast("int"))
  }

  /** Deterministic keyed tokenization of a numeric identifier:
    * token = xxhash64(id, salt) — a 64-bit PRF under the secret salt.
    * Equal ids map to equal tokens (joinability preserved across every
    * table tokenized with the same salt); without the salt the mapping
    * is not invertible by rainbow table over small id domains only if
    * the salt stays secret, which is the standard tokenization
    * contract. Pure scan-side codegen'd expression — zero shuffle.
    */
  def pseudonymizeKey(id: Column, salt: Long): Column =
    xxhash64(id.cast("long"), lit(salt))

  /** Cumulative threshold table for the truncated two-sided geometric
    * mechanism at privacy parameter `eps`, truncated to |noise| <= cap.
    * Probabilities are scaled to 32-bit fixed point; the SAME constants
    * are baked into the Spark plan and any replaying oracle, so the
    * noise draw is pure integer comparison — bit-exact cross-engine.
    * Returns (threshold, noise) pairs: the draw u32 in [0, 2^32) maps
    * to the first row with u32 < threshold.
    */
  def geometricThresholds(eps: Double, cap: Int): Seq[(Long, Int)] = {
    require(eps > 0 && cap >= 1)
    val a = math.exp(-eps)
    val ks = (-cap) to cap
    val raw = ks.map(kk => math.pow(a, math.abs(kk)))
    val total = raw.sum
    val scale = math.pow(2.0, 32)
    var cum = 0.0
    val ts = ks.zip(raw).map { case (kk, p) =>
      cum += p / total
      (math.min(math.round(cum * scale), 4294967296L), kk)
    }
    // force the last threshold to 2^32 so every u32 maps to some noise
    ts.init :+ ((4294967296L, cap))
  }

  /** The noise column for [[dpNoisyCounts]]: u32 from a seeded hash of
    * the integer group key, mapped through the threshold CASE ladder.
    */
  def geometricNoise(key: Column, seed: Long, thresholds: Seq[(Long, Int)]): Column = {
    val u32 = pmod(xxhash64(key.cast("long"), lit(seed)), lit(4294967296L))
    thresholds.init.foldRight(lit(thresholds.last._2)) {
      case ((t, noise), elseC) => when(u32 < t, lit(noise)).otherwise(elseC)
    }
  }

  /** Noisy count release per integer group key: true count + two-sided
    * geometric noise TRUNCATED at |noise| <= cap, clamped at zero.
    *
    * Privacy contract, stated precisely: truncation breaks PURE eps-DP
    * (neighboring datasets can produce boundary outputs with
    * distinguishable probability), so the mechanism is approximate
    * (eps, delta)-DP with delta bounded by the truncated tail mass
    * 2·a^(cap+1)/(1+a−2a^(cap+1)·a/(1−a)) ≈ 2·e^(−eps·cap) — negligible
    * at the default (eps=1, cap=20: delta < 5e−9) but not zero. And
    * because the noise is a deterministic PRF of (seed, group key),
    * ANY privacy guarantee holds only against adversaries who do not
    * hold the seed: the seed is a secret key (treat it like one — a
    * seed-holder subtracts the noise exactly). The PRF construction is
    * what buys reproducibility, partitioning-invariance, and
    * cross-engine replay; a production release pipeline wanting
    * seedless randomness would swap the PRF for a true RNG and give up
    * the replay oracle.
    *
    * One keyed aggregation; the noise is a scan-side CASE ladder over
    * the (2·cap+1)-entry constant table.
    */
  def dpNoisyCounts(df: DataFrame, keyCol: String, seed: Long,
      eps: Double = 1.0, cap: Int = 20): DataFrame = {
    val thresholds = geometricThresholds(eps, cap)
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("true_count"))
      .withColumn("noise", geometricNoise(col(keyCol), seed, thresholds))
      .select(col(keyCol),
        greatest(col("true_count") + col("noise"), lit(0L)).as("released_count"))
  }
}
