package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count synopses for 100 TB profiling passes.
  *
  * KMV (k minimum values, Bar-Yossef et al. 2002): per group, the k
  * smallest distinct unsigned xxhash64 values of the key. Fixed size,
  * mergeable (union + re-cap), and — unlike HLL — EXACT as a value: the
  * sketch is a deterministic function of the key set, so two engines
  * computing it independently agree bit-for-bit (the q69 oracle), and
  * sketches taken over different partitionings of the same data are
  * identical. The estimator (k−1)·2⁶⁴/kth_min is then a pure
  * post-processing step.
  */
object Sketches {

  /** Per-group KMV sketch of `keyCol`: (groupCol, kmv array<long>).
    * Array elements are signed xxhash64 values in unsigned-ascending
    * order, at most k of them (fewer iff the group has fewer distinct
    * keys — in which case the sketch IS the exact distinct hash set).
    *
    * Uses the native `kmv_sketch` TypedImperativeAggregate when
    * GraftExtensions is registered (capped k-long buffer, map-side
    * combine, shuffle ≤ k longs per group per map task). The portable
    * fallback — collect_set then sort/slice in unsigned order — computes
    * the same value but materializes every distinct hash per group;
    * fallback only, not the scale path.
    */
  def kmvSketch(df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val h = xxhash64(col(keyCol))
    val sketch =
      if (df.sparkSession.catalog.functionExists("kmv_sketch"))
        call_function("kmv_sketch", h, lit(k))
      else {
        // unsigned sort via the sign-flip trick, then flip back
        val flipped = sort_array(collect_set(h.bitwiseXOR(lit(Long.MinValue))))
        transform(slice(flipped, 1, k), f => f.bitwiseXOR(lit(Long.MinValue)))
      }
    df.groupBy(col(groupCol)).agg(sketch.as("kmv"))
  }

  /** Distinct-count estimate from a KMV sketch column: the sketch size
    * itself when the group had < k distinct keys (exact), else
    * (k−1)·2⁶⁴/kth_min with kth_min read as unsigned. The division runs
    * in double — the estimator's own error is the statistical ±1/√k of
    * the sketch, orders of magnitude above double rounding, so this
    * column is deliberately NOT part of any bit oracle (the sketch
    * itself is; estimation is post-processing).
    */
  def kmvEstimate(kmv: Column, k: Int): Column = {
    val kth = element_at(kmv, k)
    val u = kth.cast("double") + when(kth < 0, lit(math.pow(2, 64))).otherwise(lit(0d))
    when(size(kmv) < k, size(kmv).cast("long")).otherwise(
      floor(lit((k - 1).toDouble * math.pow(2, 64)) / u).cast("long"))
  }
}
