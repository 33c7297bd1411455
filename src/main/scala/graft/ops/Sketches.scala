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

  /** Per-group Misra–Gries frequent-items sketch of `keyCol`:
    * (groupCol, freq array<struct<item,cnt>>), counters sorted by
    * (cnt desc, item asc), at most `capacity` of them.
    *
    * Scale contract: the aggregate's buffer is a capped counter map, so
    * the shuffle carries ≤ capacity counters per group per map task —
    * constant, where the exact `groupBy(key).count` path shuffles one
    * row per distinct key (unbounded for open domains at 100 TB). When
    * a group's distinct-key count is ≤ capacity the sketch equals the
    * exact count table (the q71 oracle regime); above it, reported
    * counts are underestimates within n/(capacity+1) and every key with
    * true count > n/(capacity+1) is retained (see
    * [[graft.expr.FreqSketchAgg]]).
    *
    * The portable fallback (exact count + top-capacity window) computes
    * the same value ONLY in the exact regime; it is a correctness
    * stand-in, not the scale path.
    */
  def freqSketch(df: DataFrame, groupCol: String, keyCol: String, capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be positive: $capacity")
    if (df.sparkSession.catalog.functionExists("freq_sketch"))
      df.groupBy(col(groupCol))
        .agg(call_function("freq_sketch", col(keyCol).cast("string"), lit(capacity)).as("freq"))
    else {
      import org.apache.spark.sql.expressions.Window
      val counted = df.groupBy(col(groupCol), col(keyCol).cast("string").as("item"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(groupCol).orderBy(col("cnt").desc, col("item"))
      counted.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= capacity)
        .groupBy(col(groupCol))
        .agg(sort_array(collect_list(struct(
          (lit(Long.MaxValue) - col("cnt")).as("negcnt"),
          col("item"), col("cnt"))))
          .as("srt"))
        .select(col(groupCol),
          transform(col("srt"), e => struct(e("item").as("item"), e("cnt").as("cnt")))
            .as("freq"))
    }
  }

  /** KMV set algebra — the point of sketching at 100 TB: per-slice
    * sketches are computed ONCE in the profiling pass, then combined
    * arbitrarily (any pair, any union) without ever rescanning the
    * data. Union of two KMV sketches is the distinct union of their
    * hash sets re-capped to the k smallest (unsigned order via the
    * sign-flip trick); it is EXACTLY the sketch the union of the
    * underlying key sets would have produced, so every estimator
    * property carries over. Pure HOF column arithmetic, broadcastable,
    * no shuffle.
    */
  def kmvUnion(a: Column, b: Column, k: Int): Column = {
    val flipped = array_sort(array_union(
      transform(a, x => x.bitwiseXOR(lit(Long.MinValue))),
      transform(b, x => x.bitwiseXOR(lit(Long.MinValue)))))
    transform(slice(flipped, 1, k), f => f.bitwiseXOR(lit(Long.MinValue)))
  }

  /** Exact count of shared hash values between two sketches. In the
    * exact regime (both sketches below k — each IS its distinct hash
    * set) this is the TRUE intersection cardinality; in the approximate
    * regime it feeds the standard KMV Jaccard estimator
    * |A∩B over the union's bottom-k| / k.
    */
  def kmvIntersectCount(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("long")

  /** Per-group quantile sketch of `valCol` (cast to long — the repo's
    * integer-exact convention): (groupCol, qsketch
    * array<struct<v,w>> sorted by (v, w)). Native
    * [[graft.expr.QuantileSketchAgg]] when GraftExtensions is
    * registered: deterministic binary compaction, buffer ≤
    * capacity·levels values per group per map task — constant-order
    * shuffle where exact quantiles (ops/Quantiles) move every row.
    *
    * The portable fallback materializes the full sorted value list at
    * weight 1 — identical to the native sketch ONLY in the exact regime
    * (group size ≤ capacity); a correctness stand-in, not the scale
    * path.
    */
  def quantileSketch(df: DataFrame, groupCol: String, valCol: String,
      capacity: Int): DataFrame = {
    require(capacity >= 8, s"capacity must be >= 8: $capacity")
    val v = col(valCol).cast("long")
    if (df.sparkSession.catalog.functionExists("quantile_sketch"))
      df.groupBy(col(groupCol))
        .agg(call_function("quantile_sketch", v, lit(capacity)).as("qsketch"))
    else
      df.groupBy(col(groupCol))
        .agg(sort_array(collect_list(v)).as("__vs"))
        .select(col(groupCol),
          transform(col("__vs"), x => struct(x.as("v"), lit(1L).as("w")))
            .as("qsketch"))
  }

  /** Total weight of a quantile-sketch summary (= the group's row count:
    * compaction preserves weight exactly).
    */
  def summaryWeight(summary: Column): Column =
    aggregate(summary, lit(0L), (acc, e) => acc + e("w"))

  /** Nearest-rank quantile from a summary: the smallest v whose
    * cumulative weight reaches `target` (callers derive target as
    * ceil(q·W)). BOTH arguments must be ATTRIBUTES, not inline
    * expression trees — this runs inside a fold lambda and Catalyst
    * does not CSE inside lambda bodies (the repo's staging rule); an
    * inline aggregate target would re-evaluate per element.
    */
  def quantileFromSummary(summary: Column, target: Column): Column =
    aggregate(summary,
      struct(lit(0L).as("cum"), lit(null).cast("long").as("ans")),
      (st, e) => struct(
        (st("cum") + e("w")).as("cum"),
        coalesce(st("ans"), when(st("cum") + e("w") >= target, e("v"))).as("ans")),
      st => st("ans"))

  /** Per-group HyperLogLog register array of `keyCol`: (groupCol, hll
    * array<int> of length 2^p). Register j = max rho over the group's
    * hashes landing in bucket j (top p bits route, remaining 64−p bits
    * rank) — a pure function of the key SET, so partitioning-invariant
    * and bit-replayable (the q84 oracle). Constant 2^p bytes per group
    * regardless of cardinality: the constant-size complement of
    * [[kmvSketch]] (exact below k, 8k bytes).
    *
    * Native [[graft.expr.HllSketchAgg]] when GraftExtensions is
    * registered (fixed-array buffer, map-side combine). The portable
    * fallback computes identical registers with bin()-string bit length
    * — exact integer/string arithmetic, no doubles — but shuffles one
    * row per touched (group, register) pair; correctness stand-in, not
    * the scale path.
    */
  def hllSketch(df: DataFrame, groupCol: String, keyCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16]: $p")
    val m = 1 << p
    val h = xxhash64(col(keyCol))
    if (df.sparkSession.catalog.functionExists("hll_sketch"))
      df.groupBy(col(groupCol))
        .agg(call_function("hll_sketch", h, lit(p)).as("hll"))
    else {
      // rho from the unsigned bit length of the remaining bits shifted to
      // the top: bin() prints the minimal unsigned-64 binary form, so
      // 65 - length(bin(w)) == leading zeros + 1; w == 0 means all 64-p
      // remaining bits are zero -> rho = 64-p+1
      val w = shiftleft(h, p)
      val reg = shiftrightunsigned(h, 64 - p)
      val rho = when(w === 0L, lit(64 - p + 1))
        .otherwise(lit(65) - length(bin(w)))
      df.select(col(groupCol), reg.as("__reg"), rho.as("__rho"))
        .groupBy(col(groupCol), col("__reg"))
        .agg(max(col("__rho")).as("__mr"))
        .groupBy(col(groupCol))
        .agg(map_from_entries(collect_list(struct(col("__reg"), col("__mr"))))
          .as("__regmap"))
        .select(col(groupCol),
          transform(sequence(lit(0L), lit((m - 1).toLong)),
            j => coalesce(element_at(col("__regmap"), j), lit(0)).cast("int"))
            .as("hll"))
    }
  }

  /** Union of two HLL register arrays: elementwise max IS the sketch the
    * union of the underlying key sets would have produced — the same
    * sketch-once-combine-forever algebra as [[kmvUnion]]. Pure HOF
    * column arithmetic, no shuffle.
    */
  def hllUnion(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => greatest(x, y))

  /** Cardinality estimate from an HLL register array: the raw harmonic-
    * mean estimator alpha_m·m²/Σ2^−M_j with linear counting
    * (m·ln(m/V), V = empty registers) below the 2.5m threshold — the
    * original Flajolet et al. regime split. Runs in doubles: estimator
    * error is the statistical ±1.04/√m, orders above double rounding, so
    * this column is deliberately NOT part of any bit oracle (the
    * register array is; estimation is post-processing — same contract
    * as [[kmvEstimate]]).
    */
  def hllEstimate(hll: Column, p: Int): Column = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    // 2^-reg is a dyadic rational: pow() is exact on these
    val invSum = aggregate(hll, lit(0.0d), (acc, r) => acc + pow(lit(2.0d), -r))
    val zeros = aggregate(hll, lit(0L), (acc, r) => acc + when(r === 0, 1L).otherwise(0L))
    val raw = lit(alpha * m.toDouble * m.toDouble) / invSum
    when(raw <= lit(2.5 * m) && zeros > 0,
      floor(lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double"))))
      .otherwise(floor(raw)).cast("long")
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

  // --------------------------------------------- Count–Min (Cormode 2005)

  /** Count–Min sketch as a SLOT TABLE: (slot, cnt) rows with
    * slot = row·width + pmod(xxhash64(key, row), width) for each of the
    * `depth` hash rows, summed over all occurrences of `keyCol` — the
    * frequency-overestimate complement of the Misra–Gries sketch
    * (freq_sketch tracks WHICH items are heavy; CM answers point
    * queries for ANY item, always >= truth).
    *
    * The table form IS the sketch: it is map-side combinable (one keyed
    * count), two sketches merge by adding counts slot-wise, the dense
    * array is `transform(sequence(...))` post-processing if needed, and
    * every count replays exactly in SQL (the q123 oracle). Only
    * nonzero slots are materialized — at most depth·width rows total,
    * constant in the input size.
    */
  def cmSketchRows(df: DataFrame, keyCol: Column, width: Int, depth: Int): DataFrame = {
    require(width >= 2 && depth >= 1 && depth <= 8)
    df.select(explode(sequence(lit(0), lit(depth - 1))).as("__row"), keyCol.as("__k"))
      .select((col("__row").cast("long") * width +
        pmod(xxhash64(col("__k").cast("long"), col("__row").cast("long")),
          lit(width.toLong))).as("slot"))
      .groupBy("slot").agg(count(lit(1)).as("cnt"))
  }

  /** Equi-join size estimation from two CM slot tables (the AGMS/CM
    * inner-product estimator): per hash row, Σ_slot cmA[slot]·cmB[slot]
    * is an OVERESTIMATE of |A ⋈ B| on the sketched key (collisions only
    * add), and the min over rows is the estimate. In the exact regime
    * (no collisions) the inner product IS the join size. This is the
    * planning primitive: decide broadcast vs shuffle vs salt for a
    * 100 TB join from two constant-size synopses, never scanning either
    * side again. Input: two (slot, cnt) tables from [[cmSketchRows]]
    * built with the SAME width/depth. Output: (hash_row, est).
    */
  def cmJoinSizeByRow(a: DataFrame, b: DataFrame, width: Int): DataFrame =
    a.select(col("slot"), col("cnt").as("ca"))
      .join(b.select(col("slot"), col("cnt").as("cb")), "slot")
      .groupBy(expr(s"slot div $width").as("hash_row"))
      .agg(sum(col("ca") * col("cb")).as("est"))

  /** Point estimate for `key` from a collected slot table: min over the
    * depth rows of that row's slot count (absent slot = 0). The CM
    * guarantee: estimate >= true count, with overestimate bounded by
    * collisions. Uses the same XXH64 chain Spark's xxhash64(key, row)
    * computes, so estimates agree with [[cmSketchRows]] exactly.
    */
  def cmEstimate(slots: Map[Long, Long], key: Long, width: Int, depth: Int): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    (0 until depth).map { r =>
      val h = XXH64.hashLong(r.toLong, XXH64.hashLong(key, 42L))
      val pos = ((h % width) + width) % width
      slots.getOrElse(r.toLong * width + pos, 0L)
    }.min
  }
}
