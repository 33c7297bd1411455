package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus snapshots — the
  * monitoring primitive for a recurring crawl/ingest feed. Distinct
  * from row-identity diffing ([[SnapshotDiff]], "which docs changed")
  * and token disparity (q135, "which words shifted"): this compares
  * the SHAPE of a feature's distribution — source mix, language mix,
  * length histogram — and reports per-category shares, their deltas,
  * appeared/vanished categories, and a total-variation distance.
  *
  * All statistics are integer-exact by the repo's ppm convention:
  * shares are `n * 1_000_000 div total` (floor), deltas are absolute
  * ppm differences, and the TV distance is `sum(deltas) div 2` — no
  * doubles anywhere, so every report replays bit-for-bit in any SQL
  * engine.
  *
  * Scale shape: one map-side-combinable groupBy per snapshot (the two
  * count tables are category-dimension-sized), a full outer join
  * between them, and a broadcast of the two scalar totals. No
  * corpus-sized shuffle beyond the two counting aggregations; at
  * 100 TB the drift report costs two scans.
  */
object Drift {

  /** Categorical drift report between snapshots `a` (baseline) and `b`
    * (current) on `catCol`: one row per category seen in EITHER
    * snapshot with counts, floor-ppm shares, the absolute ppm delta,
    * and a status (`appeared` / `vanished` / `present`). Null category
    * values count as the empty-string category rather than silently
    * dropping rows.
    */
  def categoricalDrift(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    def counts(df: DataFrame, out: String): DataFrame = df
      .select(coalesce(col(catCol).cast("string"), lit("")).as("category"))
      .groupBy("category").agg(count(lit(1)).as(out))
    val ca = counts(a, "n_a")
    val cb = counts(b, "n_b")
    // both sides are 1-ROW aggregates; broadcast keeps the plan on the
    // whitelisted BroadcastNestedLoopJoin shape (q107 convention)
    val tot = ca.agg(sum("n_a").as("tot_a"))
      .crossJoin(broadcast(cb.agg(sum("n_b").as("tot_b"))))
      .select(coalesce(col("tot_a"), lit(0L)).as("tot_a"),
        coalesce(col("tot_b"), lit(0L)).as("tot_b"))
    ca.join(cb, Seq("category"), "full_outer")
      .crossJoin(broadcast(tot))
      .select(col("category"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        col("tot_a"), col("tot_b"))
      // floor ppm; guard the degenerate empty snapshot (share 0). The
      // n * 1e6 product goes through DECIMAL(38,0): at corpus scale a
      // dominant category's count * 1e6 exceeds Long.MaxValue
      // (n > ~9.2e12 rows) and the pure-long product would throw under
      // ANSI — the quotient is <= 1e6 so the result is exactly the same
      // BIGINT wherever both are defined
      .withColumn("ppm_a", when(col("tot_a") > 0,
        expr("CAST(CAST(n_a AS DECIMAL(38,0)) * 1000000 div tot_a AS BIGINT)"))
        .otherwise(lit(0L)))
      .withColumn("ppm_b", when(col("tot_b") > 0,
        expr("CAST(CAST(n_b AS DECIMAL(38,0)) * 1000000 div tot_b AS BIGINT)"))
        .otherwise(lit(0L)))
      .withColumn("delta_ppm", abs(col("ppm_a") - col("ppm_b")))
      .withColumn("status",
        when(col("n_a") === 0L, lit("appeared"))
          .when(col("n_b") === 0L, lit("vanished"))
          .otherwise(lit("present")))
      .drop("tot_a", "tot_b")
  }

  /** Numeric drift as categorical drift over integer-exact buckets:
    * values map to `clamp((v - lo) * nBuckets div (hi - lo), 0,
    * nBuckets - 1)` (all-long arithmetic — callers pass integral
    * columns like lengths or cents, the repo-wide convention). Values
    * outside [lo, hi) land in the edge buckets, so tails drift is
    * visible rather than dropped.
    */
  def numericDrift(a: DataFrame, b: DataFrame, valCol: Column,
      lo: Long, hi: Long, nBuckets: Int): DataFrame = {
    require(hi > lo && nBuckets >= 1, "need hi > lo and nBuckets >= 1")
    require(hi - lo <= Long.MaxValue / nBuckets,
      "span * nBuckets must fit in a Long")
    // clamp the VALUE into [lo, hi] BEFORE subtracting and multiplying:
    // a corrupt extreme (Long.MaxValue sentinel in a dirty feed — the
    // data this monitor targets) would otherwise overflow `off * nb`
    // (ANSI throw, or a silent wrap filing the outlier into the WRONG
    // edge bucket). Clamp-first is bucket-equivalent for every input:
    // in-range values are untouched, out-of-range land on the edge.
    // Integral `div`, not Column./ (double division — a 2^53+ offset
    // would round the bucket edge).
    def bucketed(df: DataFrame): DataFrame = df
      .select((least(greatest(valCol.cast("long"), lit(lo)), lit(hi)) - lit(lo))
        .as("__off"))
      .selectExpr("least(__off * " + nBuckets + "L div " +
        (hi - lo) + "L, " + (nBuckets - 1) + "L) AS bucket")
    categoricalDrift(bucketed(a), bucketed(b), "bucket")
  }

  /** One-row summary of a [[categoricalDrift]] report: category counts
    * by status and the total-variation distance in ppm (half the sum
    * of absolute share deltas — 0 for identical distributions,
    * 1,000,000 for disjoint ones, modulo floor rounding).
    */
  def driftSummary(report: DataFrame): DataFrame = report.agg(
    count(lit(1)).as("n_categories"),
    sum(when(col("status") === "appeared", 1L).otherwise(0L)).as("n_appeared"),
    sum(when(col("status") === "vanished", 1L).otherwise(0L)).as("n_vanished"),
    expr("sum(delta_ppm) div 2").as("tv_ppm"))
}
