package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone-map (file-skipping) analysis: simulate a file layout as a
  * bucket assignment, collect per-bucket min/max/count "zone maps" for
  * a sort key, and report how much of the table a range predicate
  * could prune under each layout. This is the planning-side math of
  * 100 TB data skipping — parquet row-group stats, Delta/Iceberg file
  * pruning, and the repo's own IVF partition pruning are all instances
  * — expressed as exact integer aggregates so the report replays
  * bit-for-bit in any engine.
  *
  * Scale shape: one map-side-combinable groupBy per layout over the
  * scan (min/max/count are partial-aggregable); everything after runs
  * on the bucket-count-sized zone table. Comparing a clustered layout
  * against a hash layout quantifies WHY sort-clustering matters: tight
  * zones prune, shuffled zones span the domain and prune nothing.
  */
object ZoneMap {

  /** Per-bucket zone map: (bucket, zmin, zmax, cnt) for integer key
    * expression `key` under layout `bucket`.
    */
  def zoneStats(df: DataFrame, bucket: Column, key: Column): DataFrame =
    df.groupBy(bucket.cast("long").as("bucket"))
      .agg(min(key).cast("long").as("zmin"), max(key).cast("long").as("zmax"),
        count(lit(1)).as("cnt"))

  /** One summary row per layout: bucket count, buckets a [lo, hi] key
    * predicate can prune (zone entirely outside the range), rows in
    * those pruned buckets, and total rows. All BIGINT.
    */
  def pruneReport(df: DataFrame, layouts: Seq[(String, Column)], key: Column,
      lo: Long, hi: Long): DataFrame =
    layouts.map { case (name, b) =>
      val pruned = col("zmax") < lo || col("zmin") > hi
      zoneStats(df, b, key).agg(
        count(lit(1)).as("n_buckets"),
        sum(when(pruned, 1L).otherwise(0L)).as("pruned_buckets"),
        sum(when(pruned, col("cnt")).otherwise(0L)).as("pruned_rows"),
        sum(col("cnt")).as("total_rows"))
        .select(lit(name).as("layout"), col("n_buckets"), col("pruned_buckets"),
          col("pruned_rows"), col("total_rows"))
    }.reduce(_ union _)
}
