package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view delta
  * merge that keeps a 100 TB rollup fresh without rescanning history:
  * summarize each arriving slice once, then MERGE summaries per key.
  * Every component is algebraic/mergeable (count, sum, min, max) or a
  * mergeable sketch (KMV distinct — union of sketches IS the sketch of
  * the union, ops/Sketches.kmvUnion closure), so
  *
  *   merge(summarize(A), summarize(B)) == summarize(A ∪ B)
  *
  * holds exactly. The maintained table is dimension-sized (one row per
  * key); at scale it is bucketed by the key so the merge join is
  * exchange-free, and each nightly batch costs one scan OF THE BATCH.
  */
object IncrementalAgg {

  /** Per-key algebraic summary of one slice: n / integer sum / min /
    * max of `valueCol`, plus a KMV distinct sketch of `distinctCol`.
    * One map-side-combinable keyed aggregation.
    */
  def summarize(df: DataFrame, keys: Seq[String], valueCol: Column,
      distinctCol: Column, k: Int): DataFrame = {
    require(keys.nonEmpty && k >= 1)
    val h = xxhash64(distinctCol)
    val sketch =
      if (df.sparkSession.catalog.functionExists("kmv_sketch"))
        call_function("kmv_sketch", h, lit(k))
      else {
        val flipped = sort_array(collect_set(h.bitwiseXOR(lit(Long.MinValue))))
        transform(slice(flipped, 1, k), f => f.bitwiseXOR(lit(Long.MinValue)))
      }
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(valueCol).as("sum_v"),
      min(valueCol).as("min_v"),
      max(valueCol).as("max_v"),
      sketch.as("kmv"))
  }

  /** Merge a maintained summary with a new slice's summary: ONE
    * key-equi full-outer join, per-component algebraic merge. Keys
    * present on only one side pass through via the coalesce ladder.
    */
  def merge(base: DataFrame, delta: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    val b = base.select(keys.map(col) ++ Seq(col("n").as("b_n"),
      col("sum_v").as("b_sum"), col("min_v").as("b_min"),
      col("max_v").as("b_max"), col("kmv").as("b_kmv")): _*)
    val dd = delta.select(keys.map(col) ++ Seq(col("n").as("d_n"),
      col("sum_v").as("d_sum"), col("min_v").as("d_min"),
      col("max_v").as("d_max"), col("kmv").as("d_kmv")): _*)
    val empty = array().cast("array<bigint>")
    b.join(dd, keys, "full_outer").select(
      keys.map(col) ++ Seq(
        (coalesce(col("b_n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n"),
        (coalesce(col("b_sum"), lit(0L)) + coalesce(col("d_sum"), lit(0L)))
          .as("sum_v"),
        least(coalesce(col("b_min"), col("d_min")),
          coalesce(col("d_min"), col("b_min"))).as("min_v"),
        greatest(coalesce(col("b_max"), col("d_max")),
          coalesce(col("d_max"), col("b_max"))).as("max_v"),
        Sketches.kmvUnion(coalesce(col("b_kmv"), empty),
          coalesce(col("d_kmv"), empty), k).as("kmv")): _*)
  }
}
