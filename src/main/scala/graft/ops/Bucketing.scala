package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table helpers — the co-located join strategy for repeated
  * large-to-large joins (SURVEY "repartition/bucketing for co-located
  * joins"). Writing both sides bucketed+sorted by the join key lets
  * every subsequent join run shuffle-free AND sort-free: the scan
  * satisfies the join's distribution and ordering requirements.
  *
  * At 100 TB this is the difference between shuffling the fact table on
  * every query and shuffling it once at ingest.
  */
object Bucketing {

  /** Write df as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — the resulting
    * plan has no Exchange on either side (verify with
    * df.queryExecution.executedPlan: SortMergeJoin over two scans).
    */
  def cogroupJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  // ------------------------------------------------- Z-order data layout

  /** Morton/Z-order key: interleave the low `bits` bits of each column,
    * column i landing at bit positions {b·n + i}. Pure codegen'd bit
    * arithmetic — no shuffle, no UDF — and exactly replayable by any
    * engine with integer shifts (the q73 oracle).
    *
    * Inputs must be NON-NEGATIVE integer bucket numbers; bits above
    * `bits` are ignored, so callers typically mask (`v & (2^bits−1)`) or
    * range-bucket raw values first. `bits · cols.size` must stay ≤ 63
    * (the key is a signed long).
    */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"zorderKey needs >= 2 columns, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits * cols must be in [2, 63]: $bits * ${cols.size}")
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, ci) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Lay a table out in Z-order: range-partition on the interleaved key
    * and sort within partitions. Rows close in EVERY keyed dimension
    * land in the same partition/file, so each file's per-column min/max
    * spans a small hyper-rectangle and predicate-pushdown on ANY of the
    * dimensions skips most files — the multi-column clustering that a
    * plain sort gives only to its leading column. This is the standard
    * lakehouse layout move for 100 TB scan pruning; the key itself is
    * scan-side bit arithmetic and the only shuffle is the one
    * range-exchange that any re-layout costs.
    */
  def zorderBy(df: DataFrame, dims: Seq[Column], bits: Int,
      numPartitions: Int): DataFrame =
    df.withColumn("__z", zorderKey(dims, bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
