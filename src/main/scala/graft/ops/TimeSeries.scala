package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series downsampling: OHLC (open/high/low/close) bucket
  * summaries — the standard lossy compaction for monitoring and
  * charting pipelines, keeping per-bucket shape (first/last/extremes)
  * instead of a bare mean.
  *
  * Scale shape: one keyed shuffle; the two row_number windows share
  * the same partitioning (one exchange, two local sorts), and the
  * final aggregation is map-side combinable over the windowed rows.
  */
object TimeSeries {

  /** Per-key-bucket OHLC: open = value at the earliest (ts, tie),
    * close = at the latest, high/low = extremes, n = bucket size.
    * Deterministic under ties via `tieCol`.
    */
  def ohlc(df: DataFrame, keyCols: Seq[String], tsCol: Column,
      valCol: Column, tieCol: Column): DataFrame = {
    require(keyCols.nonEmpty)
    val keys = keyCols.map(col)
    df.select(keys ++ Seq(tsCol.as("__ts"), valCol.as("__v"), tieCol.as("__t")): _*)
      .withColumn("__rna", row_number().over(
        Window.partitionBy(keys: _*).orderBy(col("__ts").asc, col("__t").asc)))
      .withColumn("__rnd", row_number().over(
        Window.partitionBy(keys: _*).orderBy(col("__ts").desc, col("__t").desc)))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        max(when(col("__rna") === 1, col("__v"))).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max(when(col("__rnd") === 1, col("__v"))).as("close"))
  }
}
