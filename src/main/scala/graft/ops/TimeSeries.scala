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
  /** Trapezoidal time-weighted integration per key: consecutive samples
    * (ordered by ts, tie) contribute (t2−t1)·(v1+v2) to `area2` —
    * twice the trapezoid area, kept doubled so everything stays exact
    * integers. The time-weighted average is then area2 / (2·dt_sum).
    * Irregularly-sampled series make the PLAIN mean wrong (a sensor
    * that reports more often when idle drags the mean down); this is
    * the standard TSDB correction. One keyed shuffle shared by the lag
    * window and the aggregation.
    */
  def trapezoidArea(df: DataFrame, keyCols: Seq[String], tsCol: Column,
      valCol: Column, tieCol: Column): DataFrame = {
    require(keyCols.nonEmpty)
    val keys = keyCols.map(col)
    df.select(keys ++ Seq(tsCol.as("__t"), valCol.as("__v"), tieCol.as("__o")): _*)
      .withColumn("__pt", lag("__t", 1).over(
        Window.partitionBy(keys: _*).orderBy(col("__t").asc, col("__o").asc)))
      .withColumn("__pv", lag("__v", 1).over(
        Window.partitionBy(keys: _*).orderBy(col("__t").asc, col("__o").asc)))
      .filter(col("__pt").isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_segments"),
        sum(col("__t") - col("__pt")).as("dt_sum"),
        sum((col("__t") - col("__pt")) * (col("__v") + col("__pv"))).as("area2"))
  }

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
