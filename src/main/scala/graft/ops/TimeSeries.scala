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

  /** Per-key CUSUM changepoint: the split index maximizing the
    * cumulative deviation from the key's mean — the classic
    * at-most-one-changepoint estimator for "where did this metric
    * change regime" over a feed. All-integer via cross-multiplication:
    * the score at position i is |n·cumsum_i − i·total| (the CUSUM of
    * (v − mean) scaled by n, so no engine divides), carried in
    * DECIMAL(38,0) because n·cumsum exceeds Long at corpus scale
    * (~22 digits at 1e5 rows of micro-unit values; 38 holds to ~1e19
    * rows). Output per key: n, the 1-based changepoint index (the
    * LAST row of the left regime), and its timestamp — ties on the
    * score resolve to the earliest index, so the result is a pure
    * function of the data.
    *
    * Scale shape: one shuffle on the key, reused by all three windows
    * (cumsum, totals, rank) as local sorts over the same exchange; the
    * filter keeps one row per key.
    */
  def cusumChangepoint(df: DataFrame, keyCol: String, tsCol: Column,
      tieCol: Column, valCol: Column): DataFrame = {
    val base = df.select(col(keyCol), tsCol.cast("long").as("__ts"),
      tieCol.as("__tie"), valCol.cast("long").as("__v"))
    val ord = Window.partitionBy(keyCol).orderBy(col("__ts"), col("__tie"))
    val all = Window.partitionBy(keyCol)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val scored = base
      .withColumn("__i", row_number().over(ord).cast("long"))
      .withColumn("__cum", sum(dec(col("__v"))).over(ord))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__tot", sum(dec(col("__v"))).over(all))
      .withColumn("__s",
        abs(dec(col("__n")) * col("__cum") - dec(col("__i")) * col("__tot")))
    val rank = Window.partitionBy(keyCol)
      .orderBy(col("__s").desc, col("__i").asc)
    scored.withColumn("__rk", row_number().over(rank))
      .filter(col("__rk") === 1)
      .select(col(keyCol), col("__n").as("n"), col("__i").as("cp_idx"),
        col("__ts").as("cp_ts"))
  }

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
