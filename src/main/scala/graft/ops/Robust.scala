package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust statistics for data-quality gates: median/MAD outlier
  * detection (Hampel's rule — the mean/stddev z-score's breakdown
  * point is zero; one corrupted shard shifts both, while the median
  * and MAD tolerate up to 50% contamination). Everything nearest-rank
  * integer, so reports replay exactly in any SQL engine.
  *
  * Scale shape: two exact-quantile passes (each one keyed shuffle
  * reused by window + aggregation, ops/Quantiles' contract) and two
  * broadcast joins of the dimension-sized per-key statistic tables.
  */
object Robust {

  /** Per-key robust outlier report: nearest-rank median, MAD (median
    * absolute deviation), and how many values violate
    * |v − med| · thresholdDen > MAD · thresholdNum (default 3·MAD —
    * Hampel's rule; the ratio form keeps the test in exact integers).
    */
  /** Per-key winsorization: clip `valCol` into the [loPct, hiPct]
    * nearest-rank percentile band — the standard tail-taming transform
    * before moment-based statistics. Appends `clipped` plus flags.
    * One exact-quantile pass + a broadcast of the per-key band table.
    */
  def winsorize(df: DataFrame, keyCol: String, valCol: Column,
      tieCol: Column, loPct: Int, hiPct: Int): DataFrame = {
    require(loPct >= 1 && hiPct <= 100 && loPct < hiPct)
    val base = df.withColumn("__v", valCol).withColumn("__t", tieCol)
    val band = Quantiles.exactQuantiles(base, keyCol, col("__v"), col("__t"),
      Seq(loPct, hiPct))
      .select(col(keyCol), col(s"p$loPct").as("__lo"), col(s"p$hiPct").as("__hi"))
    base.join(broadcast(band), keyCol)
      .withColumn("clipped", least(greatest(col("__v"), col("__lo")), col("__hi")))
      .withColumn("clipped_lo", (col("__v") < col("__lo")).cast("int"))
      .withColumn("clipped_hi", (col("__v") > col("__hi")).cast("int"))
      .drop("__v", "__t", "__lo", "__hi")
  }

  /** Per-key median imputation: nulls in `valCol` are replaced by the
    * key's nearest-rank median OF THE NON-NULL values. Appends
    * `imputed` (the filled column) and `was_null`. The median table is
    * dimension-sized and broadcasts.
    */
  def imputeMedian(df: DataFrame, keyCol: String, valCol: Column,
      tieCol: Column): DataFrame = {
    val base = df.withColumn("__v", valCol).withColumn("__t", tieCol)
    val med = Quantiles.exactQuantiles(base.filter(col("__v").isNotNull),
      keyCol, col("__v"), col("__t"), Seq(50))
      .select(col(keyCol), col("p50").as("__med"))
    // LEFT join: the median table only has keys with >= 1 non-null value,
    // and an inner join would silently DROP every row of an all-null key —
    // the contract is a filled column plus flags, never row loss. All-null
    // keys pass through with imputed = null, was_null = 1.
    base.join(broadcast(med), Seq(keyCol), "left")
      .withColumn("imputed", coalesce(col("__v"), col("__med")))
      .withColumn("was_null", col("__v").isNull.cast("int"))
      .drop("__v", "__t", "__med")
  }

  def madOutlierReport(df: DataFrame, keyCol: String, valCol: Column,
      tieCol: Column, thresholdNum: Long = 3L, thresholdDen: Long = 1L): DataFrame = {
    require(thresholdNum >= 1 && thresholdDen >= 1)
    val base = df.select(col(keyCol), valCol.as("__v"), tieCol.as("__t"))
    val med = Quantiles.exactQuantiles(base, keyCol, col("__v"), col("__t"), Seq(50))
      .select(col(keyCol), col("n"), col("p50").as("med"))
    val withMed = base.join(broadcast(med), keyCol)
      .withColumn("__dev", abs(col("__v") - col("med")))
    val mad = Quantiles.exactQuantiles(withMed, keyCol, col("__dev"), col("__t"), Seq(50))
      .select(col(keyCol), col("p50").as("mad"))
    withMed.join(broadcast(mad), keyCol)
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("__dev") * thresholdDen > col("mad") * thresholdNum, 1L)
          .otherwise(0L)).as("n_outliers"))
  }
}
