package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact distributed quantiles per key, by the nearest-rank definition
  * (rank = ceil(p·n), 1-based): one keyed sort-window pass computes
  * every requested percentile — deterministic and engine-portable,
  * unlike `approx_percentile`, whose sketch merges are
  * partitioning-dependent.
  *
  * Shape at 100 TB: ONE shuffle on the key for both windows and the
  * final aggregation (same partitioning reused). The sort is per-key
  * and parallel across keys. This is the right tool when keys are
  * plentiful relative to executors (event types, tenants, days); for a
  * single global quantile over everything, pair it with a salted
  * pre-aggregation or use a sketch — a lone key serializes its sort.
  * All rank arithmetic is integer (ceil(p·n) = (n·p + 99) div 100 for
  * integer percents), so an oracle reproduces row-for-row.
  */
object Quantiles {

  /** Per-key exact percentiles of `valCol` (any orderable numeric; ties
    * broken by `tieCol` for full determinism). Returns one row per key:
    * (key, n, p{pct} ...).
    */
  def exactQuantiles(df: DataFrame, keyCol: String, valCol: Column,
      tieCol: Column, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1, 100]: $pcts")
    require(pcts.distinct.size == pcts.size,
      s"duplicate percents would produce duplicate output columns: $pcts")
    val wOrd = Window.partitionBy(keyCol).orderBy(valCol, tieCol)
    val wAll = Window.partitionBy(keyCol)
    val ranked = df.select(col(keyCol), valCol.as("__v"),
      row_number().over(wOrd).as("__rn"),
      count(lit(1)).over(wAll).as("__n"))
    val aggs = max(col("__n")).as("n") +: pcts.map(p =>
      max(when(col("__rn") === expr(s"(__n * $p + 99) div 100"), col("__v")))
        .as(s"p$p"))
    ranked.groupBy(keyCol).agg(aggs.head, aggs.tail: _*)
  }
}
