package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation harness over INTEGER scores: ROC AUC (Mann–Whitney
  * rank-sum with exact tie handling) plus threshold confusion metrics,
  * all in integer arithmetic so the result is bit-identical in any
  * engine — no floating-point rank ties, no ulp drift in the division
  * (`div` is 64-bit integer division end to end).
  *
  * Scale shape: one corpus-sized groupBy(score) collapses the input to
  * a score HISTOGRAM (map-side combinable, at most one row per distinct
  * integer score); the cumulative window and every metric then run over
  * that dimension-sized table. The single-partition window is bounded
  * by the score domain, never the corpus — the same histogram trick as
  * the q64 quality terciles. At 100 TB the only corpus pass is the
  * partial-agg scan.
  *
  * AUC with ties, integer form: for score group g with count c_g,
  * positives p_g and cumulative count before it cum_g, the tie-averaged
  * rank is (2·cum_g + c_g + 1)/2, so
  *   2·U = Σ_g p_g · (2·cum_g + c_g + 1) − npos·(npos+1)
  *   AUC = U / (npos·nneg)   →  auc_micro = ⌊10⁶·2U / (2·npos·nneg)⌋.
  */
object Eval {

  /** One-row metric table for binary labels (`labelCol` ∈ {0,1}) and
    * integer scores, classified positive at `score >= threshold`.
    * Columns (all BIGINT): npos, nneg, auc_micro, tp, fp, tn, fn,
    * prec_micro, rec_micro, f1_micro.
    */
  def binaryMetrics(df: DataFrame, scoreCol: String, labelCol: String,
      threshold: Long = 0L): DataFrame = {
    val hist = df
      .groupBy(col(scoreCol).cast("long").as("s"))
      .agg(count(lit(1)).as("c"), sum(col(labelCol).cast("long")).as("p"))
    // dimension-sized window: rows = distinct integer scores
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist.withColumn("cum", coalesce(sum(col("c")).over(w), lit(0L)))
    ranked.agg(
      sum(col("p")).as("npos"),
      (sum(col("c")) - sum(col("p"))).as("nneg"),
      sum(col("p") * (lit(2L) * col("cum") + col("c") + lit(1L))).as("u2r"),
      sum(when(col("s") >= threshold, col("p")).otherwise(lit(0L))).as("tp"),
      sum(when(col("s") >= threshold, col("c") - col("p")).otherwise(lit(0L))).as("fp"),
      sum(when(col("s") < threshold, col("c") - col("p")).otherwise(lit(0L))).as("tn"),
      sum(when(col("s") < threshold, col("p")).otherwise(lit(0L))).as("fn"))
      .selectExpr(
        "npos", "nneg",
        "(u2r - npos * (npos + 1)) * 1000000L div (2 * npos * nneg) AS auc_micro",
        "tp", "fp", "tn", "fn",
        "tp * 1000000L div (tp + fp) AS prec_micro",
        "tp * 1000000L div (tp + fn) AS rec_micro",
        "tp * 2000000L div (2 * tp + fp + fn) AS f1_micro")
  }

  /** Calibration table over integer scores: floor-divide scores into
    * fixed-width bins and report per-bin count, positives, and the
    * empirical positive rate in micro-units — the reliability-diagram
    * input. Same histogram shape as [[binaryMetrics]]: one corpus agg,
    * then per-bin integer arithmetic. The bin is a true floor division
    * (pmod-adjusted) so negative scores bin consistently across
    * engines' truncating `div`/`%`.
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val s = col(scoreCol).cast("long")
    val bin = (s - pmod(s, lit(binWidth))).cast("long")
    df.groupBy(bin.as("b"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("pos"))
      .selectExpr(s"b div ${binWidth}L AS bin", "n", "pos",
        "pos * 1000000L div n AS rate_micro")
  }

  /** Fixed pseudo-random integer weight for feature index `i` (0-based):
    * ((i·37) mod 15) − 7 ∈ [−7, 7]. A deterministic stand-in scorer so
    * the eval harness has an engine-independent integer score to grade;
    * replayed verbatim in the oracle SQL.
    */
  def fixedWeight(i: Column): Column = (i * lit(37L)) % lit(15L) - lit(7L)

  /** Integer linear score of an int-code vector under [[fixedWeight]]:
    * Σ_i codes[i] · w(i). Pure scan-side codegen (indexed zip_with +
    * aggregate), no shuffle.
    */
  def fixedLinearScore(codes: Column): Column =
    aggregate(
      zip_with(codes, sequence(lit(0L), size(codes).cast("long") - 1L),
        (x, i) => x * fixedWeight(i)),
      lit(0L), (acc, x) => acc + x)
}
