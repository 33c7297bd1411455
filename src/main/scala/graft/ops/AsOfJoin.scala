package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for each left row, the latest right row with
  * rightTime <= leftTime on the same key. Spark has no native ASOF
  * operator; the scalable lowering here is the union + last-non-null
  * window trick:
  *
  *   1. tag both sides and union (no join node at all);
  *   2. one shuffle on the key, sort by (time, side-tag);
  *   3. `last(right value, ignoreNulls) over (partition key order time)`
  *      carries the most recent right row forward onto each left row.
  *
  * Cost: ONE shuffle of left+right — strictly cheaper than any
  * join-based plan, immune to the time-skew blowup of a naive range
  * join, and exactly the pattern that survives 100 TB (the alternative
  * inequality join degenerates into per-key cross products).
  *
  * Ties (leftTime == rightTime) match, like DuckDB's `ASOF JOIN ... ON
  * l.t >= r.t` contract (the right side sorts before the left at equal
  * times).
  */
object AsOfJoin {

  /** Returns `left` columns + `asof_<c>` for each requested right value
    * column (null where no right row precedes). Inner semantics can be
    * had by filtering `asof_<c> IS NOT NULL`.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The right row travels as ONE struct: carrying each value column
    // with its own last(ignoreNulls) would resurrect a stale row's value
    // whenever the true as-of row holds NULL in that column (and could
    // mix columns from different right rows). A present right row always
    // has a non-null struct, so last(ignoreNulls) picks exactly the
    // latest right ROW, nulls and all — the ASOF contract.
    val rvStructType = struct(rightVals.map(c => right(c)): _*)
    val l = left.select(
      (col(key).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        lit(null).cast(right.select(rvStructType).schema.head.dataType).as("__rv") +:
        leftCols.map(c => col(c).as(s"__lv_$c"))): _*)
    val r = right.select(
      (col(key).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        struct(rightVals.map(col): _*).as("__rv") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__lv_$c"))): _*)
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__lv_$c").as(c)) ++
        rightVals.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** [[asOf]] through the native whole-operator path
    * ([[graft.plans.AsOfJoinNode]] → AsOfJoinStrategy →
    * [[graft.plans.AsOfJoinExec]]): same output contract (left columns
    * + `asof_<c>`, null where no right row precedes), same tie
    * semantics, but planned as a single merge pass over key-clustered,
    * (key, time)-sorted children instead of the union+window lowering —
    * Catalyst inserts only the exchanges/sorts actually needed and can
    * elide them entirely when a side is already bucketed/sorted, which
    * the union form never can. The strategy is registered by
    * GraftExtensions; this entry point also registers it defensively
    * through `spark.experimental.extraStrategies` so the node plans in
    * any session.
    */
  def asOfNative(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightVals: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    // aliases mint fresh exprIds, so the right side's outputs can never
    // collide with the left's even on a self-as-of over one DataFrame
    val rProj = right.select(col(key).as("__rk") +: col(rightTime).as("__rt") +:
      rightVals.map(c => col(c).as(s"asof_$c")): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rProj.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val node = graft.plans.AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, leftTime), attr(rPlan, "__rk"), attr(rPlan, "__rt"))
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark, node)
      .drop("__rk", "__rt")
  }

  /** Range pairs: rows of `right` whose time falls in
    * (leftTime, leftTime + window] on the same key — an equi-key bounded
    * range join (the equi-key keeps the fan-out per key, never a global
    * cross product).
    */
  def rangePairs(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, windowSize: Column): DataFrame =
    left.as("l").join(right.as("r"),
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTime") > col(s"l.$leftTime") &&
        col(s"r.$rightTime") <= col(s"l.$leftTime") + windowSize)
}
