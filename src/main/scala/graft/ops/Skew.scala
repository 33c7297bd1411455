package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives (SURVEY's "salting for skew" scale rule).
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the cases AQE doesn't: skewed AGGREGATIONS and skewed
  * broadcast-side fan-outs.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum-like (associative) aggs on
    * a skewed key. Phase 1 aggregates on (key, salt) — the hot key's
    * rows spread over `salts` reducers; phase 2 folds the partials.
    * Result is identical to a direct groupBy (associativity), the hot
    * partition is `salts`× smaller.
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
      aggs: (String, Column)*): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() +
      monotonically_increasing_id(), lit(salts.toLong)))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, c) => c.as(s"__p_$n") }: _*)
    phase1.groupBy(col(key))
      .agg(sum(s"__p_${aggs.head._1}").as(aggs.head._1),
        aggs.tail.map { case (n, _) => sum(s"__p_$n").as(n) }: _*)
  }

  /** Salted broadcast-side replication for a skewed equi-join: the big
    * (skewed) side gets a random salt in [0, salts); the small side is
    * replicated `salts` times (explode) so every salted key still
    * matches. Join key becomes (key, salt) — the hot key's rows land on
    * `salts` tasks instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
