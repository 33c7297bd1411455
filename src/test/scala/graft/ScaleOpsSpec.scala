package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Bucketing, Skew}

/** Scale-primitive tests: salted aggregation/join equivalence, and
  * shuffle-free joins over bucketed tables.
  */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("salted aggregation equals direct aggregation on a skewed key") {
    // 90% of rows share one key — the classic hot-key shape
    val df = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong else 7L, i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, "k", salts = 8,
      "cnt" -> count(lit(1)), "total" -> sum("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted join equals plain join and spreads the hot key") {
    val big = (1 to 5000).map(i => (if (i % 20 == 0) i.toLong % 5 else 1L, i.toLong))
      .toDF("k", "v")
    val small = (0L to 5L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("bucketed tables join with no Exchange on either side") {
    val a = (1 to 1000).map(i => (i.toLong, i * 2L)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 3L)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_a", "k", 4)
    Bucketing.writeBucketed(b, "bkt_b", "k", 4)
    // force the large-table path: tiny test tables would otherwise take a
    // broadcast join and the planner disables bucketing entirely
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cogroupJoin(spark, "bkt_a", "bkt_b", "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        plan) // scans satisfy the join's distribution: shuffle-free
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
