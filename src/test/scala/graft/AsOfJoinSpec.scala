package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("asOf picks the latest right row at-or-before each left time") {
    val left = Seq((1, 10L, "l10"), (1, 20L, "l20"), (2, 5L, "l5"))
      .toDF("k", "t", "payload")
    val right = Seq((1, 8L, "r8"), (1, 15L, "r15"), (1, 25L, "r25"), (2, 9L, "r9"))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", "t", Seq("v"))
      .select("payload", "asof_v").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("l10" -> "r8", "l20" -> "r15", "l5" -> null))
  }

  test("ties match: right row at the same instant is visible") {
    val left = Seq((1, 10L, "l")).toDF("k", "t", "payload")
    val right = Seq((1, 10L, "same")).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", "t", Seq("v")).collect()(0)
    assert(out.getAs[String]("asof_v") == "same")
  }

  test("asOf matches the latest right ROW even when its value is null (no stale carry)") {
    val left = Seq((1, 3L, "l")).toDF("k", "t", "payload")
    val right = Seq((1, 1L, Option("old")), (1, 2L, Option.empty[String]))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", "t", Seq("v")).collect()(0)
    // DuckDB ASOF contract: the t=2 row matches; its v is null — the
    // older t=1 row's "old" must not leak through
    assert(out.getAs[String]("asof_v") == null)
  }

  test("asOf plan has exactly one shuffle and no join node") {
    val left = Seq((1, 10L, "l")).toDF("k", "t", "payload")
    val right = Seq((1, 8L, "r")).toDF("k", "t", "v")
    val plan = AsOfJoin.asOf(left, right, "k", "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Join"), plan)
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }

  test("asOfNative: custom exec result equals the union+window lowering on dense random data") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 2000).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = (1 to 1500).map(i =>
      (rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "rid")
    // right times can tie per key; pick a deterministic as-of row by
    // making (k, t) unique on the right
    val r = right.groupBy("k", "t").agg(max("rid").as("rid"))
    val viaWindow = AsOfJoin.asOf(left, r, "k", "t", "t", Seq("rid"))
      .select("lid", "asof_rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    val native = AsOfJoin.asOfNative(left, r, "k", "t", "t", Seq("rid"))
      .select("lid", "asof_rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(native == viaWindow)
  }

  test("asOfNative: ties match, nulls stay unmatched, repartitioning changes nothing") {
    val left = Seq((1L, 10L, "tie"), (1L, 3L, "before"), (2L, 5L, "nomatch"))
      .toDF("k", "t", "payload")
    val right = Seq((1L, 10L, "r10"), (1L, 4L, "r4"), (3L, 1L, "other"))
      .toDF("k", "t", "v")
    def run(l: org.apache.spark.sql.DataFrame) =
      AsOfJoin.asOfNative(l, right, "k", "t", "t", Seq("v"))
        .select("payload", "asof_v").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    val got = run(left)
    assert(got == Map("tie" -> "r10", "before" -> null, "nomatch" -> null))
    assert(run(left.repartition(13)) == got)
  }

  test("asOfNative plans as AsOfJoinExec: no window, no generic join, merge-pass exec present") {
    val left = Seq((1L, 10L, "l")).toDF("k", "t", "payload")
    val right = Seq((1L, 8L, "r")).toDF("k", "t", "v")
    val plan = AsOfJoin.asOfNative(left, right, "k", "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("AsOfJoin"), plan) // SparkPlan.nodeName strips the Exec suffix
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
  }

  test("asOfNative self-as-of over one DataFrame resolves (fresh right-side exprIds)") {
    val ev = Seq((1L, 1L, 100L), (1L, 5L, 200L), (1L, 9L, 300L))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asOfNative(ev, ev.filter($"t" % 2 === 1), "k", "t", "t", Seq("v"))
      .select("t", "asof_v").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 100L, 5L -> 200L, 9L -> 300L))
  }

  test("asOfNative on bucketed tables plans ZERO exchanges; the union lowering always shuffles") {
    val rnd = new scala.util.Random(3)
    val left = (1 to 500).map(i => (rnd.nextInt(40).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "t", "lid")
    // unique (k, t) on the right so the as-of row is deterministic
    val right = (1 to 400).map(i => (rnd.nextInt(40).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "t", "rid").groupBy("k", "t").agg(max("rid").as("rid"))
    graft.ops.Bucketing.writeBucketed(left, "__asof_l", "k", 4)
    graft.ops.Bucketing.writeBucketed(right, "__asof_r", "k", 4)
    try {
      val bl = spark.table("__asof_l")
      val br = spark.table("__asof_r")
      val nativePlan = AsOfJoin.asOfNative(bl, br, "k", "t", "t", Seq("rid"))
        .queryExecution.executedPlan.toString()
      // bucketing gives both sides hashpartitioning(k) at the scan —
      // the exec's ClusteredDistribution is already satisfied
      assert(!nativePlan.contains("Exchange"), nativePlan)
      val windowPlan = AsOfJoin.asOf(bl, br, "k", "t", "t", Seq("rid"))
        .queryExecution.executedPlan.toString()
      // the union of two bucketed scans has no usable partitioning: the
      // window must shuffle no matter how the inputs are laid out
      assert(windowPlan.contains("Exchange"), windowPlan)
      // and the answers agree
      val a = AsOfJoin.asOfNative(bl, br, "k", "t", "t", Seq("rid"))
        .select("lid", "asof_rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val b = AsOfJoin.asOf(bl, br, "k", "t", "t", Seq("rid"))
        .select("lid", "asof_rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(a == b)
    } finally {
      spark.sql("DROP TABLE IF EXISTS __asof_l")
      spark.sql("DROP TABLE IF EXISTS __asof_r")
    }
  }

  test("rangePairs bounds matches per key and window") {
    val ev = Seq((1, 0L, 100L), (1, 1L, 130L), (1, 2L, 200L), (2, 3L, 105L))
      .toDF("k", "id", "t")
    val pairs = AsOfJoin.rangePairs(ev, ev.withColumnRenamed("id", "id2"),
      "k", "t", "t", lit(50L))
      .select(col("l.id"), col("r.id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L))) // 130 in (100,150]; 200 outside; k=2 alone
  }
}
