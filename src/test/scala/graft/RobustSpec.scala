package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Robust, TimeSeries}

/** Robust MAD outlier gate and OHLC downsampling. */
class RobustSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("mad outliers: hand-checked median/MAD, single spike flagged, mean-shift immune") {
    // values 1..9 plus a huge spike: median 5 (of 10 values: nearest-rank
    // ceil(10*0.5)=5th of sorted -> 5), MAD of deviations, spike flagged
    val vals = (1L to 9L) :+ 1000L
    val df = vals.zipWithIndex.map { case (v, i) => ("k", v, i.toLong) }
      .toDF("key", "v", "id")
    val r = Robust.madOutlierReport(df, "key", col("v"), col("id")).collect().head
    assert(r.getLong(1) == 10L)   // n
    assert(r.getLong(2) == 5L)    // med: sorted(1..9,1000), rank 5 -> 5
    // deviations |v-5|: 4,3,2,1,0,1,2,3,4,995 sorted 0,1,1,2,2,3,3,4,4,995
    // rank ceil(10*0.5)=5 -> 2
    assert(r.getLong(3) == 2L)    // mad
    // outliers: dev > 3*2=6 -> only the spike (dev 995)
    assert(r.getLong(4) == 1L)
    // a classical z-score would see stddev ~314 and flag nothing:
    // the robust gate is the point
  }

  test("mad outliers: zero-MAD degenerate key flags any deviation") {
    val df = (Seq.fill(9)(5L) :+ 6L).zipWithIndex
      .map { case (v, i) => ("k", v, i.toLong) }.toDF("key", "v", "id")
    val r = Robust.madOutlierReport(df, "key", col("v"), col("id")).collect().head
    assert(r.getLong(2) == 5L && r.getLong(3) == 0L && r.getLong(4) == 1L)
  }

  test("label propagation: disconnected cliques converge to their min ids, invariant") {
    import graft.ops.Graph
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val got = Graph.labelPropagation(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    val again = Graph.labelPropagation(edges.repartition(7), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("count-min: estimates >= truth (exact at wide widths), slot-wise merge, invariant") {
    import graft.ops.Sketches
    val freqs = (0L until 20L).map(k => k -> (k + 1)) // key k appears k+1 times
    val rows = freqs.flatMap { case (k, n) => Seq.fill(n.toInt)(k) }
    val df = rows.toDF("u")
    val wide = Sketches.cmSketchRows(df, col("u"), width = 4096, depth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    freqs.foreach { case (k, n) =>
      val est = Sketches.cmEstimate(wide, k, 4096, 2)
      assert(est >= n, s"CM under-counted key $k: $est < $n")
      assert(est == n, s"collision at width 4096 for key $k: $est != $n")
    }
    // narrow width still never under-counts
    val narrow = Sketches.cmSketchRows(df, col("u"), width = 8, depth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    freqs.foreach { case (k, n) =>
      assert(Sketches.cmEstimate(narrow, k, 8, 2) >= n)
    }
    // merge = slot-wise addition; invariant under partitioning
    val (a, b) = (rows.take(100), rows.drop(100))
    val sa = Sketches.cmSketchRows(a.toDF("u"), col("u"), 8, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sb = Sketches.cmSketchRows(b.toDF("u"), col("u"), 8, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = (sa.keySet ++ sb.keySet).map(s =>
      s -> (sa.getOrElse(s, 0L) + sb.getOrElse(s, 0L))).toMap
    assert(merged == narrow)
    val re = Sketches.cmSketchRows(df.repartition(13), col("u"), 8, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == narrow)
  }

  test("fellegi-sunter: weights sum per field, thresholds split decisions") {
    import graft.ops.EntityResolution.{FieldRule, score}
    val pairs = Seq(
      (1L, 1L, "alice", "alice", "NY", "NY"),   // all agree
      (2L, 3L, "alice", "alicia", "NY", "CA"),  // name fuzzy-disagree at <=1? lev=2 -> disagree; state disagree
      (4L, 5L, "bob", "rob", "TX", "TX"),       // lev(bob,rob)=1 agree, state agree
    ).toDF("a", "b", "an", "bn", "as", "bs")
    val out = score(pairs, Seq(
      FieldRule("name", levenshtein(col("an"), col("bn")) <= 1, 2000L, -1000L),
      FieldRule("state", col("as") === col("bs"), 1000L, -500L)),
      upperMilli = 3000L, lowerMilli = 0L)
      .orderBy("a").collect()
    assert(out(0).getAs[Long]("score") == 3000L &&
      out(0).getAs[String]("decision") == "match")
    assert(out(1).getAs[Long]("score") == -1500L &&
      out(1).getAs[String]("decision") == "non_match")
    assert(out(2).getAs[Long]("score") == 3000L &&
      out(2).getAs[String]("decision") == "match")
  }

  test("table profile: null and distinct counts, string byte budget, one-pass") {
    import graft.ops.Stats
    val df = Seq(
      (Some(1L), Some("aa")), (Some(1L), None), (None, Some("bbb")),
    ).toDF("num", "str")
    val got = Stats.tableProfile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(got("num") == ((3L, 1L, 1L, -1L)))   // 3 rows, 1 null, 1 distinct, no len
    assert(got("str") == ((3L, 1L, 2L, 5L)))    // "aa"+"bbb" = 5 chars
  }

  test("winsorize clips tails into the band; imputeMedian fills nulls with the survivor median") {
    import graft.ops.Robust
    // values 1..20: p5 band lo = rank ceil(20*0.05)=1 -> 1? use a spikier set
    val vals = Seq(-1000L) ++ (1L to 18L) ++ Seq(1000L)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", v, i.toLong) }
      .toDF("key", "v", "id")
    val w = Robust.winsorize(df, "key", col("v"), col("id"), 10, 90)
      .collect().map(r => (r.getAs[Long]("clipped"),
        r.getAs[Int]("clipped_lo"), r.getAs[Int]("clipped_hi")))
    // band: rank ceil(20*0.1)=2 -> value 1; rank ceil(20*0.9)=18 -> 17
    assert(w.forall { case (c, _, _) => c >= 1L && c <= 17L })
    assert(w.count(_._2 == 1) == 1 && w.count(_._3 == 1) == 2) // -1000 low; 18 and 1000 high
    val imp = Robust.imputeMedian(
      Seq(("k", Some(10L), 1L), ("k", None, 2L), ("k", Some(20L), 3L),
        ("k", Some(30L), 4L)).toDF("key", "v", "id"),
      "key", col("v"), col("id"))
      .collect().map(r => r.getAs[Long]("id") -> (r.getAs[Long]("imputed"),
        r.getAs[Int]("was_null"))).toMap
    // survivor median of (10,20,30): rank ceil(3*0.5)=2 -> 20
    assert(imp(2L) == ((20L, 1)) && imp(1L) == ((10L, 0)))
    // a key whose values are ALL null must survive (imputed stays null,
    // was_null=1) — the median table has no row for it, and an inner
    // join would silently drop the whole key
    val allNull = Robust.imputeMedian(
      Seq(("k", Some(10L), 1L), ("dead", Option.empty[Long], 2L),
        ("dead", Option.empty[Long], 3L)).toDF("key", "v", "id"),
      "key", col("v"), col("id")).collect()
    assert(allNull.length == 3)
    val dead = allNull.filter(_.getAs[String]("key") == "dead")
    assert(dead.length == 2 &&
      dead.forall(r => r.isNullAt(r.fieldIndex("imputed")) &&
        r.getAs[Int]("was_null") == 1))
  }

  test("cm join-size estimator: exact without collisions, never under-estimates") {
    import graft.ops.Sketches
    val a = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("u")        // counts 2,1,3
    val b = Seq(1L, 2L, 2L, 4L).toDF("u")                // counts 1,2,1
    val exact = 2L * 1 + 1L * 2                           // keys 1 and 2 join
    def est(width: Int): Long = Sketches.cmJoinSizeByRow(
      Sketches.cmSketchRows(a, col("u"), width, 2),
      Sketches.cmSketchRows(b, col("u"), width, 2), width)
      .collect().map(_.getLong(1)).min
    assert(est(4096) == exact)   // wide: no collisions -> inner product IS the join size
    assert(est(4) >= exact)      // narrow: collisions only ever ADD
  }

  test("ohlc: open/close follow event time with tie-break, extremes exact") {
    val df = Seq(
      ("a", 1L, 10L, 100L), // open (earliest ts)
      ("a", 5L, 11L, 50L),  // low
      ("a", 5L, 12L, 900L), // high; ties on ts -> id 12 later than 11
      ("a", 9L, 13L, 200L), // close (latest ts)
      ("b", 2L, 20L, 7L),
    ).toDF("key", "ts", "id", "v")
    val out = TimeSeries.ohlc(df, Seq("key"), col("ts"), col("v"), col("id"))
      .orderBy("key").collect()
    assert(out(0).toSeq == Seq("a", 4L, 100L, 900L, 50L, 200L))
    assert(out(1).toSeq == Seq("b", 1L, 7L, 7L, 7L, 7L))
    // tie on the closing timestamp: highest id wins
    val tied = TimeSeries.ohlc(
      Seq(("k", 5L, 1L, 111L), ("k", 5L, 2L, 222L)).toDF("key", "ts", "id", "v"),
      Seq("key"), col("ts"), col("v"), col("id")).collect().head
    assert(tied.getLong(2) == 111L && tied.getLong(5) == 222L) // open id1, close id2
  }
}
