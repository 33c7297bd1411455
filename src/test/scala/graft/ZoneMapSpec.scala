package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.ZoneMap

class ZoneMapSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("clustered zones prune a range predicate; scattered zones do not") {
    // key 0..99; clustered layout = key div 10 (tight zones);
    // scattered layout = key % 10 (every zone spans ~the whole domain)
    val df = (0L until 100L).toDF("k")
    val got = ZoneMap.pruneReport(df,
      Seq("clustered" -> expr("k div 10"), "scattered" -> expr("k % 10")),
      col("k"), lo = 20L, hi = 39L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // clustered: buckets 2 and 3 overlap [20,39]; the other 8 prune (80 rows)
    assert(got("clustered") == ((10L, 8L, 80L, 100L)))
    // scattered: every bucket spans [b, 90+b] — none prunable
    assert(got("scattered") == ((10L, 0L, 0L, 100L)))
  }

  test("zoneStats reports exact per-bucket min/max/count") {
    val df = Seq(1L, 5L, 9L, 11L, 19L).toDF("k")
    val got = ZoneMap.zoneStats(df, expr("k div 10"), col("k"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(0L -> ((1L, 9L, 3L)), 1L -> ((11L, 19L, 2L))))
  }
}
