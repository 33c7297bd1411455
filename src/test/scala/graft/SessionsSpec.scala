package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sessions

class SessionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("sessionize breaks on gaps strictly greater than the threshold") {
    // user 1: ts 0,10,20 | gap 31 | 51,52; user 2: single event
    val df = Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 20L, 3L), (1L, 51L, 4L),
      (1L, 52L, 5L), (2L, 7L, 6L)).toDF("k", "ts", "id")
    val got = Sessions.sessionize(df, "k", "ts", "id", gapUnits = 30L)
      .select("k", "id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 1L) -> 1L, (1L, 2L) -> 1L, (1L, 3L) -> 1L,
      (1L, 4L) -> 2L, (1L, 5L) -> 2L, (2L, 6L) -> 1L))
  }

  test("a gap exactly equal to the threshold does NOT break the session") {
    val df = Seq((1L, 0L, 1L), (1L, 30L, 2L), (1L, 61L, 3L)).toDF("k", "ts", "id")
    val got = Sessions.sessionize(df, "k", "ts", "id", gapUnits = 30L)
      .select("id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("sessionStats rolls up count and span per session") {
    val df = Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 100L, 3L)).toDF("k", "ts", "id")
    val got = Sessions.sessionStats(df, "k", "ts", "id", gapUnits = 30L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == Set((1L, 2L, 0L, 10L), (2L, 1L, 100L, 100L)))
  }

  test("scd2 opens a version per attribute run and closes it at the next") {
    val df = Seq((1L, "a", 0L, 1L), (1L, "a", 10L, 2L), (1L, "b", 20L, 3L),
      (1L, "a", 30L, 4L)).toDF("k", "attr", "ts", "id")
    val got = Sessions.scd2(df, "k", "attr", "ts", "id")
      .collect().map(r => (r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4))).toSet
    assert(got == Set(
      ("a", 0L, Some(20L), 0L),   // first run a: [0, 20)
      ("b", 20L, Some(30L), 0L),  // b: [20, 30)
      ("a", 30L, None, 1L)))      // back to a: current
  }

  test("scd2 treats null attributes as versions (null-safe change test)") {
    val df = Seq((1L, Option("x"), 0L, 1L), (1L, Option.empty[String], 10L, 2L),
      (1L, Option("x"), 20L, 3L)).toDF("k", "attr", "ts", "id")
    val got = Sessions.scd2(df, "k", "attr", "ts", "id").collect()
    assert(got.length == 3) // x, null, x — three versions
  }

  test("deterministic under ts ties via the tiebreak column") {
    val df = Seq((1L, "a", 5L, 2L), (1L, "b", 5L, 1L)).toDF("k", "attr", "ts", "id")
    val got = Sessions.scd2(df, "k", "attr", "ts", "id")
      .orderBy("valid_from").collect().map(_.getString(1)).toSeq
    assert(got == Seq("b", "a")) // id 1 (b) sorts first at equal ts
  }
}
