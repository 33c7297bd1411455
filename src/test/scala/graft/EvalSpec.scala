package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Eval

/** Eval-harness tests: AUC on hand-computed examples (perfect,
  * inverted, tie-heavy), threshold confusion counts, calibration bins
  * with negative scores, and the fixed-weight scorer's determinism.
  */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def metrics(rows: Seq[(Long, Long)]): Map[String, Long] = {
    val r = Eval.binaryMetrics(rows.toDF("s", "y"), "s", "y").collect().head
    r.schema.fieldNames.zip(r.toSeq.map(_.asInstanceOf[Long])).toMap
  }

  test("perfect separation gives AUC 1.0 and clean confusion") {
    val m = metrics(Seq((-2L, 0L), (-1L, 0L), (1L, 1L), (2L, 1L)))
    assert(m("auc_micro") == 1000000L)
    assert(m("tp") == 2L && m("tn") == 2L && m("fp") == 0L && m("fn") == 0L)
    assert(m("prec_micro") == 1000000L && m("rec_micro") == 1000000L
      && m("f1_micro") == 1000000L)
  }

  test("inverted scores give AUC 0") {
    val m = metrics(Seq((2L, 0L), (1L, 0L), (-1L, 1L), (-2L, 1L)))
    assert(m("auc_micro") == 0L)
  }

  test("all-ties gives AUC 0.5 (tie-averaged rank-sum)") {
    val m = metrics(Seq((5L, 0L), (5L, 1L), (5L, 0L), (5L, 1L)))
    assert(m("auc_micro") == 500000L)
  }

  test("mixed example matches hand computation") {
    // scores asc: -1(y0) 0(y1) 0(y0) 2(y1); npos=2 nneg=2
    // pairs: pos0 vs {-1: win, 0: tie} -> 1.5; pos2 vs both lower -> 2
    // AUC = 3.5/4 = 0.875
    val m = metrics(Seq((-1L, 0L), (0L, 1L), (0L, 0L), (2L, 1L)))
    assert(m("auc_micro") == 875000L)
    // threshold 0: tp=2 (scores 0,2), fp=1 (score 0), tn=1, fn=0
    assert(m("tp") == 2L && m("fp") == 1L && m("tn") == 1L && m("fn") == 0L)
    assert(m("prec_micro") == 666666L) // floor(2/3 * 1e6)
    assert(m("rec_micro") == 1000000L)
    assert(m("f1_micro") == 800000L)
  }

  test("calibration bins floor-divide negative scores consistently") {
    val df = Seq((-501L, 0L), (-500L, 1L), (-1L, 0L), (0L, 1L), (499L, 1L), (500L, 0L))
      .toDF("s", "y")
    val got = Eval.calibrationBins(df, "s", "y", 500L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      -2L -> ((1L, 0L, 0L)),        // -501
      -1L -> ((2L, 1L, 500000L)),   // -500, -1
      0L  -> ((2L, 2L, 1000000L)),  // 0, 499
      1L  -> ((1L, 0L, 0L))))       // 500
  }

  test("fixed linear score is deterministic and matches a Scala replay") {
    val codes = Seq(3L, -2L, 0L, 7L, 1L)
    val want = codes.zipWithIndex.map { case (x, i) => x * ((i * 37) % 15 - 7) }.sum
    val got = Seq(Tuple1(codes)).toDF("codes")
      .select(Eval.fixedLinearScore(col("codes")).as("s"))
      .collect().head.getLong(0)
    assert(got == want)
  }
}
