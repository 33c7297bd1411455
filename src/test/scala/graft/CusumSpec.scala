package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CusumProcessor, CusumState}

class CusumSpec extends AnyFunSuite {

  private def series(seed: Long, n: Int, shiftAt: Int, shift: Long): Seq[(Long, Long)] =
    (0 until n).map { i =>
      val v = Math.floorMod(graft.runtime.Rng.mix(seed + i), 1000L) +
        (if (i >= shiftAt) shift else 0L)
      (1000000000L * i, v) // (tsNs, vMicro)
    }

  private def fold(xs: Seq[(Long, Long)], target: Long, threshold: Long): CusumState =
    xs.foldLeft(CusumProcessor.Zero) { case (s, (ts, v)) =>
      CusumProcessor.step(s, ts, v, target, threshold)
    }

  test("the (cum, rmin) fold equals the classic max(0, S + dev) recursion") {
    val xs = series(7, 500, 300, 800L)
    val (target, threshold) = (500L, 5000L)
    var sClassic = 0L
    var st = CusumProcessor.Zero
    var classicAlarm = -1L
    xs.zipWithIndex.foreach { case ((ts, v), i) =>
      sClassic = math.max(0L, sClassic + (v - target))
      if (classicAlarm < 0 && sClassic > threshold) classicAlarm = i + 1L
      st = CusumProcessor.step(st, ts, v, target, threshold)
      assert(st.cum - st.rmin == sClassic, s"score diverged at row $i")
    }
    assert(st.alarmIdx == classicAlarm)
  }

  test("folding split at ANY batch boundary equals one-shot folding (resume safety)") {
    val xs = series(11, 400, 250, 900L)
    val (target, threshold) = (500L, 8000L)
    val oneShot = fold(xs, target, threshold)
    Seq(Seq(100), Seq(1), Seq(399), Seq(50, 250, 300), Seq(249, 251)).foreach { cutsList =>
      val cuts = (0 +: cutsList :+ xs.length).distinct.sorted
      val resumed = cuts.sliding(2).foldLeft(CusumProcessor.Zero) {
        case (s, Seq(a, b)) =>
          xs.slice(a, b).foldLeft(s) { case (st, (ts, v)) =>
            CusumProcessor.step(st, ts, v, target, threshold)
          }
        case (s, _) => s
      }
      assert(resumed == oneShot, s"diverged for cuts $cutsList")
    }
  }

  test("alarm records the FIRST crossing only; no alarm stays (-1, -1)") {
    val quiet = series(13, 200, 200, 0L) // no shift
    val mean = quiet.map(_._2).sum / quiet.length
    val st = fold(quiet, mean, 1000000L) // threshold far above noise
    assert(st.alarmIdx == -1L && st.alarmTs == -1L)
    val shifted = series(13, 200, 100, 2000L)
    val st2 = fold(shifted, mean, 10000L)
    assert(st2.alarmIdx > 100L && st2.alarmIdx <= 120L,
      s"alarm should fire shortly after the shift at 100: ${st2.alarmIdx}")
    assert(st2.alarmTs == (st2.alarmIdx - 1) * 1000000000L)
  }
}
