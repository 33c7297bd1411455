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

  test("the (cum, rmax) fold equals the classic negative-side max(0, S - dev) recursion") {
    val xs = series(17, 500, 300, -800L) // downward shift
    // threshold above the +-500-step noise walk's reach over 500 rows,
    // well below the 800/row planted drift
    val (target, threshold) = (500L, 20000L)
    var sClassic = 0L
    var st = CusumProcessor.Zero
    var classicAlarm = -1L
    xs.zipWithIndex.foreach { case ((ts, v), i) =>
      sClassic = math.max(0L, sClassic - (v - target))
      if (classicAlarm < 0 && sClassic > threshold) classicAlarm = i + 1L
      st = CusumProcessor.step(st, ts, v, target, threshold)
      assert(st.rmax - st.cum == sClassic, s"negative score diverged at row $i")
    }
    assert(st.alarmNIdx == classicAlarm)
    assert(st.alarmIdx == -1L, "a pure downward shift must not fire the upward side")
  }

  test("adaptive baseline: reference window estimates the target, resume-safe") {
    val xs = series(19, 500, 300, -900L)
    val refW = 100L
    def foldAll(init: CusumState, rows: Seq[(Long, Long)]): CusumState =
      rows.foldLeft(init) { case (s, (ts, v)) =>
        CusumProcessor.step(s, ts, v, 0L, 8000L, refW)
      }
    val oneShot = foldAll(CusumProcessor.Zero, xs)
    // the self-estimated target equals floorDiv of the first-100 sum
    val tgt = Math.floorDiv(xs.take(100).map(_._2).sum, 100L)
    val manual = xs.drop(100).foldLeft(CusumProcessor.Zero) {
      case (s, (ts, v)) => CusumProcessor.step(s, ts, v, tgt, 8000L)
    }
    assert(oneShot.maxSn == manual.maxSn && oneShot.maxS == manual.maxS)
    assert(oneShot.n == 500L && manual.n == 400L)
    // resume safety with the ref window split across batch boundaries
    Seq(Seq(50), Seq(99, 101), Seq(100), Seq(37, 99, 303)).foreach { cutsList =>
      val cuts = (0 +: cutsList :+ xs.length).distinct.sorted
      val resumed = cuts.sliding(2).foldLeft(CusumProcessor.Zero) {
        case (s, Seq(a, b)) => foldAll(s, xs.slice(a, b))
        case (s, _) => s
      }
      assert(resumed == oneShot, s"diverged for cuts $cutsList")
    }
  }
}
