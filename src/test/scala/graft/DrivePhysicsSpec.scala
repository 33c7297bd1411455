package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.synth.DrivePhysics
import graft.synth.DrivePhysics.{Engine, Geo, Mph}

/** Physics-model oracles for the commuter engine (reference behavior:
  * drive/Engine.java, drive/Car.java): steady-state convergence, gearbox
  * progression, braking, and end-to-end trip invariants.
  */
class DrivePhysicsSpec extends AnyFunSuite {

  test("engine accelerates from rest to a highway target and holds it") {
    val e = new Engine
    e.stepToTime(120, 65 * Mph, 0.1) // two minutes at 65 MPH target
    assert(math.abs(e.speed - 65 * Mph) < 2 * Mph,
      s"speed ${e.speed / Mph} MPH should settle near 65")
    assert(e.gear >= 4, s"gear ${e.gear} should be high at highway speed")
    assert(e.rpm > 200 && e.rpm < 3500, s"rpm ${e.rpm} out of band")
    assert(e.throttle > 0 && e.throttle <= 100)
    // distance consistent with accelerating to ~29 m/s over 120 s
    assert(e.distance > 2000 && e.distance < 29.5 * 120)
  }

  test("gearbox upshifts through the gears as speed rises") {
    val e = new Engine
    var lastGear = 0
    var regressions = 0
    for (t <- 1 to 60) {
      e.stepToTime(t.toDouble, 70 * Mph, 0.1)
      if (e.gear < lastGear) regressions += 1
      lastGear = math.max(lastGear, e.gear)
    }
    assert(lastGear >= 4, s"never got past gear $lastGear")
    assert(regressions <= 2, s"$regressions downshifts during a pure acceleration")
  }

  test("brakes bring the car down to a low target") {
    val e = new Engine
    e.stepToTime(120, 65 * Mph, 0.1)
    e.stepToTime(200, 5 * Mph, 0.1) // 80 s to slow down
    assert(e.speed < 8 * Mph, s"still going ${e.speed / Mph} MPH after braking")
  }

  test("trip simulation reaches the destination with 1 Hz samples") {
    val rng = new java.util.Random(42)
    val home = Geo.fromDegrees(40.75, -73.99)
    val work = home.nearby(8, rng)
    val engine = new Engine
    val samples = Vector.newBuilder[(Double, Double, Double, Double, Double)]
    engine.time = 0
    DrivePhysics.driveTo(rng, 0, home, work, (t, e, pos) =>
      samples += ((t, e.speed / Mph, e.rpm, e.throttle, pos.distanceKm(work))), engine)
    val pts = samples.result()
    assert(pts.nonEmpty)
    // 1 Hz emission
    pts.sliding(2).foreach { case Seq(a, b) =>
      assert(math.abs((b._1 - a._1) - 1.0) < 1e-9); case _ => }
    // physical bands: urban/highway speeds, gearbox rpm, throttle range
    pts.foreach { case (_, mph, rpm, throttle, _) =>
      assert(mph >= 0 && mph < 85, s"mph $mph out of band")
      assert(rpm >= 0 && rpm < 3600, s"rpm $rpm out of band")
      assert(throttle >= 0 && throttle <= 100, s"throttle $throttle out of band")
    }
    // the plan actually converges on the destination
    assert(pts.last._5 < 0.5, s"ended ${pts.last._5} km from the destination")
    // speeds actually vary (urban vs highway legs, not a constant profile)
    val mphs = pts.map(_._2)
    assert(mphs.max - mphs.min > 10, "speed profile is flat — no urban/highway mix")
  }

  test("plan mixes local and highway legs by distance (log-odds curve)") {
    val rng = new java.util.Random(7)
    val home = Geo.fromDegrees(40.75, -73.99)
    def highwayFrac(km: Double): Double = {
      val trials = 200
      var hw = 0
      for (_ <- 1 to trials) {
        val dest = home.project(km / DrivePhysics.EarthRadiusKm, 0)
        if (DrivePhysics.plan(home, dest, rng)
          .exists(_.isInstanceOf[DrivePhysics.Highway])) hw += 1
      }
      hw.toDouble / trials
    }
    // 2 km trips stay urban; 40 km trips almost always pick up a highway
    assert(highwayFrac(2) < 0.3, "short trips should be local")
    assert(highwayFrac(40) > 0.9, "long trips should include a highway leg")
  }
}
