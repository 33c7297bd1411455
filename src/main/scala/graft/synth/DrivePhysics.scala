package graft.synth

/** The commuter-driving physics model (reference: drive/Engine.java,
  * drive/Car.java, drive/GeoPoint.java, drive/Constants.java) — an
  * automatic-transmission engine simulation driven over planned
  * urban/highway segments on the unit sphere. This is the per-entity
  * compute kernel of the `commuter` sampler: each simulated commuter is
  * independent, so Spark parallelism is per-row and the kernel ships as
  * plain serializable math.
  *
  * Model summary (same observable behavior as the reference; original
  * code):
  *
  *   - 7-gear transmission with fixed speed-per-RPM ratios, upshifting
  *     above 2000 RPM and downshifting below 1000 with a 0.1 s power cut
  *     (Engine.java:54-63, 139-151);
  *   - throttle follows a proportional controller on the speed error with
  *     an acceleration backoff, low-pass filtered with a 0.8 s turbo lag
  *     (Engine.java:121-127);
  *   - engine force = torque linear in RPM (zero at 3500) scaled by the
  *     power setting; aerodynamic drag is quadratic with the coefficient
  *     implied by a 150 MPH top speed; brakes integrate up to a g-limit
  *     when the throttle is closed (Engine.java:153-176);
  *   - trips are planned as grid-biased "local" steps (|N(2,1)| km,
  *     east/west or north/south toward the goal) and "highway" legs whose
  *     probability follows log-odds = -6 + 2·ln(distance_km)
  *     (Car.java:126-215);
  *   - each leg is driven with a jittering target speed (5%/s chance of a
  *     ±10..+10 MPH change), a 0.1 g approach-speed cap so the car can
  *     brake to the segment's exit speed, and 1 Hz emission
  *     (Car.java:84-115).
  */
object DrivePhysics {

  val G = 9.80665 // m/s^2
  val EarthRadiusKm = 6371.39
  val Mph = 0.44704 // one MPH in m/s
  val GeoFuzzKm = 0.005 // points closer than this are "arrived"

  // ----------------------------------------------------------- geometry

  final case class Vec3(x: Double, y: Double, z: Double) {
    def +(o: Vec3): Vec3 = Vec3(x + o.x, y + o.y, z + o.z)
    def -(o: Vec3): Vec3 = Vec3(x - o.x, y - o.y, z - o.z)
    def *(s: Double): Vec3 = Vec3(x * s, y * s, z * s)
    def dot(o: Vec3): Double = x * o.x + y * o.y + z * o.z
    def cross(o: Vec3): Vec3 =
      Vec3(y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x)
    def norm: Double = math.sqrt(this.dot(this))
    def normalize: Vec3 = { val n = norm; Vec3(x / n, y / n, z / n) }
  }

  /** A point on the unit sphere (GeoPoint.java). Distances in km. */
  final class Geo(var r: Vec3) {
    def latDeg: Double = math.toDegrees(math.asin(r.z))
    def lonDeg: Double = math.toDegrees(math.atan2(r.y, r.x))
    def distanceKm(o: Geo): Double =
      EarthRadiusKm * 2 * math.asin((r - o.r).norm / 2)
    def east: Vec3 = {
      val ux = r.cross(Vec3(0, 0, 1))
      (if (ux.norm < 1e-4) r.cross(Vec3(1, 0, 0)) else ux).normalize
    }
    def north(eastV: Vec3): Vec3 = r.cross(eastV).normalize
    /** Offset by (u, v) radians along (east, north). */
    def project(u: Double, v: Double): Geo = {
      val e = east
      new Geo((r + e * u + north(e) * v).normalize)
    }
    /** Gaussian scatter with per-axis sd `km` (GeoPoint.java:62-67). */
    def nearby(km: Double, rng: java.util.Random): Geo = {
      val d = km / EarthRadiusKm
      project(d * rng.nextGaussian(), d * rng.nextGaussian())
    }
    def copy(): Geo = new Geo(r)
  }

  object Geo {
    def fromDegrees(latDeg: Double, lonDeg: Double): Geo = {
      val lat = math.toRadians(latDeg)
      val lon = math.toRadians(lonDeg)
      val c = math.cos(lat)
      new Geo(Vec3(math.cos(lon) * c, math.sin(lon) * c, math.sin(lat)))
    }
  }

  // ------------------------------------------------------------- engine

  /** Speed (m/s) per RPM for each gear: 10 MPH per 2000 RPM in first up
    * to 50 MPH per 1000 RPM in seventh (Engine.java:54-56).
    */
  private val MpsByRpm: Array[Double] = Array(
    4.4704 / 2000, 8.9408 / 2000, 13.4112 / 2000, 13.4112 / 1500,
    17.8816 / 1500, 22.3520 / 1500, 22.3520 / 1000)
  private val TopGear = MpsByRpm.length - 1

  final class Engine extends Serializable {
    private val ThrottleGain = 50.0
    private val MaxThrottle = 100.0
    private val AccelBackoff = 30.0
    private val ZeroTorqueRpm = 3500.0
    private val LowShift = 1000.0
    private val HighShift = 2000.0
    private val ThrottleLagS = 0.8
    private val MassKg = 2000.0
    private val MaxPowerW = 150e3
    private val TorqueAtZero = 4 * MaxPowerW / ZeroTorqueRpm
    private val DragCoeff = 0.4875334 // so drag == max power at ~150 MPH
    private val ShiftTimeS = 0.1
    private val BrakingGain = 1.0
    private val dt = 0.01

    var time = 0.0
    var throttle = 0.0
    var rpm = 0.0
    var gear = 0
    var speed = 0.0 // m/s
    var distance = 0.0 // m
    private var brakeForce = 0.0
    private var shiftTimeout = 0.0
    private var accel = 0.0

    /** Reset the dynamic state to parked (a trip starts from rest; the
      * reference carries the previous trip's exit speed into the next
      * trip's first sample — an artifact, not a modeled behavior).
      */
    def park(): Unit = {
      throttle = 0; rpm = 0; gear = 0; speed = 0
      brakeForce = 0; shiftTimeout = 0; accel = 0
    }

    /** Run the 100 Hz simulation until `sampleTime`, steering the
      * throttle toward `speedTarget` (m/s) with up to `maxBrakeG` of
      * braking (Engine.java:118-178).
      */
    def stepToTime(sampleTime: Double, speedTarget: Double, maxBrakeG: Double): Unit = {
      while (time < sampleTime) {
        val desired = math.max(0.0, math.min(MaxThrottle,
          ThrottleGain * (speedTarget - speed) - AccelBackoff * accel))
        throttle += (desired - throttle) / ThrottleLagS * dt

        // gearbox with slip (the +200 RPM keeps power nonzero at rest)
        rpm = speed / MpsByRpm(gear) + 200
        if (rpm > HighShift && gear < TopGear) {
          gear += 1; shiftTimeout = time + ShiftTimeS
        } else if (rpm < LowShift && gear > 0) {
          gear -= 1; shiftTimeout = time + ShiftTimeS
        }
        rpm = speed / MpsByRpm(gear) + 200

        // 5% engine braking below closed throttle; zero power mid-shift
        val powerSetting = if (shiftTimeout > time) 0.0 else throttle / 100.0 - 0.05
        val engineForce =
          TorqueAtZero / MpsByRpm(gear) * (1.0 - rpm / ZeroTorqueRpm) * powerSetting
        val dragForce = DragCoeff * speed * speed
        if (maxBrakeG > 0 && throttle < 2 && speedTarget < speed) {
          brakeForce = math.min(brakeForce +
            MassKg * BrakingGain * (speed - speedTarget) * dt, MassKg * maxBrakeG * G)
        } else brakeForce = 0.0

        accel = math.min(8, (engineForce - dragForce - brakeForce) / MassKg)
        val oldSpeed = speed
        speed = math.max(0, speed + accel * dt)
        distance += (oldSpeed + speed) * dt / 2
        time += dt
      }
    }
  }

  // ----------------------------------------------------------- segments

  sealed trait Segment {
    def end: Geo
    def travelSpeed: Double
    def maxSpeed: Double
    def exitSpeed: Double
  }

  /** Highway leg: fast, aimed near the destination (Car.java:196-215). */
  final case class Highway(end: Geo) extends Segment {
    val travelSpeed: Double = 65 * Mph
    val maxSpeed: Double = 75 * Mph
    val exitSpeed: Double = 30 * Mph
  }

  /** Urban leg: one |N(2,1)| km grid-biased step east/west or north/south
    * toward the destination, never overshooting it (Car.java:217-262).
    */
  final class Local(start: Geo, goal: Geo, rng: java.util.Random) extends Segment {
    val end: Geo = {
      val dr = goal.r - start.r
      val dist = dr.norm
      var step = math.abs((rng.nextGaussian() + 2) / EarthRadiusKm)
      val e = start.east
      val eastWest = dr.dot(e)
      val p = eastWest / dist
      if (rng.nextDouble() < math.abs(p * p)) {
        if (step > math.abs(eastWest)) step = math.abs(eastWest)
        new Geo((start.r + e * (step * math.signum(eastWest))).normalize)
      } else {
        val n = start.north(e)
        val northSouth = dr.dot(n)
        if (step > math.abs(northSouth)) step = math.abs(northSouth)
        new Geo((start.r + n * (step * math.signum(northSouth))).normalize)
      }
    }
    val travelSpeed: Double = 35 * Mph
    val maxSpeed: Double = 45 * Mph
    val exitSpeed: Double = 5 * Mph
  }

  /** Highway probability by distance: log-odds = -6 + 2 ln(km)
    * (Car.java:176-194) — ~1% at 2 km, ~44% at 10 km, ~98% at 50 km.
    */
  private def pickHighway(distanceKm: Double, rng: java.util.Random): Boolean = {
    val logOdds = -6 + 2 * math.log(distanceKm)
    val u = rng.nextDouble()
    math.log(u / (1 - u)) < logOdds
  }

  /** Plan a start→end trip: local steps while near the start (grid
    * driving out of the neighborhood), then highway or local legs by
    * distance until within GeoFuzz of the goal (Car.java:126-146).
    */
  def plan(start: Geo, end: Geo, rng: java.util.Random): List[Segment] = {
    var here = start
    val out = List.newBuilder[Segment]
    var distanceToGo = here.distanceKm(end)
    while (distanceToGo > GeoFuzzKm && here.distanceKm(start) < 3) {
      val step = new Local(here, end, rng)
      out += step
      here = step.end
      distanceToGo = here.distanceKm(end)
    }
    while (distanceToGo > GeoFuzzKm) {
      val step: Segment =
        if (pickHighway(distanceToGo, rng)) Highway(end.nearby(distanceToGo / 10, rng))
        else new Local(here, end, rng)
      out += step
      here = step.end
      distanceToGo = here.distanceKm(end)
    }
    out.result()
  }

  private val BrakingG = 0.1

  /** Approach-speed cap: fast enough to brake (at 0.1 g) down to
    * `exitSpeed` within `distanceM`, never below 5 m/s (Car.java:160-168).
    */
  private def approachCap(distanceM: Double, exitSpeed: Double): Double = {
    val margin = 0.5 * exitSpeed * exitSpeed / (BrakingG * G)
    math.max(5, math.sqrt(2 * (distanceM + margin - 0.020) * BrakingG * G))
  }

  /** Drive one segment at 1 Hz, emitting (tSeconds, engine, position)
    * after each second, until the distance to the segment end stops
    * shrinking (Car.java:84-115). Returns the updated clock.
    */
  def simulate(t0: Double, pos: Geo, rng: java.util.Random, seg: Segment,
      emit: (Double, Engine, Geo) => Unit, engine: Engine): Double = {
    var t = t0
    var targetSpeed = seg.travelSpeed
    var currentSpeed = 0.0
    val dt = 1.0
    val dv = 0.1 * G * dt
    val start = pos.r
    var distanceToGo = pos.distanceKm(seg.end)
    engine.distance = 0
    val dir = (seg.end.r - pos.r).normalize
    var previous = distanceToGo
    while (distanceToGo <= previous) {
      if (rng.nextDouble() < 0.05) {
        targetSpeed = math.max(20 * Mph,
          targetSpeed + (rng.nextInt(5) - 2) * 5 * Mph)
      }
      targetSpeed = math.min(seg.maxSpeed, targetSpeed)
      currentSpeed = if (currentSpeed < targetSpeed) currentSpeed + dv else currentSpeed - dv
      currentSpeed = math.min(currentSpeed, approachCap(distanceToGo * 1000, seg.exitSpeed))
      engine.stepToTime(t, currentSpeed, BrakingG)
      t += dt
      pos.r = (start + dir * (engine.distance / 1000 / EarthRadiusKm)).normalize
      emit(t, engine, pos)
      previous = distanceToGo
      distanceToGo = pos.distanceKm(seg.end)
    }
    t
  }

  /** Drive start→end through a fresh plan (Car.java:148-156). */
  def driveTo(rng: java.util.Random, t0: Double, start: Geo, end: Geo,
      emit: (Double, Engine, Geo) => Unit, engine: Engine): Double = {
    val pos = start.copy()
    var t = t0
    plan(start, end, rng).foreach { seg =>
      t = simulate(t, pos, rng, seg, emit, engine)
    }
    t
  }
}
