package graft.synth

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.runtime.{ChineseRestaurant, FancyTime, Markov, Multinomial, SeedData}

/** Simulation generators — the event-stream and scenario family
  * (§2.1.2's dns/bursts/cpoc and the commuter physics). Each sample()
  * call is one independent simulated entity, so rows parallelize
  * perfectly (no cross-row state beyond the partition RNG stream).
  */
object SimulationSamplers {

  private val dayMs = 24 * 3600 * 1000L

  /** Day/night bursty clock shared by `dns` and `bursts` (the state
    * machine of BurstyEvents.java:112-214 / DnsSampler.java:140-258):
    * sessions of rapid queries separated by idle gaps, with nighttime
    * time-dilation (fewer events at night).
    */
  private final class BurstyClock(rng: java.util.Random, startMs: Long,
      meanSessionGapMs: Double, meanInSessionMs: Double, meanSessionLen: Double) {
    private var now = startMs.toDouble
    private var left = 0

    private def nightFactor(t: Double): Double = {
      val hour = (t.toLong % dayMs).toDouble / 3600000.0
      if (hour < 6 || hour > 22) 4.0 else 1.0 // night stretches intervals
    }
    def next(): Long = {
      if (left <= 0) {
        left = 1 + (-meanSessionLen * math.log(rng.nextDouble())).toInt
        now += -math.log(rng.nextDouble()) * meanSessionGapMs * nightFactor(now)
      } else {
        now += -math.log(rng.nextDouble()) * meanInSessionMs
      }
      left -= 1
      now.toLong
    }
  }

  /** Mixed-family source address (distributions/IpAddressDistribution
    * .java:29-64): 30% IPv4 (4 random bytes) / 70% IPv6 (16 random
    * bytes, 10% of which zero bytes 2-7, emulating sparse prefixes).
    * Returns (text form, hex form, isV4) — the reference's `ip` / `ipx`
    * / `ipV4` triple. IPv6 text is uncompressed colon-hex with per-group
    * leading zeros stripped (InetAddress's own format).
    */
  private[synth] final class IpAddressDraw(v4Probability: Double) extends Serializable {
    def draw(rng: java.util.Random): (String, String, Boolean) =
      if (rng.nextDouble() < v4Probability) {
        val b = new Array[Byte](4)
        rng.nextBytes(b)
        val text = b.map(x => (x & 0xff).toString).mkString(".")
        (text, b.map(x => f"${x & 0xff}%02x").mkString, true)
      } else {
        val b = new Array[Byte](16)
        rng.nextBytes(b)
        if (rng.nextDouble() < 0.1) {
          var i = 2
          while (i < 8) { b(i) = 0; i += 1 }
        }
        val groups = (0 until 8).map(g =>
          (((b(2 * g) & 0xff) << 8) | (b(2 * g + 1) & 0xff)).toHexString)
        (groups.mkString(":"), b.map(x => f"${x & 0xff}%02x").mkString, false)
      }
  }

  /** `dns` (samplers/DnsSampler.java:334-390): one simulated user — a
    * mixed v4/v6 source address triple {ip, ipx, ipV4} plus a `queries`
    * array of {domain, revDomain, time, timestamp_ms, timestamp_s} from
    * the bursty day/night machine. `flat` mode is handled by the composer
    * (the array becomes a row generator with the address merged into each
    * element, DnsSampler.java:377-389).
    */
  final class DnsSampler(meanQueries: Double, flat: Boolean,
      fields: Option[Seq[String]], v4Probability: Double = 0.3) extends Sampler {
    private val allQ = Seq("domain", "revDomain", "time", "timestamp_ms", "timestamp_s")
    private val keptQ = fields.map(_.filter(allQ.contains)).getOrElse(allQ)
    private val allIp = Seq("ip", "ipx", "ipV4")
    private val keptIp = fields.map(_.filter(allIp.contains)).getOrElse(allIp)
    private val qType = StructType(keptQ.map {
      case f @ ("timestamp_ms" | "timestamp_s") => StructField(f, LongType)
      case f                                    => StructField(f, StringType)
    })
    private val ipFields = keptIp.map {
      case "ipV4" => StructField("ipV4", BooleanType)
      case f      => StructField(f, StringType)
    }
    val dataType: DataType =
      if (flat) ArrayType(StructType(ipFields ++ qType.fields.toSeq),
        containsNull = false)
      else StructType(ipFields :+
        StructField("queries", ArrayType(qType, containsNull = false)))
    private val ip = new IpAddressDraw(v4Probability)
    private val domains = new LookupSamplers.DomainDraw
    private val ft = FancyTime("yyyy-MM-dd HH:mm:ss")
    private val startMs = 1375315200000L

    def sample(ctx: GenContext): Any = {
      val clock = new BurstyClock(ctx.rng, startMs, 3600 * 1000.0, 2000.0, 8.0)
      val n = 1 + (-meanQueries * math.log(ctx.rng.nextDouble())).toInt
      val (text, hex, isV4) = ip.draw(ctx.rng)
      val ipVals: Seq[Any] = keptIp.map {
        case "ip"   => text
        case "ipx"  => hex
        case "ipV4" => isV4
      }
      val queries = (0 until n).map { _ =>
        val t = clock.next()
        val d = domains.draw(ctx)
        val vals = keptQ.map {
          case "domain"       => d
          case "revDomain"    => d.split('.').reverse.mkString(".")
          case "time"         => ft.formatMillis(t)
          case "timestamp_ms" => t
          case "timestamp_s"  => t / 1000
        }
        Row.fromSeq(vals)
      }
      if (flat) queries.map(q => Row.fromSeq(ipVals ++ q.toSeq))
      else Row.fromSeq(ipVals :+ queries)
    }
  }

  /** `bursts` (samplers/BurstyEvents.java:283-330): wraps any `value`
    * sub-sampler and stamps bursty event times onto each draw. The clock
    * persists across rows within a partition (reference: per-thread).
    */
  final class BurstsSampler(value: Sampler) extends Sampler {
    override def restart(): Unit = value.restart()
    val dataType: DataType = StructType(Seq(
      StructField("time", StringType), StructField("timestamp_s", LongType),
      StructField("timestamp_ms", LongType), StructField("value", value.dataType)))
    private val ft = FancyTime("yyyy-MM-dd HH:mm:ss")
    private var clock: BurstyClock = _
    def sample(ctx: GenContext): Any = {
      if (clock == null)
        clock = new BurstyClock(ctx.rng, 1375315200000L, 1800 * 1000.0, 5000.0, 5.0)
      val t = clock.next()
      Row(ft.formatMillis(t), t / 1000, t, value.sample(ctx))
    }
  }

  /** `common-point-of-compromise` (samplers/CommonPointOfCompromise
    * .java:144-184): per-user transaction trace; merchant 0 is
    * compromised during [exploitStart, exploitEnd) — users who shopped
    * there during the window show elevated fraud afterwards.
    */
  final class CpocSampler(meanTx: Double) extends Sampler {
    val dataType: DataType = ArrayType(StructType(Seq(
      StructField("timestamp_ms", LongType), StructField("date", StringType),
      StructField("merchant", LongType), StructField("fraud", IntegerType))),
      containsNull = false)
    private val ft = FancyTime("yyyy-MM-dd HH:mm:ss")
    private val startMs = 1375315200000L
    private val endMs = startMs + 120L * dayMs
    private val exploitStart = startMs + 30L * dayMs
    private val exploitEnd = startMs + 60L * dayMs
    private val crp = new ChineseRestaurant(20.0, 0.1)
    def sample(ctx: GenContext): Any = {
      val n = 1 + (-meanTx * math.log(ctx.rng.nextDouble())).toInt
      var compromised = false
      var t = startMs.toDouble
      val mean = (endMs - startMs).toDouble / (n + 1)
      val out = Vector.newBuilder[Row]
      var i = 0
      while (i < n && t < endMs) {
        t += -math.log(ctx.rng.nextDouble()) * mean
        val merchant = crp.sample(ctx.rng).toLong
        if (merchant == 0L && t >= exploitStart && t < exploitEnd) compromised = true
        val fraudP = if (compromised && t >= exploitEnd) 0.3 else 0.001
        val fraud = if (ctx.rng.nextDouble() < fraudP) 1 else 0
        out += Row(t.toLong, ft.formatMillis(t.toLong), merchant, fraud)
        i += 1
      }
      out.result()
    }
  }

  /** `commuter` (drive/Commuter.java:114-194 + the drive/Car.java +
    * drive/Engine.java physics, ported in [[DrivePhysics]]): home (zip) +
    * work (gaussian scatter at `workMeanKm`); commute times drawn from an
    * inhomogeneous Poisson process with weekday rush peaks (7-9 to work,
    * 16-18 home, Commuter.java:231-250); errands near home while waiting;
    * each trip planned as urban/highway segments and driven through the
    * gearbox/throttle/drag engine at 1 Hz, emitting {latitude, longitude,
    * t, timestamp, mph, rpm, throttle}.
    *
    * Divergences from the reference, all deliberate: rush hours are in
    * UTC (the engine pins the session timezone to UTC; the reference uses
    * US/Central); post-errand scheduling uses the day-appropriate errand
    * rate (the reference re-uses the weekend rate after any first errand,
    * Commuter.java:146 — a quirk, not a modeled behavior); and `mph` is
    * real miles-per-hour (speed / 0.44704) — the reference MULTIPLIES
    * m/s by the conversion constant (Commuter.java:264), a units bug
    * that would label a 65 MPH cruise "13 mph".
    */
  final class CommuterSampler(homeZipPrefix: Option[String], days: Int, flat: Boolean,
      workMeanKm: Double = 10.0) extends Sampler {
    import DrivePhysics.{Engine, Geo, Mph}
    private val pointType = StructType(Seq(
      StructField("latitude", DoubleType), StructField("longitude", DoubleType),
      StructField("t", LongType), StructField("timestamp", StringType),
      StructField("mph", DoubleType), StructField("rpm", DoubleType),
      StructField("throttle", DoubleType)))
    private val tripType = StructType(Seq(
      StructField("start_ms", LongType), StructField("type", StringType),
      StructField("distance_km", DoubleType), StructField("duration_s", DoubleType),
      StructField("points", ArrayType(pointType, containsNull = false))))
    val dataType: DataType =
      if (flat) ArrayType(pointType, containsNull = false)
      else StructType(Seq(
        StructField("home", StructType(Seq(
          StructField("zip", StringType), StructField("city", StringType),
          StructField("state", StringType), StructField("latitude", DoubleType),
          StructField("longitude", DoubleType)))),
        StructField("work", StructType(Seq(
          StructField("latitude", DoubleType), StructField("longitude", DoubleType)))),
        StructField("trips", ArrayType(tripType, containsNull = false))))
    private val zips = homeZipPrefix match {
      case Some(p) =>
        val f = SeedData.continentalZips.filter(_.zip.startsWith(p))
        if (f.nonEmpty) f else SeedData.continentalZips
      case None => SeedData.continentalZips
    }
    private val ft = FancyTime("yyyy-MM-dd HH:mm:ss")
    private val startS: Double = 1375315200.0 // 2013-08-01 00:00 UTC (a Thursday)
    private val ErrandSizeKm = 20.0
    private val daySecs = 24 * 3600.0

    private def isWeekend(t: Double): Boolean = {
      val dow = ((t / daySecs).toLong + 4) % 7 // epoch day 0 = Thursday
      dow == 0 || dow == 6
    }
    private def hourOfDay(t: Double): Int = ((t % daySecs) / 3600).toInt

    /** Commute hazard rate per second (Commuter.java:232-250). */
    private def commuteRate(toWork: Boolean, t: Double): Double = {
      val perDay =
        if (isWeekend(t)) 0.1
        else {
          val h = hourOfDay(t)
          val peak = if (toWork) h >= 7 && h < 9 else h >= 16 && h < 18
          if (peak) 10.0 else 2.0
        }
      perDay / daySecs
    }

    /** Next commute departure: integrate the piecewise-constant hazard
      * hour by hour until an Exp(1) budget is exhausted
      * (Commuter.java:215-230).
      */
    private def nextCommute(toWork: Boolean, t0: Double, rng: java.util.Random): Double = {
      var t = t0
      var budget = -math.log(1 - rng.nextDouble())
      while (true) {
        val nextHour = 3600.0 * ((t / 3600).toLong + 1)
        val step = commuteRate(toWork, t) * (nextHour - t)
        if (step > budget) return t + budget / step * (nextHour - t)
        budget -= step
        t = nextHour
      }
      t // unreachable
    }

    private def errandRate(t: Double): Double =
      (if (isWeekend(t)) 0.9 else 0.5) / daySecs

    def sample(ctx: GenContext): Any = {
      val rng = ctx.rng
      val home = zips(rng.nextInt(zips.length))
      val homeGeo = Geo.fromDegrees(home.latitude, home.longitude)
      val workGeo = homeGeo.nearby(workMeanKm, rng)
      val endS = startS + days * daySecs
      val engine = new Engine

      val trips = Vector.newBuilder[Row]
      def drive(t0: Double, from: Geo, to: Geo, kind: String): Double = {
        val points = Vector.newBuilder[Row]
        engine.time = t0
        engine.park() // trips start from rest, not the last trip's exit speed
        val tEnd = DrivePhysics.driveTo(rng, t0, from, to, (t, eng, pos) => {
          val ms = (t * 1000).toLong
          points += Row(pos.latDeg, pos.lonDeg, ms, ft.formatMillis(ms),
            eng.speed / Mph, eng.rpm, eng.throttle)
        }, engine)
        trips += Row((t0 * 1000).toLong, kind, from.distanceKm(to), tEnd - t0,
          points.result())
        tEnd
      }

      var t = startS
      var atHome = true
      while (t < endS) {
        val tCommute = nextCommute(atHome, t, rng)
        if (atHome) {
          // errands fill the wait before the next to-work departure
          var tErrand = t + -math.log(1 - rng.nextDouble()) / errandRate(t)
          var tooLong = false
          while (!tooLong && tErrand < tCommute && tErrand < endS) {
            val spot = homeGeo.nearby(ErrandSizeKm, rng)
            t = drive(tErrand, homeGeo, spot, "errand_out")
            t += rng.nextDouble() * 900 + 300 // dwell 5-20 min
            t = drive(t, spot, homeGeo, "errand_return")
            tErrand = t + -math.log(1 - rng.nextDouble()) / errandRate(t)
            tooLong = tErrand >= tCommute || tErrand >= endS
          }
          if (tCommute < endS) {
            // never depart before the errands finished: the reference
            // drives at the stale tCommute even when an errand overran
            // it, emitting time-overlapping trips — depart at max instead
            t = drive(math.max(tCommute, t), homeGeo, workGeo, "to_work")
            atHome = false
          } else t = endS
        } else {
          if (tCommute < endS) t = drive(math.max(tCommute, t), workGeo, homeGeo, "to_home")
          else t = endS
          atHome = true
        }
      }

      val tripRows = trips.result()
      if (flat) tripRows.flatMap(_.getAs[Seq[Row]](4))
      else Row(
        Row(home.zip, home.city, home.state, home.latitude, home.longitude),
        Row(workGeo.latDeg, workGeo.lonDeg),
        tripRows)
    }
  }

  /** Markov text draw (`text` with training corpus; TextGenerator /
    * TextMessage processors — MarkovChain.java:78-132).
    */
  final class MarkovTextSampler(nWords: Int) extends Sampler {
    val dataType: DataType = StringType
    private val markov = Markov.default
    def sample(ctx: GenContext): Any = markov.produce(ctx.rng, nWords)
  }

  /** Quote bags for the reference's faker-based `text` modes
    * (TextSampler.java:40-85: chucknorris facts, backtothefuture and
    * gameofthrones quotes). The faker corpora are licensed franchise
    * text, so these are ORIGINAL quote bags in the same register per
    * mode — tough-guy one-liner facts, time-travel lines, and
    * fantasy-court lines — sized like the faker bags (~20/mode) so
    * cardinality-sensitive consumers behave the same.
    */
  final class QuoteSampler(which: String) extends Sampler {
    val dataType: DataType = StringType
    private val bags: Map[String, Vector[String]] = Map(
      "chucknorris" -> Vector(
        "The champion counted to infinity. Twice before breakfast.",
        "When the champion enters a room, the room stands at attention.",
        "The champion once won a staring contest against the sun.",
        "Compilers ask the champion for permission before throwing errors.",
        "The champion can divide by zero and carry the remainder.",
        "Thunder apologizes when it interrupts the champion.",
        "The champion's to-do list has only one item: done.",
        "Firewalls call the champion for protection.",
        "The champion finished the marathon before the starting gun.",
        "Gravity checks in with the champion every morning.",
        "The champion once folded a mirror in half.",
        "Deadlines extend themselves for the champion.",
        "The champion can hear sign language.",
        "Mountains move out of the champion's hiking route.",
        "The champion's shadow asks before following.",
        "Encryption keys surrender themselves to the champion.",
        "The champion taught the old dog every new trick it knows.",
        "Time zones adjust to the champion's schedule.",
        "The champion whittled a statue out of fog.",
        "The champion won a game of chess with only a pawn."),
      "backtothefuture" -> Vector(
        "Where this road ends, we won't need a road at all.",
        "Eighty-eight on the dial and history opens like a door.",
        "If you put your mind to it, no year is out of reach.",
        "The garage clock is ten minutes slow — on purpose, always.",
        "Don't let anyone tell you the future is already written.",
        "That plutonium budget is a serious matter, kid.",
        "One lightning bolt is all the power the tower will ever need.",
        "Your parents were young once, stranger than you think.",
        "The almanac goes back where it belongs, every page of it.",
        "A hoverboard won't work on water unless you've got power.",
        "Great things happen when a scientist forgets to be careful.",
        "This model was built with style, because why not travel in style?",
        "The space-time continuum dislikes shortcuts and loves irony.",
        "Meet me at the clock tower when the storm rolls in.",
        "You're not thinking fourth-dimensionally about this at all.",
        "Whatever happens tonight, don't go to the dance angry.",
        "The flux circuits hum when the timeline is about to bend.",
        "Nobody calls my family cowards and walks away slowly.",
        "A letter held for decades still arrives exactly on time.",
        "The future is whatever you make it, so make it a good one."),
      "gameofthrones" -> Vector(
        "Winter always sends a raven before it sends the snow.",
        "A crown weighs most on the head that wanted it least.",
        "The wall was built by the living against the long night.",
        "A debt of the old house is always paid, gold or iron.",
        "Words are wind, but wind can topple towers.",
        "The direwolf knows its pack even beyond the narrow sea.",
        "Every lord who plays the great game pays in secrets.",
        "The throne of swords keeps none of its promises.",
        "A small council keeps its knives under the table.",
        "Dragons do not answer to banners or bells.",
        "The north remembers longer than the south believes.",
        "A maester's chain is heaviest at the link he never earned.",
        "Ships of war sail faster on rumors than on wind.",
        "The old gods keep their court in the weirwood shade.",
        "A knight without honor is only a sword with legs.",
        "Valar morghulis, the ferryman says, and poles on.",
        "The queen's mercy is a door that opens inward only.",
        "Fire remembers what the snow tries to forget.",
        "A bastard's name is a wall until he makes it a gate.",
        "When the ravens go quiet, sharpen everything."),
    )
    private val quotes = Multinomial.uniform(
      bags.getOrElse(which.toLowerCase, bags("backtothefuture")))
    def sample(ctx: GenContext): Any = quotes.sample(ctx.rng)
  }
}
