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

  /** `dns` (samplers/DnsSampler.java:334-390): one simulated user — IP
    * plus a `queries` array of {domain, revDomain, time, timestamp_ms,
    * timestamp_s} from the bursty day/night machine. `flat` mode is
    * handled by the composer (the array becomes a row generator with the
    * IP merged into each element, DnsSampler.java:377-389).
    */
  final class DnsSampler(meanQueries: Double, flat: Boolean,
      fields: Option[Seq[String]]) extends Sampler {
    private val allQ = Seq("domain", "revDomain", "time", "timestamp_ms", "timestamp_s")
    private val keptQ = fields.map(_.filter(allQ.contains)).getOrElse(allQ)
    private val qType = StructType(keptQ.map {
      case f @ ("timestamp_ms" | "timestamp_s") => StructField(f, LongType)
      case f                                    => StructField(f, StringType)
    })
    val dataType: DataType =
      if (flat) ArrayType(StructType(
        StructField("ip", StringType) +: qType.fields.toSeq), containsNull = false)
      else StructType(Seq(StructField("ip", StringType),
        StructField("queries", ArrayType(qType, containsNull = false))))
    private val ip = new LookupSamplers.Ipv4Sampler(priv = false)
    private val domains = new LookupSamplers.DomainDraw
    private val ft = FancyTime("yyyy-MM-dd HH:mm:ss")
    private val startMs = 1375315200000L

    def sample(ctx: GenContext): Any = {
      val clock = new BurstyClock(ctx.rng, startMs, 3600 * 1000.0, 2000.0, 8.0)
      val n = 1 + (-meanQueries * math.log(ctx.rng.nextDouble())).toInt
      val userIp = ip.sample(ctx).asInstanceOf[String]
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
      if (flat) queries.map(q => Row.fromSeq(userIp +: q.toSeq))
      else Row(userIp, queries)
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

  /** `commuter` (drive/Commuter.java:114-194 + drive/Car.java physics):
    * home (zip) + work; Poisson weekday-rush trip decisions; each trip
    * emitted as 1 Hz points {latitude, longitude, t, timestamp, mph,
    * rpm, throttle} along the great-circle home→work with a
    * trapezoidal speed profile (accelerate / cruise / decelerate) —
    * an original kinematic model with the reference's output shape.
    */
  final class CommuterSampler(homeZipPrefix: Option[String], days: Int, flat: Boolean)
      extends Sampler {
    private val pointType = StructType(Seq(
      StructField("latitude", DoubleType), StructField("longitude", DoubleType),
      StructField("t", LongType), StructField("timestamp", StringType),
      StructField("mph", DoubleType), StructField("rpm", DoubleType),
      StructField("throttle", DoubleType)))
    private val tripType = StructType(Seq(
      StructField("start_ms", LongType), StructField("direction", StringType),
      StructField("points", ArrayType(pointType, containsNull = false))))
    val dataType: DataType =
      if (flat) ArrayType(pointType, containsNull = false)
      else StructType(Seq(
        StructField("home", StructType(Seq(
          StructField("zip", StringType), StructField("city", StringType),
          StructField("state", StringType), StructField("latitude", DoubleType),
          StructField("longitude", DoubleType)))),
        StructField("trips", ArrayType(tripType, containsNull = false))))
    private val zips = homeZipPrefix match {
      case Some(p) =>
        val f = SeedData.continentalZips.filter(_.zip.startsWith(p))
        if (f.nonEmpty) f else SeedData.continentalZips
      case None => SeedData.continentalZips
    }
    private val ft = FancyTime("yyyy-MM-dd HH:mm:ss")
    private val startMs = 1375315200000L

    def sample(ctx: GenContext): Any = {
      val rng = ctx.rng
      val home = zips(rng.nextInt(zips.length))
      // work site: 5–25 km offset from home
      val distKm = 5 + rng.nextDouble() * 20
      val bearing = rng.nextDouble() * 2 * math.Pi
      val dLat = distKm / 111.0 * math.cos(bearing)
      val dLon = distKm / (111.0 * math.cos(math.toRadians(home.latitude))) * math.sin(bearing)
      val (wLat, wLon) = (home.latitude + dLat, home.longitude + dLon)

      val trips = Vector.newBuilder[Row]
      var day = 0
      while (day < days) {
        val dayStart = startMs + day.toLong * dayMs
        // dow: 0=Sun..6=Sat (epoch day 0 is a Thursday → +4); weekday is
        // Mon..Fri = 1..5, NOT dow<5 (which would commute on Sundays)
        val dow = ((dayStart / dayMs) + 4) % 7
        val weekday = dow >= 1 && dow <= 5
        if (weekday || rng.nextDouble() < 0.3) {
          val out = dayStart + (7 * 3600 + rng.nextInt(2 * 3600)) * 1000L
          trips += simTrip(rng, out, home.latitude, home.longitude, wLat, wLon, "out")
          val back = dayStart + (16 * 3600 + rng.nextInt(3 * 3600)) * 1000L
          trips += simTrip(rng, back, wLat, wLon, home.latitude, home.longitude, "back")
        }
        day += 1
      }
      val tripRows = trips.result()
      if (flat) tripRows.flatMap(_.getAs[Seq[Row]](2))
      else Row(Row(home.zip, home.city, home.state, home.latitude, home.longitude), tripRows)
    }

    /** Trapezoidal speed profile along the straight (locally-flat) path. */
    private def simTrip(rng: java.util.Random, t0: Long,
        lat0: Double, lon0: Double, lat1: Double, lon1: Double, dir: String): Row = {
      val kmPerLat = 111.0
      val kmPerLon = 111.0 * math.cos(math.toRadians(lat0))
      val distKm = math.sqrt(math.pow((lat1 - lat0) * kmPerLat, 2) +
        math.pow((lon1 - lon0) * kmPerLon, 2))
      val cruiseMph = 35 + rng.nextDouble() * 30
      val cruiseKmS = cruiseMph * 1.609344 / 3600
      val accelS = 15.0 + rng.nextInt(10)
      val totalS = math.max((distKm / cruiseKmS + accelS).toInt, (2 * accelS).toInt)
      val stride = math.max(1, totalS / 120) // cap ≈120 points/trip
      val points = Vector.newBuilder[Row]
      var s = 0
      var traveled = 0.0
      while (s <= totalS) {
        val speedFrac =
          if (s < accelS) s / accelS
          else if (s > totalS - accelS) (totalS - s) / accelS
          else 1.0
        val mph = cruiseMph * speedFrac
        traveled += cruiseKmS * speedFrac * stride
        val frac = math.min(1.0, traveled / math.max(distKm, 1e-9))
        val lat = lat0 + (lat1 - lat0) * frac
        val lon = lon0 + (lon1 - lon0) * frac
        val rpm = 700 + mph * 40 + rng.nextGaussian() * 50
        val throttle = math.max(0.0, math.min(1.0,
          speedFrac * 0.6 + rng.nextGaussian() * 0.05))
        val t = t0 + s * 1000L
        points += Row(lat, lon, t, ft.formatMillis(t), mph, rpm, throttle)
        s += stride
      }
      Row(t0, dir, points.result())
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

  /** Weighted quote bags for the reference's faker-based `text` modes
    * (TextSampler.java:40-85) — original stand-in quotes.
    */
  final class QuoteSampler(which: String) extends Sampler {
    val dataType: DataType = StringType
    private val quotes = Multinomial.uniform(Vector(
      s"$which quote about persistence and luck",
      s"$which quote about time and tides",
      s"$which quote about roads not taken",
      s"$which quote about the long game",
      s"$which quote about staying curious"))
    def sample(ctx: GenContext): Any = quotes.sample(ctx.rng)
  }
}
