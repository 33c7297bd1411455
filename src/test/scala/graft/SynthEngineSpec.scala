package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.synth.Synth

/** End-to-end tests of the generator engine, anchored on the reference's
  * own oracles (SURVEY §5): browser membership
  * (TestDataSynthesizer.java:86-103), phone-number regex
  * (TestPhoneNumber.java:53-81), word-count cardinality
  * (TestTextGenerator.java:49-90), zip lookup consistency
  * (TestCommuterData.java:70).
  */
class SynthEngineSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  /** The shipped IoT schema (reference
    * processors/src/main/resources/generators/iot-data.json): uuid + ipv4
    * + flattened zip lat/long + flat sequence of 100 {event, random-walk}.
    */
  private val iotSchema = """[
    {"name": "device-id", "class": "uuid", "seed": 1},
    {"name": "device-ip", "class": "ipv4"},
    {"class": "flatten", "prefix": "",
     "value": {"class": "zip", "onlyContinental": true, "fields": "latitude, longitude"}},
    {"class": "sequence", "lengthDistribution": 100,
     "base": {"class": "map", "value": [
       {"name": "time", "class": "event", "format": "yyyy-MM-dd HH:mm:ss", "rate": "1/m"},
       {"name": "temp", "class": "random-walk", "start": 30, "mean": 0, "sd": 1}]},
     "flat": true}
  ]"""

  test("iot schema: 5 devices x 100 readings, correct columns and shapes") {
    val df = Synth.dataFrame(spark, iotSchema, 5, seed = 7, partitions = 2)
    assert(df.columns.toSeq ==
      Seq("device-id", "device-ip", "latitude", "longitude", "time", "temp"))
    val rows = df.collect()
    assert(rows.length == 500)
    val uuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
    val ipRe = "^\\d{1,3}(\\.\\d{1,3}){3}$".r
    rows.foreach { r =>
      assert(uuidRe.matches(r.getAs[String]("device-id")), r.getAs[String]("device-id"))
      assert(ipRe.matches(r.getAs[String]("device-ip")))
      val lat = r.getAs[Double]("latitude")
      assert(lat > 24 && lat < 50, s"continental latitude, got $lat") // AK/HI excluded
    }
    // 5 distinct devices, each with exactly 100 readings
    val perDevice = rows.groupBy(_.getAs[String]("device-id")).view.mapValues(_.length)
    assert(perDevice.size == 5 && perDevice.values.forall(_ == 100))
  }

  test("same seed, same partitioning => bit-identical output; different seed differs") {
    val a = Synth.dataFrame(spark, iotSchema, 4, seed = 11, partitions = 2).collect()
    val b = Synth.dataFrame(spark, iotSchema, 4, seed = 11, partitions = 2).collect()
    val c = Synth.dataFrame(spark, iotSchema, 4, seed = 12, partitions = 2).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.map(_.toString).toSeq != c.map(_.toString).toSeq)
  }

  test("interpreter output is stable under a downstream coalesce") {
    // coalesce(1) computes all range partitions inside ONE task; the
    // partition seed must come from the data (range-split inverse), not
    // TaskContext — with task-level seeding every merged partition
    // replayed partition 0's stream and each value appeared p times
    val schema = """[{"name": "x", "class": "int", "min": 0, "max": 1000000000}]"""
    def vals(df: org.apache.spark.sql.DataFrame) =
      df.select("x").collect().map(_.getLong(0)).sorted.toSeq
    val direct = vals(Synth.dataFrame(spark, schema, 4000, partitions = 4))
    val merged = vals(Synth.dataFrame(spark, schema, 4000, partitions = 4).coalesce(1))
    assert(direct == merged)
    // and the streams really are per-partition distinct, not p copies
    assert(direct.distinct.size > 3990)
  }

  test("default partition count is a pure function of n (topology-independent)") {
    // the interpreter's per-partition RNG streams make partition count
    // part of the output contract; a defaultParallelism-derived default
    // made the same (schema, seed, n) generate different data — and for
    // the simulators different ROW COUNTS — on different cluster shapes
    // (caught by ClusterParityCheck all). The default must never read
    // session or cluster state.
    assert(Synth.pinnedPartitions(1) == 32)
    assert(Synth.pinnedPartitions(20) == 32)
    assert(Synth.pinnedPartitions(2_000_000) == 32)
    assert(Synth.pinnedPartitions(2_200_000) == 34)       // growth knee ~2.1M
    assert(Synth.pinnedPartitions(64_000_000) == 977)     // ~64k ids/partition
    assert(Synth.pinnedPartitions(640_000_000) == 9766)   // linear task growth
    // and the defaulted call really uses it: byte-equal to the explicit
    // pinned count, regardless of what parallelism this session has
    val schema = """[{"name": "x", "class": "int", "min": 0, "max": 1000000000}]"""
    val byDefault = Synth.dataFrame(spark, schema, 1000).collect().map(_.toString).toSeq
    val explicit = Synth.dataFrame(spark, schema, 1000,
      partitions = Synth.pinnedPartitions(1000)).collect().map(_.toString).toSeq
    assert(byDefault == explicit)
  }

  test("event times are monotonic within a partition (arrival clock)") {
    val df = Synth.dataFrame(spark, iotSchema, 2, seed = 3, partitions = 1)
    val times = df.select("time").collect().map(_.getString(0))
    assert(times.toSeq == times.sorted.toSeq)
  }

  test("browser membership oracle (TestDataSynthesizer.java:86-103)") {
    val df = Synth.dataFrame(spark,
      """[{"name": "browser", "class": "browser"}]""", 200, seed = 1)
    val allowed = Set("Mobile", "Chrome", "Firefox", "Safari", "IE")
    df.collect().foreach(r => assert(allowed.contains(r.getString(0))))
  }

  test("phone-number shape oracle (TestPhoneNumber.java:53-81)") {
    val schema = """[
      {"name": "phone", "class": "join", "separator": "-",
       "value": {"class": "sequence", "array": [
         {"class": "int", "min": 200, "max": 999},
         {"class": "int", "min": 200, "max": 999},
         {"class": "int", "min": 1000, "max": 9999}]}}
    ]"""
    val re = "^\\d{3}-\\d{3}-\\d{4}$".r
    Synth.dataFrame(spark, schema, 50, seed = 5).collect()
      .foreach(r => assert(re.matches(r.getString(0)), r.getString(0)))
  }

  test("zip 10001 -> NEW YORK lookup-consistency oracle (TestCommuterData.java:70)") {
    val df = Synth.dataFrame(spark,
      """[{"name": "z", "class": "zip", "zip": "10001"}]""", 10, seed = 2)
    df.collect().foreach { r =>
      val z = r.getStruct(0)
      assert(z.getAs[String]("zip") == "10001")
      assert(z.getAs[String]("city") == "NEW YORK")
      assert(z.getAs[String]("state") == "NY")
    }
  }

  test("int sampler respects [min,max) and skew direction") {
    val df = Synth.dataFrame(spark,
      """[{"name": "a", "class": "int", "min": 10, "max": 20},
          {"name": "b", "class": "int", "min": 0, "max": 1000, "skew": 3}]""",
      2000, seed = 9)
    val rows = df.collect()
    rows.foreach { r =>
      val a = r.getAs[Long]("a")
      assert(a >= 10 && a < 20)
    }
    // positive skew = min of 4 draws => mean well below 500
    val meanB = rows.map(_.getAs[Long]("b")).sum.toDouble / rows.length
    assert(meanB < 350, s"skewed mean $meanB")
  }

  test("int/double dist option draws only listed values at ~weight ratios") {
    val df = Synth.dataFrame(spark,
      """[{"name": "i", "class": "int", "dist": {"10": 3, "20": 1}},
          {"name": "x", "class": "double", "dist": {"1.5": 3, "2.5": 1}}]""",
      4000, seed = 17)
    val rows = df.collect()
    assert(rows.forall(r => Set(10L, 20L)(r.getAs[Long]("i"))))
    assert(rows.forall(r => Set(1.5, 2.5)(r.getAs[Double]("x"))))
    val ratio = rows.count(_.getAs[Double]("x") == 1.5).toDouble /
      rows.count(_.getAs[Double]("x") == 2.5)
    assert(ratio > 2.2 && ratio < 4.0, s"weight ratio $ratio") // ~3:1
    // bad dist key names the field
    val e = intercept[IllegalArgumentException](Synth.dataFrame(spark,
      """[{"name": "i", "class": "int", "dist": {"ten": 1}}]""", 1))
    assert(e.getMessage.contains("'i'") && e.getMessage.contains("ten"))
  }

  test("imei passes Luhn; vin passes ISO-3779 check digit") {
    val df = Synth.dataFrame(spark,
      """[{"name": "imei", "class": "imei"}, {"name": "vin", "class": "vin"}]""",
      100, seed = 4)
    df.collect().foreach { r =>
      assert(graft.runtime.Checksums.luhnValid(r.getAs[String]("imei")))
      assert(graft.runtime.Checksums.vinValid(r.getAs[String]("vin")))
    }
  }

  test("markov text produces exactly n words (TestTextGenerator.java:49-90)") {
    val m = graft.runtime.Markov.default
    val rng = graft.runtime.Rng.forKey(1, 2)
    (1 to 20).foreach { n =>
      assert(m.produce(rng, n).split(" ").length == n)
    }
  }

  test("ssn format AAA-GG-SSSS") {
    val re = "^\\d{3}-\\d{2}-\\d{4}$".r
    Synth.dataFrame(spark, """[{"name": "s", "class": "ssn"}]""", 50, seed = 6)
      .collect().foreach(r => assert(re.matches(r.getString(0)), r.getString(0)))
  }

  test("name + email-name couple through the record side channel") {
    val df = Synth.dataFrame(spark,
      """[{"name": "n", "class": "name", "type": "first_last"},
          {"name": "e", "class": "email-name"}]""", 50, seed = 8)
    df.collect().foreach { r =>
      val Array(f, l) = r.getAs[String]("n").split(" ", 2)
      val email = r.getAs[String]("e")
      assert(email.startsWith(s"${f.toLowerCase}.${l.toLowerCase}@"), s"$email vs $f $l")
    }
  }

  test("dns flat mode fans queries into rows with a mixed v4/v6 source address") {
    val df = Synth.dataFrame(spark,
      """[{"class": "dns", "flat": true, "meanQueries": 10}]""", 200, seed = 13)
    assert(df.columns.toSeq.take(4) == Seq("ip", "ipx", "ipV4", "domain"))
    assert(df.count() >= 200)
    assert(df.schema("timestamp_ms").dataType.typeName == "long")
    val v4Re = "^\\d{1,3}(\\.\\d{1,3}){3}$".r
    val v6Re = "^[0-9a-f]{1,4}(:[0-9a-f]{1,4}){7}$".r
    val users = df.select("ip", "ipx", "ipV4").distinct().collect()
    users.foreach { r =>
      val (ip, ipx, isV4) = (r.getString(0), r.getString(1), r.getBoolean(2))
      if (isV4) {
        assert(v4Re.matches(ip), s"bad v4 '$ip'")
        assert(ipx.length == 8)
      } else {
        assert(v6Re.matches(ip), s"bad v6 '$ip'")
        assert(ipx.length == 32)
      }
    }
    // the 30/70 v4/v6 mix (IpAddressDistribution.java:29): binomial
    // 3-sigma band around 0.3 for ~200 users
    val v4Frac = users.count(_.getBoolean(2)).toDouble / users.length
    assert(v4Frac > 0.17 && v4Frac < 0.43, s"v4 fraction $v4Frac, want ~0.3")
  }

  test("header types emit the reference template shapes") {
    val df = Synth.dataFrame(spark,
      """[{"name": "h", "class": "header"},
          {"name": "m1", "class": "header", "type": "mal1"},
          {"name": "m3", "class": "header", "type": "mal3"},
          {"name": "ab", "class": "header", "type": "ababil"}]""", 50, seed = 23)
    df.collect().foreach { r =>
      val normal = r.getAs[String]("h")
      assert(normal.startsWith("GET http://foo.bar.com/"))
      assert(normal.contains(" HTTP/1.1\n"))
      assert(normal.contains("User-Agent: Mozilla/5.0"))
      assert(normal.contains("If-None-Match: \"v9”"), "stale etag signature")
      assert(normal.contains("Referer: http://foo.bar.com/"))
      // mal1 forces identity encoding, same canonical template otherwise
      assert(r.getAs[String]("m1").contains("Accept-Encoding: identity"))
      // mal3 lowercases every header name (the bot tell)
      val m3 = r.getAs[String]("m3")
      assert(m3.contains("user-agent: ") && !m3.contains("User-Agent: "))
      // ababil: no HTTP version, fixed MSIE-6 UA, French, no-cache
      val ab = r.getAs[String]("ab")
      assert(!ab.contains("HTTP/1.1") && ab.contains("MSIE 6.0") &&
        ab.contains("Accept-Language: fr") && ab.contains("Pragma: no-cache"))
    }
  }

  test("commuter emits plausible 1 Hz traces") {
    val df = Synth.dataFrame(spark,
      """[{"class": "commuter", "flat": true, "days": 2, "home": "100"}]""", 2, seed = 14)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mph = r.getAs[Double]("mph")
      assert(mph >= 0 && mph < 80)
      val lat = r.getAs[Double]("latitude")
      assert(lat > 39 && lat < 42) // near NYC (home prefix 100xx) ± work offset
    }
  }

  test("top-level random-walk drifts cumulatively across records " +
      "(SchemaSampler.java:87-129 never restarts during sample)") {
    // 256 independent partition streams x 100 records each; the walk at
    // local record k has accumulated k+1 N(0,1) steps, so its variance
    // across partitions must be ~k+1 — a per-record restart (the round-2
    // bug) would pin it at ~1 for every k.
    val nPart = 256
    val perPart = 100
    val rows = Synth.dataFrame(spark,
      """[{"name": "i", "class": "id"},
          {"name": "w", "class": "random-walk", "start": 0, "mean": 0, "sd": 1}]""",
      nPart.toLong * perPart, seed = 5, partitions = nPart)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Double]("w")))
    def secondMomentAtLocal(k: Int): Double = {
      val vs = rows.collect { case (i, w) if i % perPart == k => w }
      assert(vs.length == nPart)
      vs.map(v => v * v).sum / vs.length
    }
    val v9 = secondMomentAtLocal(9) // E = 10, sd of estimate ~0.9
    val v99 = secondMomentAtLocal(99) // E = 100, sd of estimate ~8.8
    assert(v9 > 6 && v9 < 15, s"var at record 9 = $v9, want ~10")
    assert(v99 > 65 && v99 < 140, s"var at record 99 = $v99, want ~100")
    assert(v99 / v9 > 4, s"variance must grow linearly in record index, ratio ${v99 / v9}")
  }

  test("sequence-embedded random-walk still restarts per record " +
      "(SequenceSampler.java:131-138 restarts its base per array sample)") {
    val rows = Synth.dataFrame(spark,
      """[{"class": "sequence", "lengthDistribution": 20, "flat": true,
           "base": {"class": "map", "value": [
             {"name": "w", "class": "random-walk", "start": 50, "mean": 0, "sd": 1}]}}]""",
      200, seed = 6, partitions = 4).collect().map(_.getAs[Double]("w"))
    // 200 records x 20 elements; every record's first element is one step
    // from 50 — if the walk carried across records, late records would
    // wander far from the start
    val firstElems = rows.grouped(20).map(_.head).toSeq
    assert(firstElems.length == 200)
    firstElems.foreach(w => assert(math.abs(w - 50) < 6,
      s"first element $w should be ~1 step from start 50"))
  }

  test("changer emits snapshots with exactly one change flag per mutation") {
    val df = Synth.dataFrame(spark,
      """[{"name": "c", "class": "changer", "count": 6, "values": [
          {"name": "city", "class": "state"},
          {"name": "score", "class": "int", "min": 0, "max": 10}]}]""", 5, seed = 15)
    df.collect().foreach { r =>
      val snaps = r.getSeq[org.apache.spark.sql.Row](0)
      assert(snaps.length == 6)
      snaps.tail.foreach { s =>
        val flags = s.getStruct(2)
        assert((0 until flags.length).map(flags.getInt).sum == 1)
      }
    }
  }
}
