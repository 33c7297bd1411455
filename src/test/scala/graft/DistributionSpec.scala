package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.synth.Synth

/** Statistical oracles the reference never had (SURVEY §5 plan):
  * moment / KS / χ² checks of the generated distributions, on both the
  * interpreter and (where supported) the Catalyst fast path.
  */
class DistributionSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  private def sample(schema: String, n: Long, fast: Boolean): Array[Double] = {
    val df = if (fast) Synth.dataFrameAuto(spark, schema, n, seed = 21)
      else Synth.dataFrame(spark, schema, n, seed = 21)
    df.collect().map(r => r.get(0) match {
      case l: Long => l.toDouble
      case d: Double => d
      case other => other.toString.toDouble
    })
  }

  private def ksUniform(xs: Array[Double], lo: Double, hi: Double): Double = {
    val s = xs.map(x => (x - lo) / (hi - lo)).sorted
    s.zipWithIndex.map { case (x, i) =>
      math.max(math.abs(x - i.toDouble / s.length), math.abs(x - (i + 1.0) / s.length))
    }.max
  }

  for (fast <- Seq(false, true)) {
    val label = if (fast) "fast path" else "interpreter"

    test(s"int is KS-uniform on [min,max) ($label)") {
      val xs = sample("""[{"name": "x", "class": "int", "min": 100, "max": 1100}]""",
        20000, fast)
      assert(xs.forall(x => x >= 100 && x < 1100))
      val d = ksUniform(xs, 100, 1100)
      assert(d < 0.015, s"KS statistic $d") // crit ~1.63/sqrt(20000)=0.0115 at α=.01
    }

    test(s"normal matches mean/sd moments ($label)") {
      val xs = sample("""[{"name": "x", "class": "normal", "mean": 50, "sd": 4}]""",
        20000, fast)
      val mean = xs.sum / xs.length
      val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.length)
      assert(math.abs(mean - 50) < 0.15, s"mean $mean")
      assert(math.abs(sd - 4) < 0.15, s"sd $sd")
    }

    test(s"browser multinomial matches seed weights by chi-square ($label)") {
      val df = if (fast) Synth.dataFrameAuto(spark,
        """[{"name": "b", "class": "browser"}]""", 20000, 3)
      else Synth.dataFrame(spark, """[{"name": "b", "class": "browser"}]""", 20000, 3)
      val counts = df.collect().groupBy(_.getString(0)).view.mapValues(_.length).toMap
      val total = graft.runtime.SeedData.browsers.map(_._2).sum
      val chi2 = graft.runtime.SeedData.browsers.map { case (b, w) =>
        val expect = 20000 * w / total
        val got = counts.getOrElse(b, 0)
        (got - expect) * (got - expect) / expect
      }.sum
      assert(chi2 < 18.5, s"chi2 $chi2") // df=4, α=0.001 → 18.47
    }
  }

  test("fast-path flat sequence: random-walk steps are N(0,1)") {
    val df = Synth.dataFrameAuto(spark, graft.api.CannedSources.iotSchemaJson,
      50, seed = 12)
    val steps = df.select("device-id", "time", "temp").collect()
      .groupBy(_.getString(0)).values.flatMap { dev =>
        dev.sortBy(_.getString(1)).map(_.getDouble(2)).sliding(2)
          .map(pair => pair(1) - pair(0))
      }.toArray
    val mean = steps.sum / steps.length
    val sd = math.sqrt(steps.map(x => (x - mean) * (x - mean)).sum / steps.length)
    assert(math.abs(mean) < 0.05, s"step mean $mean")   // se ≈ 1/√4950 ≈ 0.014
    assert(math.abs(sd - 1) < 0.05, s"step sd $sd")
  }

  test("fast-path flat sequence: event gaps are Exp(60s) for rate 1/m") {
    val df = Synth.dataFrameAuto(spark, graft.api.CannedSources.iotSchemaJson,
      50, seed = 11)
    val ft = graft.runtime.FancyTime("yyyy-MM-dd HH:mm:ss")
    val gaps = df.select("device-id", "time").collect()
      .groupBy(_.getString(0)).values.flatMap { dev =>
        val ts = dev.map(r => ft.parseMillis(r.getString(1))).sorted
        ts.sliding(2).map { case Array(a, b) => (b - a) / 1000.0 }
      }.toArray
    val mean = gaps.sum / gaps.length
    assert(mean > 54 && mean < 66, s"mean gap $mean s") // se ≈ 60/√4950 ≈ 0.9
    assert(gaps.forall(_ >= 0))
  }

  test("exponential date sampler: mean distance before epoch ≈ 100 days") {
    val ft = graft.runtime.FancyTime("yyyy-MM-dd")
    val epoch = 1375315200000L
    val xs = Synth.dataFrame(spark,
      """[{"name": "d", "class": "date"}]""", 20000, seed = 5)
      .collect().map(r => (epoch - ft.parseMillis(r.getString(0))).toDouble / 86400000)
    val mean = xs.sum / xs.length
    assert(mean > 95 && mean < 105, s"mean days back $mean") // se ≈ 100/√20000 ≈ 0.7
  }

  test("foreign-key zipf skew: low keys dominate") {
    val xs = sample("""[{"name": "k", "class": "foreign-key", "size": 1000, "skew": 1}]""",
      20000, fast = false)
    val lowShare = xs.count(_ < 100).toDouble / xs.length
    assert(lowShare > 0.5, s"share of keys <100: $lowShare") // zipf(1): H(100)/H(1000) ≈ 0.69
  }

  test("pitman-yor: table count grows sublinearly (rich-get-richer)") {
    val xs = sample(
      """[{"name": "p", "class": "pitman_yor", "alpha": 5, "discount": 0}]""",
      10000, fast = false)
    val distinct = xs.distinct.length
    // CRP with alpha=5: E[tables] ≈ 5·ln(1 + n/5) ≈ 38 at n=10000 per
    // partition stream; across 4 partitions ≤ ~200. Far below linear.
    assert(distinct < 400, s"distinct tables $distinct")
    val top = xs.groupBy(identity).view.mapValues(_.length).values.max
    assert(top > 1000, s"largest table $top") // rich got richer
  }

  test("fast path and interpreter draw from the same distribution (KS two-sample)") {
    val a = sample("""[{"name": "x", "class": "double", "min": 0, "max": 1}]""",
      20000, fast = false).sorted
    val b = sample("""[{"name": "x", "class": "double", "min": 0, "max": 1}]""",
      20000, fast = true).sorted
    // two-sample KS
    var i = 0; var j = 0; var d = 0.0
    while (i < a.length && j < b.length) {
      if (a(i) <= b(j)) i += 1 else j += 1
      d = math.max(d, math.abs(i.toDouble / a.length - j.toDouble / b.length))
    }
    assert(d < 0.02, s"two-sample KS $d") // crit ≈ 1.95·sqrt(2/20000) = 0.0195 at α=.001
  }

  test("sequence-embedded normal: fast path and interpreter agree (KS two-sample)") {
    // the round-4 flat-sequence normal lowering vs the interpreter's
    // NormalSampler — two independent deterministic streams, same
    // distribution (the cross-lowering check that caught the round-2
    // restart bug, applied to the new element sampler)
    val schema = """[
      {"class": "sequence", "lengthDistribution": 10, "flat": true,
       "base": {"class": "map", "value": [
         {"name": "x", "class": "normal", "mean": 3, "sd": 2}]}}]"""
    val a = sample(schema, 2000, fast = false).sorted
    val b = sample(schema, 2000, fast = true).sorted
    assert(a.length == 20000 && b.length == 20000)
    var i = 0; var j = 0; var d = 0.0
    while (i < a.length && j < b.length) {
      if (a(i) <= b(j)) i += 1 else j += 1
      d = math.max(d, math.abs(i.toDouble / a.length - j.toDouble / b.length))
    }
    // sequence samples within a record share a partition stream, so the
    // effective independent-draw count is below 20000; loosen to α≈1e-3
    // at n_eff ~ 10000
    assert(d < 0.03, s"two-sample KS $d")
  }
}
