package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.runtime.{Checksums, FancyTime, Multinomial, Rng}
import graft.spec.SpecParser

/** ScalaCheck property tests over the runtime units (SURVEY §5 plan:
  * bounds, determinism, check-digit validity, format round-trips).
  */
class PropertySpec extends AnyFunSuite {
  /** Raw-ScalaCheck driver (scalatestplus isn't on the offline
    * classpath): 100 seeded samples per generator.
    */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (0 until 100).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 100).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } f(a, b)
    }

  test("SplitMix streams are deterministic per (seed, key) and decorrelated") {
    forAll(Gen.long, Gen.long) { (seed: Long, key: Long) =>
      val a = Rng.forKey(seed, key)
      val b = Rng.forKey(seed, key)
      assert((1 to 10).map(_ => a.nextLong()) == (1 to 10).map(_ => b.nextLong()))
    }
    forAll(Gen.long) { (seed: Long) =>
      val a = Rng.forKey(seed, 1)
      val b = Rng.forKey(seed, 2)
      assert(a.nextLong() != b.nextLong()) // neighboring keys diverge immediately
    }
  }

  test("multinomial only returns its own items; uniform doubles stay in [0,1)") {
    val m = Multinomial(Seq("a" -> 1.0, "b" -> 2.0, "c" -> 0.5))
    val rng = Rng.forKey(7, 7)
    (1 to 1000).foreach { _ =>
      assert(Set("a", "b", "c")(m.sample(rng)))
      val d = rng.nextDouble()
      assert(d >= 0.0 && d < 1.0)
    }
  }

  test("luhn check digit makes any digit string valid; single-digit mutation breaks it") {
    forAll(Gen.listOfN(14, Gen.choose(0, 9))) { (ds: List[Int]) =>
      val body = ds.mkString
      val full = body + Checksums.luhnCheckDigit(body)
      assert(Checksums.luhnValid(full))
      // flip one digit -> invalid (Luhn detects all single-digit errors)
      val i = math.abs(body.hashCode) % body.length
      val flipped = body.updated(i, (((body(i) - '0') + 1) % 10 + '0').toChar)
      assert(!Checksums.luhnValid(flipped + full.last))
    }
  }

  test("fancy time round-trips epoch millis at format resolution") {
    val ft = FancyTime("yyyy-MM-dd HH:mm:ss")
    forAll(Gen.choose(0L, 4102444800000L)) { (ms: Long) =>
      val sec = ms / 1000 * 1000
      assert(ft.parseMillis(ft.formatMillis(sec)) == sec)
    }
    assert(FancyTime("iso").formatMillis(0) == "1970-01-01T00:00:00Z")
    assert(FancyTime("s").formatMillis(1500) == "1")
    assert(FancyTime("Q").formatMillis(1500) == "1500")
  }

  test("parseSize handles K/M/G suffixes and plain numbers") {
    assert(SpecParser.parseSize("123") == 123L)
    assert(SpecParser.parseSize("2K") == 2000L)
    assert(SpecParser.parseSize("1.5M") == 1500000L)
    assert(SpecParser.parseSize("2G") == 2000000000L)
    forAll(Gen.choose(0, 1000000)) { (n: Int) =>
      assert(SpecParser.parseSize(n.toString) == n.toLong)
    }
  }

  test("rate strings invert to mean intervals") {
    assert(SpecParser.parseRateAsIntervalMs("1/s") == 1000.0)
    assert(SpecParser.parseRateAsIntervalMs("5/m") == 12000.0)
    assert(SpecParser.parseRateAsIntervalMs("0.5/h") == 7200000.0)
  }

  test("vin check char is stable under recomputation and detects transposition") {
    val rng = Rng.forKey(3, 3)
    val chars = "ABCDEFGHJKLMNPRSTUVWXYZ0123456789"
    (1 to 200).foreach { _ =>
      val raw = (1 to 17).map(_ => chars.charAt(rng.nextInt(chars.length))).mkString
      val vin = raw.updated(8, Checksums.vinCheckChar(raw))
      assert(Checksums.vinValid(vin))
    }
  }
}
