package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Exif

class ExifSpec extends AnyFunSuite {

  private def build(gps: Boolean = true, le: Boolean = true,
      noExif: Boolean = false, fill: Boolean = false,
      model: String = "Model7") =
    Exif.build(sofW = 800, sofH = 600, orientation = 6, make = "CamCo X",
      model = model, dtOrig = "2021:07:04 10:20:30", pixelW = 1600,
      pixelH = 1200, iso = 400, gps = gps, littleEndian = le,
      noExif = noExif, fillByte = fill)

  test("hand-computed layout: APP1 after the JFIF APP0, TIFF order bytes") {
    val b = build(le = true)
    // SOI(2) + APP0(2+16) -> APP1 marker at 20, Exif\0\0 at 24, TIFF at 30
    assert((b(20) & 0xff) == 0xff && (b(21) & 0xff) == 0xe1)
    assert(new String(b, 24, 4, "US-ASCII") == "Exif")
    assert(b(30) == 'I' && b(31) == 'I')
    assert(Exif.build(1, 1, 1, "m", "m", "d", 1, 1, 1, gps = false,
      littleEndian = false)(30) == 'M')
  }

  test("round-trip across endianness/gps/fill/inline-vs-offset variants") {
    for {
      le <- Seq(true, false)
      gps <- Seq(true, false)
      fill <- Seq(true, false)
      model <- Seq("M1", "Model7") // inline (<=4 w/ NUL) vs offset ASCII
    } {
      val m = Exif.parseMeta(build(gps, le, fill = fill, model = model))
        .getOrElse(fail(s"parse failed le=$le gps=$gps"))
      assert(m.sofW == 800 && m.sofH == 600)
      assert(m.byteOrder == (if (le) "II" else "MM"))
      assert(m.orientation == 6)
      assert(m.make == "CamCo X") // interior space survives (NUL-terminated)
      assert(m.model == model)
      assert(m.dtOrig == "2021:07:04 10:20:30")
      assert(m.pixelW == 1600 && m.pixelH == 1200)
      assert(m.iso == 400)
      assert(m.hasGps == gps)
      assert(m.nIfd0 == (if (gps) 5 else 4))
      assert(m.nGps == (if (gps) 3 else -1))
    }
  }

  test("a JPEG without EXIF still reads SOF dimensions, fields null") {
    val m = Exif.parseMeta(build(noExif = true)).get
    assert(m.sofW == 800 && m.sofH == 600)
    assert(m.byteOrder == null && m.orientation == -1 && m.make == null)
    assert(!m.hasGps && m.nIfd0 == -1 && m.nGps == -1)
  }

  test("an invalid TIFF degrades to no-EXIF, never None") {
    val b = build()
    b(30) = 'X' // corrupt the byte-order mark
    val m = Exif.parseMeta(b).get
    assert(m.sofW == 800 && m.byteOrder == null && m.make == null)
    val c = build()
    c(32) = 99; c(33) = 99 // corrupt the 42 magic (LE u16)
    assert(Exif.parseMeta(c).get.byteOrder == null)
  }

  test("honest None: not a JPEG, truncated segment, truncated length") {
    assert(Exif.parseMeta(null) == None)
    assert(Exif.parseMeta("GIF89a".getBytes("US-ASCII")) == None)
    val b = build()
    assert(Exif.parseMeta(b.take(3)) == None) // marker byte cut
    assert(Exif.parseMeta(b.take(21)) == None) // APP1 length cut
    assert(Exif.parseMeta(b.take(40)) == None) // mid-APP1 body cut
  }

  test("pixel dims disagreeing with SOF read independently") {
    val b = Exif.build(100, 50, 1, "Mk", "Md", "d", 4000, 3000, 100,
      gps = false, littleEndian = true)
    val m = Exif.parseMeta(b).get
    assert(m.sofW == 100 && m.sofH == 50)
    assert(m.pixelW == 4000 && m.pixelH == 3000)
  }
}
