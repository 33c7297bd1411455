package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Id3

class Id3Spec extends AnyFunSuite {

  test("round-trip across versions and all four text encodings") {
    for {
      v <- Seq(3, 4)
      enc <- 0 to (if (v == 4) 3 else 2)
      pad <- Seq(0, 33)
    } {
      // all-Latin-1 text so every encoding round-trips identically
      val b = Id3.build(v, "Tïtle é", "The Artist", "Albúm",
        "1994", enc, audio = Array.fill[Byte](7)(0x55), padding = pad)
      val m = Id3.parseMeta(b).getOrElse(fail(s"v=$v enc=$enc"))
      assert(m.version == v)
      assert(m.title == "Tïtle é")
      assert(m.artist == "The Artist" && m.album == "Albúm")
      assert(m.year == "1994")
      assert(m.nFrames == 4)
    }
  }

  test("tag size arithmetic: declared syncsafe size + padding") {
    val b = Id3.build(4, "T", "A", "B", "2000", 0, padding = 50)
    val m = Id3.parseMeta(b).get
    // 4 frames of (10 hdr + 1 enc + text) + padding
    val frames = Seq("T", "A", "B", "2000").map(10 + 1 + _.length).sum
    assert(m.tagBytes == 10 + frames + 50)
  }

  test("v2.3 plain-u32 vs v2.4 syncsafe frame sizes both walk") {
    // a 200-char title: syncsafe would split across groups, plain
    // u32 would not — both must land on the next frame boundary
    val long = "x" * 200
    assert(Id3.parseMeta(Id3.build(3, long, "a", "b", "1999", 0))
      .get.title == long)
    assert(Id3.parseMeta(Id3.build(4, long, "a", "b", "1999", 0))
      .get.title == long)
  }

  test("year field: TYER in v2.3, TDRC in v2.4, one surface") {
    assert(Id3.parseMeta(Id3.build(3, "t", "a", "b", "1987", 0))
      .get.year == "1987")
    assert(Id3.parseMeta(Id3.build(4, "t", "a", "b", "2015-03", 0))
      .get.year == "2015-03")
  }

  test("honest None for untagged audio; malformed frame stops the walk") {
    assert(Id3.parseMeta(null) == None)
    assert(Id3.parseMeta(Array.fill[Byte](64)(0x55)) == None)
    val b = Id3.build(4, "Keep", "a", "b", "1990", 0)
    // corrupt the THIRD frame's id (after TIT2+TPE1): walk stops, the
    // first two fields survive
    val off1 = 10 + (10 + 1 + 4) // after TIT2("Keep")
    val off2 = off1 + (10 + 1 + 1) // after TPE1("a")
    b(off2) = '!'
    val m = Id3.parseMeta(b).get
    assert(m.title == "Keep" && m.artist == "a")
    assert(m.album == null && m.year == null && m.nFrames == 2)
  }
}
