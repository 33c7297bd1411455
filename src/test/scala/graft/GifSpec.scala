package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Gif

class GifSpec extends AnyFunSuite {

  test("round-trip: dims, GCT size, frames, delays, loop, comment") {
    for {
      frames <- Seq(1, 3, 8)
      loop <- Seq(-1, 0, 5)
      gct <- Seq(1, 7)
    } {
      val delays = (0 until frames).map(i => 4 + i)
      val b = Gif.build(320, 200, frames, delays, loop, gct,
        comment = "made by graft")
      val m = Gif.parseMeta(b).getOrElse(fail(s"f=$frames loop=$loop"))
      assert(m.width == 320 && m.height == 200)
      assert(m.gctColors == (1 << (gct + 1)))
      assert(m.nFrames == frames)
      assert(m.animated == (frames > 1))
      assert(m.totalDelayMs == delays.sum * 10L)
      assert(m.loopCount == loop)
      assert(m.hasComment && m.complete)
    }
  }

  test("GIF87a static image: no extensions, single frame") {
    val b = Gif.build(16, 16, 1)
    val fixed = b.clone()
    "GIF87a".getBytes("US-ASCII").copyToArray(fixed, 0)
    val m = Gif.parseMeta(fixed).get
    assert(m.nFrames == 1 && !m.animated && m.totalDelayMs == 0)
    assert(m.loopCount == -1 && !m.hasComment)
  }

  test("a torn block stream keeps counted frames, complete false") {
    val b = Gif.build(64, 64, 3, Seq(10, 10, 10), loop = 0)
    val m = Gif.parseMeta(b.dropRight(8)).get
    assert(m.nFrames == 2 && !m.complete)
    assert(m.loopCount == 0)
  }

  test("honest None: bad magic, header-only truncation") {
    assert(Gif.parseMeta(null) == None)
    assert(Gif.parseMeta("GIF90a??????????".getBytes("US-ASCII")) == None)
    assert(Gif.parseMeta("GIF89a".getBytes("US-ASCII")) == None)
  }
}
