package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Flac

class FlacSpec extends AnyFunSuite {

  test("hand-computed STREAMINFO bytes of a known stream hold") {
    // 44100 Hz, 2 ch, 16 bps, 88200 samples (2 s), block 4096, no extras
    val b = Flac.build(44100, 2, 16, 88200L, blockSize = 4096, frameBytes = 0)
    assert(new String(b.take(4), "US-ASCII") == "fLaC")
    assert((b(4) & 0xff) == 0x80) // last-block flag + type 0
    assert(((b(5) & 0xff) << 16 | (b(6) & 0xff) << 8 | (b(7) & 0xff)) == 34)
    val body = 8
    assert(((b(body) & 0xff) << 8 | (b(body + 1) & 0xff)) == 4096)
    // packed sr/ch/bps: 44100 = 0x0AC44 -> bytes 0x0A 0xC4, then
    // 0x4?: low nibble 4 of sr in the high nibble, (2-1)<<1 = 2,
    // (16-1)>>4 = 0 -> 0x42; next byte ((16-1)&0xF)<<4 = 0xF0 | total>>32
    assert((b(body + 10) & 0xff) == 0x0a)
    assert((b(body + 11) & 0xff) == 0xc4)
    assert((b(body + 12) & 0xff) == 0x42)
    assert((b(body + 13) & 0xff) == 0xf0)
    // 88200 = 0x015888
    assert((b(body + 15) & 0xff) == 0x01)
    assert((b(body + 16) & 0xff) == 0x58)
    assert((b(body + 17) & 0xff) == 0x88)
  }

  test("round-trip across rate/channel/depth/block/comment/padding variants") {
    for {
      sr <- Seq(8000, 44100, 48000, 96000, 192000)
      ch <- Seq(1, 2, 6, 8)
      bps <- Seq(8, 16, 24, 32)
      nc <- Seq(0, 3)
      pad <- Seq(-1, 0, 513)
    } {
      val total = sr.toLong * 3 + 17
      val comments = (0 until nc).map(i => (s"k$i", s"v$i"))
      val bytes = Flac.build(sr, ch, bps, total, blockSize = 1024,
        comments = comments, paddingSize = pad)
      val m = Flac.parseMeta(bytes).getOrElse(
        fail(s"parse failed sr=$sr ch=$ch bps=$bps nc=$nc pad=$pad"))
      assert(m.sampleRate == sr)
      assert(m.channels == ch)
      assert(m.bitsPerSample == bps)
      assert(m.totalSamples == total)
      assert(m.durationMs == total * 1000L / sr)
      assert(m.minBlockSize == 1024 && m.maxBlockSize == 1024)
      assert(m.nBlocks == 1 + (if (nc > 0) 1 else 0) + (if (pad >= 0) 1 else 0))
      assert(m.paddingBytes == math.max(pad, 0))
      assert(m.nComments == (if (nc > 0) nc else -1))
    }
  }

  test("36-bit total samples and u20 sample-rate ceiling survive the pack") {
    val total = (1L << 36) - 1
    val m = Flac.parseMeta(Flac.build(655350, 8, 32, total)).get
    assert(m.totalSamples == total)
    assert(m.sampleRate == 655350)
    assert(m.durationMs == total * 1000L / 655350)
  }

  test("total samples 0 = unknown: duration is the -1 sentinel, not 0") {
    val m = Flac.parseMeta(Flac.build(44100, 2, 16, 0L)).get
    assert(m.totalSamples == 0L && m.durationMs == -1L)
  }

  test("honest None: bad magic, truncation, non-first STREAMINFO, sr 0") {
    assert(Flac.parseMeta(null) == None)
    assert(Flac.parseMeta("fLaX".getBytes("US-ASCII") ++
      new Array[Byte](64)) == None)
    val good = Flac.build(44100, 2, 16, 4096L, comments = Seq(("a", "b")))
    assert(Flac.parseMeta(good.take(20)) == None) // mid-STREAMINFO cut
    assert(Flac.parseMeta(good.take(4 + 4 + 34 + 2)) == None) // block hdr cut
    // STREAMINFO not first: swap a padding block in front
    val pad = Array[Byte](0x01, 0, 0, 2, 0, 0)
    assert(Flac.parseMeta("fLaC".getBytes("US-ASCII") ++ pad ++
      good.drop(4)) == None)
    // declared sample rate 0 (spec-invalid, duration divisor)
    val z = good.clone()
    z(8 + 10) = 0; z(8 + 11) = 0; z(8 + 12) = (z(8 + 12) & 0x0f).toByte
    assert(Flac.parseMeta(z) == None)
  }

  test("unknown block types size-skip; padding sums across blocks") {
    // STREAMINFO + SEEKTABLE(18B) + PADDING(5) + PICTURE(9) + PADDING(7)
    val base = Flac.build(48000, 2, 16, 48000L, frameBytes = 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 4)
    out.write(0x00); out.write(0); out.write(0); out.write(34)
    out.write(base, 8, 34)
    def blk(t: Int, last: Boolean, n: Int): Unit = {
      out.write((if (last) 0x80 else 0) | t)
      out.write(0); out.write(n >> 8); out.write(n & 0xff)
      (0 until n).foreach(_ => out.write(0))
    }
    blk(3, last = false, 18); blk(1, last = false, 5)
    blk(6, last = false, 9); blk(1, last = true, 7)
    val m = Flac.parseMeta(out.toByteArray).get
    assert(m.nBlocks == 5 && m.paddingBytes == 12 && m.nComments == -1)
    assert(m.sampleRate == 48000 && m.totalSamples == 48000L)
  }
}
