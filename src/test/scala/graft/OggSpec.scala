package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Ogg

class OggSpec extends AnyFunSuite {

  test("page framing: capture, lacing, granule/serial/seq LE, crc self-check") {
    val p = Ogg.page(0x02, 0x0102030405060708L, 0xdeadbeefL, 7L,
      Array.fill[Byte](300)(0x41)) // 300 = one 255 lacing + one 45
    assert(new String(p.take(4), "US-ASCII") == "OggS")
    assert(p(5) == 0x02)
    assert((p(6) & 0xff) == 0x08 && (p(13) & 0xff) == 0x01) // LE granule
    assert((p(26) & 0xff) == 2) // two lacing values
    assert((p(27) & 0xff) == 255 && (p(28) & 0xff) == 45)
    assert(p.length == 27 + 2 + 300)
    // exact-multiple payload gets the 0 terminator lacing value
    val q = Ogg.page(0, 0L, 1L, 0L, Array.fill[Byte](255)(1))
    assert((q(26) & 0xff) == 2 && (q(27) & 0xff) == 255 && (q(28) & 0xff) == 0)
  }

  test("opus round-trip: channels, pre-skip, input rate, granule duration") {
    for {
      ch <- Seq(1, 2, 8)
      rate <- Seq(48000, 44100, 8000)
      preSkip <- Seq(0, 312, 3840)
      pages <- Seq(1, 5)
    } {
      val gpp = 960L
      val b = Ogg.build("opus", ch, rate, preSkip, serial = 99L,
        dataPages = pages, granulePerPage = gpp)
      val m = Ogg.parseMeta(b).getOrElse(fail(s"parse failed ch=$ch"))
      assert(m.codec == "opus" && m.channels == ch && m.sampleRate == rate)
      assert(m.preSkip == preSkip)
      assert(m.nPages == 2 + pages)
      assert(m.granuleLast == gpp * pages + preSkip)
      // opus duration ticks at 48 kHz regardless of input rate
      assert(m.durationMs == gpp * pages * 1000L / 48000L)
      assert(m.serial == 99L && m.complete)
    }
  }

  test("vorbis round-trip: granules are samples at the stream rate") {
    val b = Ogg.build("vorbis", 2, 44100, 0, serial = 5L,
      dataPages = 4, granulePerPage = 22050L)
    val m = Ogg.parseMeta(b).get
    assert(m.codec == "vorbis" && m.channels == 2 && m.sampleRate == 44100)
    assert(m.preSkip == -1)
    assert(m.durationMs == 22050L * 4 * 1000 / 44100) // = 2000 ms
    assert(m.complete)
  }

  test("a truncated final page drops from the walk; complete goes false") {
    val full = Ogg.build("opus", 2, 48000, 100, 1L, 3, 960L)
    val m = Ogg.parseMeta(full.dropRight(5)).get
    assert(m.nPages == 2 + 2)
    assert(m.granuleLast == 960L * 2 + 100)
    assert(!m.complete)
  }

  test("a corrupt page CRC stops the walk at the prior page") {
    val full = Ogg.build("opus", 2, 48000, 100, 1L, 3, 960L)
    // flip one payload byte in the LAST page (find its start: walk
    // page totals)
    var p = 0
    var starts = List.empty[Int]
    while (p < full.length) {
      starts = p :: starts
      val nSegs = full(p + 26) & 0xff
      var pl = 0
      (0 until nSegs).foreach(i => pl += full(p + 27 + i) & 0xff)
      p += 27 + nSegs + pl
    }
    val corrupt = full.clone()
    corrupt(starts.head + 30) = (corrupt(starts.head + 30) ^ 0x7f).toByte
    val m = Ogg.parseMeta(corrupt).get
    assert(m.nPages == 4 && !m.complete)
  }

  test("honest None: not ogg, bad version, header-only, unknown codec") {
    assert(Ogg.parseMeta(null) == None)
    assert(Ogg.parseMeta("RIFFxxxx".getBytes("US-ASCII")) == None)
    val b = Ogg.build("opus", 2, 48000, 0, 1L, 1, 960L)
    val badVer = b.clone(); badVer(4) = 1
    assert(Ogg.parseMeta(badVer) == None)
    // unknown codec: a valid page whose first packet is not opus/vorbis
    val theora = Ogg.page(0x02, 0L, 1L, 0L,
      "theora-ish".getBytes("US-ASCII"))
    assert(Ogg.parseMeta(theora) == None)
    // header-only opus: no data page, duration null sentinel
    val hdrOnly = Ogg.build("opus", 2, 48000, 312, 1L, 0, 960L)
    // dataPages=0: last written page is the comment page (granule 0)
    val hm = Ogg.parseMeta(hdrOnly).get
    assert(hm.durationMs == -1L && hm.nPages == 2)
  }
}
