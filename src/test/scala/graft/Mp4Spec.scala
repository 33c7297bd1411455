package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Mp4
import graft.ops.Mp4.Track

class Mp4Spec extends AnyFunSuite {

  private val vid = Track("vide", 30000, 123456L, "avc1", width = 640, height = 360)
  private val aud = Track("soun", 48000, 987654L, "mp4a", channels = 2,
    sampleRate = 48000)

  test("hand-computed byte offsets of a constant stream hold") {
    val b = Mp4.build(1000, 60000L, Seq(vid))
    // ftyp: size 24 (8 header + major 4 + minor 4 + 2 compat brands)
    assert(((b(0) & 0xff) << 24 | (b(1) & 0xff) << 16 | (b(2) & 0xff) << 8 |
      (b(3) & 0xff)) == 24)
    assert(new String(b, 4, 4, "US-ASCII") == "ftyp")
    assert(new String(b, 8, 4, "US-ASCII") == "isom")
    // moov follows immediately
    assert(new String(b, 28, 4, "US-ASCII") == "moov")
    // mvhd is moov's first child; v0 payload: timescale at +12 of payload
    assert(new String(b, 36, 4, "US-ASCII") == "mvhd")
    val tsOff = 40 + 12
    val ts = ((b(tsOff) & 0xffL) << 24) | ((b(tsOff + 1) & 0xffL) << 16) |
      ((b(tsOff + 2) & 0xffL) << 8) | (b(tsOff + 3) & 0xffL)
    assert(ts == 1000L)
  }

  test("round-trip across version/largesize/unknown-box variants") {
    for {
      v1 <- Seq(false, true)
      large <- Seq(false, true)
      free <- Seq(false, true)
      tracks <- Seq(Seq(vid, aud), Seq(aud), Seq(vid), Seq(aud, aud, vid))
    } {
      val bytes = Mp4.build(90000, 450000L, tracks, version1 = v1,
        largeMoov = large, freeBox = free)
      val m = Mp4.parseMeta(bytes).getOrElse(
        fail(s"parse failed: v1=$v1 large=$large free=$free n=${tracks.size}"))
      assert(m.durationMs == 450000L * 1000 / 90000)
      assert(m.timescale == 90000L)
      assert(m.nTracks == tracks.size)
      assert(m.nVideo == tracks.count(_.kind == "vide"))
      assert(m.nAudio == tracks.count(_.kind == "soun"))
      if (tracks.exists(_.kind == "vide")) {
        assert(m.videoCodec == "avc1" && m.width == 640 && m.height == 360)
      } else assert(m.videoCodec == null && m.width == null)
      if (tracks.exists(_.kind == "soun")) {
        assert(m.audioCodec == "mp4a" && m.audioChannels == 2 &&
          m.audioRate == 48000)
      } else assert(m.audioCodec == null)
    }
  }

  test("version-1 64-bit duration exceeds the 32-bit range intact") {
    val big = 5_000_000_000L // > UInt32
    val m = Mp4.parseMeta(Mp4.build(1000, big, Seq(aud), version1 = true)).get
    assert(m.durationMs == big * 1000 / 1000)
  }

  test("malformed input returns None, never throws") {
    val good = Mp4.build(1000, 60000L, Seq(vid, aud))
    for (cut <- Seq(0, 4, 12, 40, good.length / 2, good.length - 3)) {
      assert(Mp4.parseMeta(good.take(cut)) == None, s"cut=$cut")
    }
    assert(Mp4.parseMeta(null) == None)
    assert(Mp4.parseMeta("not an mp4 at all........".getBytes) == None)
    // declared box size overrunning the buffer
    val lying = good.clone()
    lying(0) = 0x7f.toByte
    assert(Mp4.parseMeta(lying) == None)
  }

  test("fragmented: trun per-sample durations drive duration when mvhd is 0") {
    // video track timescale 600; 3 fragments x 10 samples x 30 ts
    val f = Mp4.buildFragmented(1000, Seq(vid), Map(1 -> 0),
      (1 to 3).map(_ => Mp4.FragRun(1, 10, sampleDurTs = Some(30))))
    val m = Mp4.parseMeta(f).get
    assert(m.nFragments == 3)
    assert(m.fragDurationMs == 3L * 10 * 30 * 1000 / vid.timescale)
    assert(m.durationMs == m.fragDurationMs.longValue(), "mvhd-0 fallback")
    assert(m.sidxDurationMs == null)
    assert(m.nVideo == 1 && m.videoCodec == "avc1")
  }

  test("fragmented: tfhd default beats trex default; trex fills the gap") {
    // frag 1 uses tfhd default 40, frag 2 falls through to trex 50
    val f = Mp4.buildFragmented(1000, Seq(vid), Map(1 -> 50), Seq(
      Mp4.FragRun(1, 8, tfhdDefaultTs = Some(40)),
      Mp4.FragRun(1, 8)))
    val m = Mp4.parseMeta(f).get
    assert(m.nFragments == 2)
    assert(m.fragDurationMs == (8L * 40 + 8L * 50) * 1000 / vid.timescale)
  }

  test("fragmented: sidx subsegment durations sum under the sidx timescale") {
    val f = Mp4.buildFragmented(1000, Seq(vid), Map(1 -> 30),
      Seq(Mp4.FragRun(1, 4)), sidx = Some((90000, Seq(180000, 90000, 45000))))
    val m = Mp4.parseMeta(f).get
    assert(m.sidxDurationMs == (180000L + 90000 + 45000) * 1000 / 90000)
    assert(m.nFragments == 1)
  }

  test("fragmented: a truncated moof is honest None, never a partial count") {
    val f = Mp4.buildFragmented(1000, Seq(vid), Map(1 -> 30),
      (1 to 3).map(_ => Mp4.FragRun(1, 5, sampleDurTs = Some(20))))
    for (cut <- Seq(f.length - 7, f.length - 100, f.length / 2))
      assert(Mp4.parseMeta(f.take(cut)) == None, s"cut=$cut")
  }

  test("videoMeta column seam: parsed and null rows coexist") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    val rows = Seq(
      (1L, Mp4.build(600, 1200L, Seq(vid, aud))),
      (2L, Array[Byte](1, 2, 3)),
      (3L, Mp4.build(600, 2400L, Seq(aud), version1 = true)))
    val out = Mp4.videoMeta(rows.toDF("id", "v"), "v")
      .selectExpr("id", "v_mp4.duration_ms", "v_mp4.n_video", "v_mp4.audio_rate")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
    assert(out == Set((1L, 2000L, 1, 48000), (2L, -1L, -1, -1),
      (3L, 4000L, 0, 48000)))
  }
}
