package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Mpeg

class MpegSpec extends AnyFunSuite {

  test("hand-computed header bytes of a constant stream hold") {
    val b = Mpeg.build(frames = 2, samplerateIdx = 0, bitrateIdx = 9) // 128 kbps
    assert((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfb)
    assert(((b(2) >> 4) & 0x0f) == 9)      // bitrate index
    assert(((b(2) >> 2) & 0x03) == 0)      // 44100
    // frame length 144000*128/44100 = 417 (floor): second sync at 417
    assert((b(417) & 0xff) == 0xff && (b(418) & 0xff) == 0xfb)
    assert(b.length == 834)
  }

  test("round-trip across samplerate/bitrate/id3/junk/channel variants") {
    for {
      sr <- 0 to 2
      br <- Seq(1, 8, 14)
      id3 <- Seq(-1, 0, 257)
      junk <- Seq(0, 5)
      stereo <- Seq(true, false)
    } {
      val frames = 7
      val bytes = Mpeg.build(frames, sr, br, stereo, id3, junk)
      val m = Mpeg.parseMeta(bytes).getOrElse(
        fail(s"parse failed sr=$sr br=$br id3=$id3 junk=$junk"))
      assert(m.nFrames == frames)
      assert(m.sampleRate == Mpeg.SampleRate(sr))
      assert(m.bitrateKbps == Mpeg.BitrateKbps(br))
      assert(m.channels == (if (stereo) 2 else 1))
      assert(m.durationMs == frames.toLong * 1152 * 1000 / Mpeg.SampleRate(sr))
      assert(m.id3Bytes == (if (id3 >= 0) 10 + id3 else 0))
    }
  }

  test("a truncated final frame drops from the count; mid-stream desync stops the walk") {
    val full = Mpeg.build(5, 0, 9)
    val frameLen = full.length / 5
    val m = Mpeg.parseMeta(full.take(full.length - 7)).get
    assert(m.nFrames == 4)
    // corrupt the third frame's sync: walk stops at 2
    val corrupt = full.clone()
    corrupt(2 * frameLen) = 0x00
    assert(Mpeg.parseMeta(corrupt).get.nFrames == 2)
  }

  test("garbage, empty, and sync-free input return None") {
    assert(Mpeg.parseMeta(null) == None)
    assert(Mpeg.parseMeta(Array[Byte](1, 2, 3)) == None)
    assert(Mpeg.parseMeta(Array.fill[Byte](500)(0x20)) == None)
    // an ID3 header with nothing after it
    val id3Only = Mpeg.build(0, 0, 9, id3Size = 40)
    assert(Mpeg.parseMeta(id3Only) == None)
  }

  test("audioMeta column seam: parsed and null rows coexist") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    val rows = Seq(
      (1L, Mpeg.build(10, 1, 9)),              // 48000 Hz
      (2L, Array[Byte](9, 9, 9)),
      (3L, Mpeg.build(4, 0, 14, id3Size = 64)))
    val out = Mpeg.audioMeta(rows.toDF("id", "a"), "a")
      .selectExpr("id", "a_mp3.n_frames", "a_mp3.duration_ms", "a_mp3.id3_bytes")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
    assert(out == Set(
      (1L, 10, 10L * 1152 * 1000 / 48000, 0),
      (2L, -1, -1L, -1),
      (3L, 4, 4L * 1152 * 1000 / 44100, 74)))
  }
}
