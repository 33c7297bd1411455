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

  test("untagged CBR: avg equals the frame-exact rate, vbr false, no declared") {
    val m = Mpeg.parseMeta(Mpeg.build(9, 0, 9)).get
    val flen = 144000 * Mpeg.BitrateKbps(9) / Mpeg.SampleRate(0)
    assert(m.avgBitrateKbps ==
      (9L * flen * 8 * 44100 / (9L * 1152 * 1000)).toInt)
    assert(!m.vbr && m.declaredFrames == -1)
  }

  test("untagged VBR: the walk itself reports the honest average") {
    val idxs = Seq(8, 14, 8, 14, 8, 14) // 112/320 alternating at 44100
    val bytes = Mpeg.buildTagged(idxs, 0, stereo = true, tag = "none")
    val m = Mpeg.parseMeta(bytes).get
    assert(m.nFrames == 6 && m.vbr && m.declaredFrames == -1)
    assert(m.bitrateKbps == 112) // first frame, the old (dishonest) value
    val tot = idxs.map(b => 144000 * Mpeg.BitrateKbps(b) / 44100).sum.toLong
    assert(m.avgBitrateKbps == (tot * 8 * 44100 / (6L * 1152 * 1000)).toInt)
    assert(m.avgBitrateKbps > 150 && m.avgBitrateKbps < 320) // between the two
  }

  test("Xing tag: declared frames/bytes drive the average; Info means CBR") {
    for (stereo <- Seq(true, false)) {
      val idxs = Seq(8, 10, 12, 14)
      val bytes = Mpeg.buildTagged(idxs, 1, stereo, tag = "xing")
      val m = Mpeg.parseMeta(bytes).get
      def flen(b: Int) = 144000 * Mpeg.BitrateKbps(b) / 48000
      val declBytes = (flen(8) + idxs.map(flen).sum).toLong
      assert(m.nFrames == 5, "walk includes the tag frame") // 1 tag + 4 audio
      assert(m.declaredFrames == 4 && m.vbr, s"stereo=$stereo")
      assert(m.avgBitrateKbps ==
        (declBytes * 8 * 48000 / (4L * 1152 * 1000)).toInt)
    }
    val info = Mpeg.parseMeta(
      Mpeg.buildTagged(Seq(9, 9, 9), 0, stereo = true, tag = "info")).get
    assert(!info.vbr && info.declaredFrames == 3)
  }

  test("VBRI tag parses at its fixed offset") {
    val idxs = Seq(14, 8, 14)
    val m = Mpeg.parseMeta(
      Mpeg.buildTagged(idxs, 2, stereo = true, tag = "vbri")).get
    def flen(b: Int) = 144000 * Mpeg.BitrateKbps(b) / 32000
    val declBytes = (flen(14) + idxs.map(flen).sum).toLong
    assert(m.vbr && m.declaredFrames == 3 && m.nFrames == 4)
    assert(m.avgBitrateKbps ==
      (declBytes * 8 * 32000 / (3L * 1152 * 1000)).toInt)
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
