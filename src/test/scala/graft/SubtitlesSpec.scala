package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Subtitles

class SubtitlesSpec extends AnyFunSuite {

  private val srt =
    """1
      |00:00:01,000 --> 00:00:03,500
      |Hello <i>world</i>
      |second line
      |
      |2
      |00:00:04,000 --> 00:00:06,000
      |Bye
      |""".stripMargin

  private val vtt =
    """WEBVTT - demo
      |Kind: captions
      |
      |NOTE
      |a comment block
      |spanning lines
      |
      |c1
      |00:00:01.000 --> 00:00:03.500 align:start position:10%
      |Hello <c.yellow>world</c>
      |
      |01:10.000 --> 01:12.250
      |Short-stamp cue
      |""".stripMargin

  test("SRT: indexes, comma stamps, multi-line text, tag strip") {
    val m = Subtitles.parse(srt).get
    assert(m.kind == "srt" && m.nCues == 2)
    assert(m.firstStartMs == 1000 && m.lastEndMs == 6000)
    assert(m.speechMs == 2500 + 2000)
    assert(m.textChars == "Hello world\nsecond line".length + "Bye".length)
  }

  test("VTT: header meta, NOTE blocks, cue ids, settings, short stamps") {
    val m = Subtitles.parse(vtt).get
    assert(m.kind == "vtt" && m.nCues == 2)
    assert(m.firstStartMs == 1000)
    assert(m.lastEndMs == 70000 + 2250)
    assert(m.speechMs == 2500 + 2250)
    assert(m.textChars == "Hello world".length + "Short-stamp cue".length)
  }

  test("karaoke timestamps and nested tags strip from text") {
    val s = "00:00:01,000 --> 00:00:02,000\na<00:00:01.500>b <b><i>c</i></b>\n"
    val m = Subtitles.parse(s).get
    assert(m.textChars == "ab c".length)
  }

  test("a torn time line stops the walk; prior cues survive") {
    val s = srt + "\n3\n00:00:XX broken\ntext\n"
    val m = Subtitles.parse(s).get
    assert(m.nCues == 2 && m.lastEndMs == 6000)
  }

  test("honest None for non-subtitles; empty VTT keeps the kind") {
    assert(Subtitles.parse(null) == None)
    assert(Subtitles.parse("not a subtitle file\nat all") == None)
    assert(Subtitles.parse("{\"json\": true}") == None)
    val empty = Subtitles.parse("WEBVTT\n\n").get
    assert(empty.kind == "vtt" && empty.nCues == 0 && empty.speechMs == 0)
  }
}
