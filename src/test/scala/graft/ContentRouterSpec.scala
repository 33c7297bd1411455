package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ContentRouter

class ContentRouterSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes("UTF-8")

  test("magic dispatch for every family") {
    assert(ContentRouter.sniff(b("ID3xxxx")) == "mp3")
    assert(ContentRouter.sniff(Array(0xff, 0xfb, 0x90, 0x00)
      .map(_.toByte)) == "mp3")
    assert(ContentRouter.sniff(Array(0xff, 0xd8, 0xff, 0xe0)
      .map(_.toByte)) == "jpeg")
    assert(ContentRouter.sniff(b("fLaCxxxx")) == "flac")
    assert(ContentRouter.sniff(b("OggSxxxx")) == "ogg")
    assert(ContentRouter.sniff(b("%PDF-1.7")) == "pdf")
    assert(ContentRouter.sniff(Array[Byte]('P', 'K', 3, 4)) == "zip")
    assert(ContentRouter.sniff(Array(0x89, 'P', 'N', 'G')
      .map(_.toByte)) == "png")
    assert(ContentRouter.sniff(b("GIF89a")) == "gif")
    assert(ContentRouter.sniff(b("plain text é")) == "text")
  }

  test("strict UTF-8: overlong, bare continuation, cut sequence -> bin") {
    assert(ContentRouter.sniff(Array(0xc0, 0xaf, 0x20, 0x20)
      .map(_.toByte)) == "bin") // overlong 2-byte form
    assert(ContentRouter.sniff(Array(0x80, 0x20, 0x20, 0x20)
      .map(_.toByte)) == "bin") // bare continuation
    assert(ContentRouter.sniff(b("abcd") ++ Array(0xe4.toByte))
      == "bin") // 3-byte lead cut at EOF
    assert(ContentRouter.sniff(Array(0xf5, 0x80, 0x80, 0x80)
      .map(_.toByte)) == "bin") // beyond U+10FFFF lead
  }
}
