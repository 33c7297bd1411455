package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Zip

class ZipSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes("UTF-8")

  test("round-trip: entries, sizes, stored+deflate member reads") {
    val members = Seq(
      ("a/one.txt", b("hello zip world " * 10), 8, false),
      ("two.bin", b("stored bytes"), 0, false),
      ("dir/three.txt", b("x"), 8, false))
    val z = Zip.build(members)
    val m = Zip.parseMeta(z).getOrElse(fail("parse failed"))
    assert(m.nEntries == 3 && m.kind == "zip" && !m.encrypted && !m.zip64)
    assert(m.totalUncomp == members.map(_._2.length.toLong).sum)
    members.zip(m.entries).foreach { case ((name, content, _, _), e) =>
      assert(e.name == name)
      assert(e.uncompSize == content.length)
      assert(Zip.readMember(z, e).get.sameElements(content))
    }
  }

  test("kind detection: epub (stored mimetype), docx, xlsx, jar") {
    val epub = Zip.build(Seq(
      ("mimetype", b("application/epub+zip"), 0, false),
      ("META-INF/container.xml", b("<c/>"), 8, false)))
    val me = Zip.parseMeta(epub).get
    assert(me.kind == "epub" && me.mimetype == "application/epub+zip")
    // a DEFLATED mimetype is not the epub contract -> plain zip
    val fake = Zip.build(Seq(("mimetype", b("application/epub+zip"), 8, false)))
    assert(Zip.parseMeta(fake).get.kind == "zip")
    assert(Zip.parseMeta(Zip.build(Seq(
      ("[Content_Types].xml", b("<T/>"), 8, false),
      ("word/document.xml", b("<w/>"), 8, false)))).get.kind == "docx")
    assert(Zip.parseMeta(Zip.build(Seq(
      ("[Content_Types].xml", b("<T/>"), 8, false),
      ("xl/workbook.xml", b("<x/>"), 8, false)))).get.kind == "xlsx")
    assert(Zip.parseMeta(Zip.build(Seq(
      ("META-INF/MANIFEST.MF", b("Manifest-Version: 1.0\n"), 8, false),
      ("A.class", b("Êþ"), 0, false)))).get.kind == "jar")
  }

  test("encrypted flag surfaces; the member read refuses, others work") {
    val z = Zip.build(Seq(
      ("open.txt", b("readable"), 8, false),
      ("secret.txt", b("ciphered!"), 0, true)))
    val m = Zip.parseMeta(z).get
    assert(m.encrypted && m.nEntries == 2)
    assert(m.totalUncomp == 8 + 9) // declared sizes count either way
    assert(Zip.readMember(z, m.entries.head).get.sameElements(b("readable")))
    assert(Zip.readMember(z, m.entries(1)) == None)
  }

  test("zip64: sentinel EOCD routes through the locator and EOCD64") {
    val z = Zip.build(Seq(("big.txt", b("not actually big"), 8, false)),
      forceZip64 = true)
    val m = Zip.parseMeta(z).get
    assert(m.zip64 && m.nEntries == 1)
    assert(Zip.readMember(z, m.entries.head).get
      .sameElements(b("not actually big")))
  }

  test("EOCD found through a comment; honest None when absent or torn") {
    val z = Zip.build(Seq(("a.txt", b("aa"), 0, false)),
      comment = "trailing archive comment, quite long " * 10)
    assert(Zip.parseMeta(z).get.nEntries == 1)
    assert(Zip.parseMeta(null) == None)
    assert(Zip.parseMeta(b("PK but no directory")) == None)
    val torn = Zip.build(Seq(("a.txt", b("aa"), 0, false)))
    assert(Zip.parseMeta(torn.take(torn.length - 4)) == None)
    // truncated member DATA: directory intact, read returns None
    val cut = Zip.build(Seq(("a.txt", b("hello hello hello"), 0, false)))
    val m2 = Zip.parseMeta(cut).get
    val short = java.util.Arrays.copyOf(cut, 20) // local header cut
    assert(Zip.readMember(short, m2.entries.head) == None)
  }
}
