package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Epub, Zip}

class EpubSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes("UTF-8")

  private def opf(spineIds: Seq[String]): String =
    """<?xml version="1.0"?><package>""" +
      "<metadata><dc:title>My &amp; Book</dc:title>" +
      "<dc:creator>An Author</dc:creator>" +
      "<dc:language>en</dc:language></metadata><manifest>" +
      """<item id="c0" href="c0.xhtml" media-type="application/xhtml+xml"/>""" +
      """<item id="c1" href="sub/c1.xhtml" media-type="application/xhtml+xml"/>""" +
      """<item id="css" href="s.css" media-type="text/css"/>""" +
      "</manifest><spine>" +
      spineIds.map(i => s"""<itemref idref="$i"/>""").mkString +
      "</spine></package>"

  private def epub(spineIds: Seq[String],
      dropChapter: Boolean = false): Array[Byte] = {
    val base = Seq(
      ("mimetype", b("application/epub+zip"), 0, false),
      ("META-INF/container.xml", b(
        """<container><rootfiles><rootfile full-path="OEBPS/content.opf"""" +
          """ media-type="application/oebps-package+xml"/></rootfiles>""" +
          "</container>"), 8, false),
      ("OEBPS/content.opf", b(opf(spineIds)), 8, false),
      ("OEBPS/c0.xhtml", b("<html><head><title>h</title></head>" +
        "<body><p>First &amp; ch.</p></body></html>"), 8, false))
    val ch1 = ("OEBPS/sub/c1.xhtml",
      b("<html><body><p>Second ch.</p></body></html>"), 8, false)
    Zip.build(if (dropChapter) base else base :+ ch1)
  }

  test("spine order governs; hrefs resolve against the OPF directory") {
    val fwd = Epub.parse(epub(Seq("c0", "c1"))).get
    assert(fwd.title == "My & Book" && fwd.creator == "An Author")
    assert(fwd.language == "en")
    assert(fwd.chapters == Seq("First & ch.", "Second ch."))
    val rev = Epub.parse(epub(Seq("c1", "c0"))).get
    assert(rev.chapters == Seq("Second ch.", "First & ch."))
  }

  test("a spine idref with no member (torn book) skips, not fails") {
    val m = Epub.parse(epub(Seq("c0", "c1"), dropChapter = true)).get
    assert(m.chapters == Seq("First & ch."))
    // unknown idref likewise
    assert(Epub.parse(epub(Seq("c0", "ghost"))).get.chapters
      == Seq("First & ch."))
  }

  test("honest None: not a zip, not an epub, no container") {
    assert(Epub.parse(null) == None)
    assert(Epub.parse(b("not a zip")) == None)
    val plain = Zip.build(Seq(("a.txt", b("x"), 8, false)))
    assert(Epub.parse(plain) == None)
    val noContainer = Zip.build(Seq(
      ("mimetype", b("application/epub+zip"), 0, false)))
    assert(Epub.parse(noContainer) == None)
  }
}
