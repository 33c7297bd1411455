package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Pdf

class PdfSpec extends AnyFunSuite {

  test("classic xref round-trip across pages/encryption/title spellings") {
    for {
      nPages <- Seq(1, 3, 17)
      enc <- Seq(false, true)
      hex <- Seq(false, true)
    } {
      val b = Pdf.build("1.4", nPages, "My Títle", "An Author",
        "graft-pdf", encrypted = enc, hexTitle = hex)
      val m = Pdf.parseMeta(b).getOrElse(fail("parse failed"))
      assert(m.version == "1.4")
      assert(m.nPages == nPages)
      assert(m.xrefKind == "table")
      assert(m.encrypted == enc)
      assert(m.title == "My Títle") // hex and literal must agree
      assert(m.author == "An Author" && m.producer == "graft-pdf")
      assert(m.nObjects == 4 + nPages + (if (enc) 1 else 0))
    }
  }

  test("xref stream round-trip, plain and PNG-Up predicted") {
    for {
      pred <- Seq(false, true)
      nPages <- Seq(2, 9)
    } {
      val b = Pdf.build("1.7", nPages, "T", "A", "P", xrefStream = true,
        predictor = pred)
      val m = Pdf.parseMeta(b).get
      assert(m.xrefKind == "stream")
      assert(m.nPages == nPages)
      assert(m.nObjects == 5 + nPages) // + the xref stream object
      assert(m.title == "T" && !m.encrypted)
    }
  }

  test("literal-string escapes and nested parens survive") {
    val title = """ti(tle) with \ and ()nest"""
    val b = Pdf.build("1.5", 1, title, "a", "p")
    assert(Pdf.parseMeta(b).get.title == title)
  }

  test("honest None for non-PDF; version-only degradation for torn xref") {
    assert(Pdf.parseMeta(null) == None)
    assert(Pdf.parseMeta("GIF89a pretending".getBytes("US-ASCII")) == None)
    val good = Pdf.build("1.6", 4, "T", "A", "P")
    // corrupt the startxref offset: version survives, the rest nulls
    val s = new String(good, "ISO-8859-1")
    val torn = (s.substring(0, s.lastIndexOf("startxref")) +
      "startxref\n999999999\n%%EOF\n").getBytes("ISO-8859-1")
    val m = Pdf.parseMeta(torn).get
    assert(m.version == "1.6" && m.nPages == -1 && m.xrefKind == null)
    // truncation mid-xref: same degradation
    val cut = Pdf.parseMeta(good.take(good.length - 40)).get
    assert(cut.version == "1.6")
  }

  test("incremental update: the /Prev chain surfaces the newest /Info") {
    for (strm <- Seq(false, true); enc <- Seq(false, true)) {
      val base = Pdf.build("1.6", 3, "Old", "A", "P", xrefStream = strm,
        encrypted = enc)
      val upd = Pdf.buildIncremental(base, "New(er)")
      val m = Pdf.parseMeta(upd).get
      assert(m.title == "New(er)" && m.author == "updated")
      assert(m.xrefKind == "table") // the NEWEST section names the kind
      assert(m.nPages == 3) // catalog resolves through the prev hop
      assert(m.encrypted == enc) // the updater preserves /Encrypt
      assert(Pdf.parseMeta(base).get.title == "Old") // base unchanged
    }
  }

  test("hex strings: whitespace and odd nibble counts per spec") {
    // build a tiny PDF then splice is overkill — drive the dict parse
    // through a title built to exercise it: odd-length hex pads a 0
    val b = Pdf.build("1.4", 1, "AB", "a", "p", hexTitle = true)
    val s = new String(b, "ISO-8859-1")
    // 'AB' -> <4142>; rewrite as <41 42> (embedded whitespace is
    // legal) and reclaim the byte from the same object so every
    // recorded xref offset stays valid
    val spaced = s.replace("<4142>", "<41 42>")
      .replace("/Author (a)", "/Author(a)").getBytes("ISO-8859-1")
    assert(spaced.length == b.length)
    val m = Pdf.parseMeta(spaced).get
    assert(m.title == "AB" && m.author == "a")
  }
}
