package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Ooxml, Zip}

class OoxmlSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes("UTF-8")

  private def docx(bodyXml: String) = Zip.build(Seq(
    ("[Content_Types].xml", b("<Types/>"), 8, false),
    ("word/document.xml", b(
      s"""<?xml version="1.0"?><w:document><w:body>$bodyXml</w:body>""" +
        "</w:document>"), 8, false)))

  test("docx: runs concatenate, tabs/breaks literal, entities decode") {
    val z = docx(
      "<w:p><w:r><w:t>Hello</w:t></w:r><w:r><w:tab/></w:r>" +
        "<w:r><w:t xml:space=\"preserve\"> a &amp; b &lt;tag&gt;</w:t>" +
        "</w:r></w:p>" +
        "<w:p><w:r><w:t>line1</w:t><w:br/><w:t>line2</w:t></w:r></w:p>" +
        "<w:p/>")
    val ps = Ooxml.docxParagraphs(z).get
    assert(ps == Seq("Hello\t a & b <tag>", "line1\nline2", ""))
  }

  test("numeric entities and entity-in-entity decode correctly") {
    val z = docx("<w:p><w:r><w:t>&#65;&#x42; &amp;lt; stays</w:t></w:r></w:p>")
    // &amp;lt; must decode to the LITERAL '&lt;', never to '<'
    assert(Ooxml.docxParagraphs(z).get == Seq("AB &lt; stays"))
  }

  test("xlsx: shared strings in order, rich-text runs concatenate") {
    val z = Zip.build(Seq(
      ("[Content_Types].xml", b("<Types/>"), 8, false),
      ("xl/sharedStrings.xml", b(
        "<sst><si><t>plain</t></si>" +
          "<si><r><t>rich</t></r><r><t xml:space=\"preserve\"> part</t>" +
          "</r></si></sst>"), 8, false)))
    assert(Ooxml.xlsxStrings(z).get == Seq("plain", "rich part"))
  }

  test("honest None: not a zip, member missing, wrong kind") {
    assert(Ooxml.docxParagraphs(b("not a zip")) == None)
    val plainZip = Zip.build(Seq(("a.txt", b("x"), 8, false)))
    assert(Ooxml.docxParagraphs(plainZip) == None)
    assert(Ooxml.xlsxStrings(plainZip) == None)
  }
}
