package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.DecodeCharset

/** Byte-level pins for `decode_charset` — WHATWG label aliasing, the
  * windows-1252 index, UTF-16 surrogate/BOM/odd-tail handling, and
  * the never-throw contract.
  */
class DecodeCharsetSpec extends AnyFunSuite {

  private def dec(bytes: Array[Byte], cs: String): String =
    DecodeCharset.decode(bytes, UTF8String.fromString(cs)).toString

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("utf-8 passes through; BOM strips; unknown labels fall back to utf-8") {
    assert(dec("héllo".getBytes("UTF-8"), "utf-8") === "héllo")
    assert(dec(b(0xEF, 0xBB, 0xBF) ++ "x".getBytes("UTF-8"), "utf-8") === "x")
    assert(dec("plain".getBytes("UTF-8"), "Shift_JIS-ish-nonsense") === "plain")
    assert(dec("UTF8 ".getBytes("UTF-8"), "  UTF-8  ") === "UTF8 ")
  }

  test("windows-1252: the 0x80-0x9F index, Latin-1 block, C1 holes") {
    // € smart quotes é — the bytes real cp1252 pages carry
    assert(dec(b(0x80, 0x93, 0x61, 0x94, 0xE9), "windows-1252") ===
      "€“a”é")
    // the five "undefined" bytes map to their C1 controls per the index
    assert(dec(b(0x81, 0x8D, 0x8F, 0x90, 0x9D), "cp1252") ===
      "\u0081\u008D\u008F\u0090\u009D")
    // Ž ž Ÿ œ — the non-Latin-1 extensions
    assert(dec(b(0x8E, 0x9E, 0x9F, 0x9C), "windows-1252") === "ŽžŸœ")
  }

  test("iso-8859-1 and latin1 labels alias to windows-1252 (WHATWG)") {
    for (label <- Seq("iso-8859-1", "ISO-8859-1", "latin1", "l1", "cp819"))
      assert(dec(b(0x93, 0xE9, 0x94), label) === "“é”", label)
  }

  test("utf-16le/be: BOM strip, surrogate pairs, lone surrogates, odd tail") {
    val s = "aé😀z" // ascii, accented, astral, ascii
    assert(dec(s.getBytes("UTF-16LE"), "utf-16le") === s)
    assert(dec(s.getBytes("UTF-16BE"), "utf-16be") === s)
    // BOM-carrying payloads strip it under the explicit labels too
    assert(dec(b(0xFF, 0xFE, 0x61, 0x00), "utf-16le") === "a")
    assert(dec(b(0xFE, 0xFF, 0x00, 0x61), "utf-16be") === "a")
    // bare utf-16: BOM decides, LE default
    assert(dec(b(0xFE, 0xFF, 0x00, 0x62), "utf-16") === "b")
    assert(dec(b(0x62, 0x00), "utf-16") === "b")
    // lone high surrogate, lone low surrogate, odd trailing byte
    assert(dec(b(0x3D, 0xD8, 0x61, 0x00), "utf-16le") === "�a")
    assert(dec(b(0x00, 0xDC), "utf-16le") === "�")
    assert(dec(b(0x61, 0x00, 0x62), "utf-16le") === "a�")
  }

  test("registered SQL function + sniff-decode-extract chain end to end") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    val pages = Seq(
      // windows-1252 declared by transport header
      (1L, "text/html; charset=windows-1252",
        b(0x3C, 0x70, 0x3E) ++ b(0x93) ++ "ok".getBytes("US-ASCII") ++
          b(0x94, 0xE9) ++ b(0x3C, 0x2F, 0x70, 0x3E)),
      // utf-16le by BOM, no header
      (2L, null.asInstanceOf[String],
        b(0xFF, 0xFE) ++ "<p>hié</p>".getBytes("UTF-16LE")),
      (3L, "text/html", "<p>plain</p>".getBytes("UTF-8")))
      .toDF("id", "http_content_type", "payload")
    val got = pages.select($"id",
      graft.ops.HtmlExtract.decodePayload($"payload", $"http_content_type")
        .as("html"))
      .select($"id", graft.ops.HtmlExtract.extractText($"html").as("text"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, "“ok”é"), (2L, "hié"), (3L, "plain")))
    // and the bare SQL face
    val sql = spark.sql(
      "SELECT decode_charset(X'93E994', 'windows-1252') AS t").head.getString(0)
    assert(sql === "“é”")
  }
}
