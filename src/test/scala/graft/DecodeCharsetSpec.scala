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

  test("a BOM OVERRIDES the label (WHATWG decode), including endianness") {
    // LE mark under a BE label: decode LE, mark stripped (the r12
    // behavior consumed the mark but kept decoding BE — mojibake)
    assert(dec(b(0xFF, 0xFE, 0x61, 0x00), "utf-16be") === "a")
    assert(dec(b(0xFE, 0xFF, 0x00, 0x61), "utf-16le") === "a")
    // utf-8 mark under a legacy label
    assert(dec(b(0xEF, 0xBB, 0xBF) ++ "é".getBytes("UTF-8"), "windows-1252")
      === "é")
    assert(dec(b(0xFF, 0xFE, 0x61, 0x00), "shift_jis") === "a")
  }

  test("CJK families route through the JVM decoders (WHATWG labels)") {
    val jp = "日本語のテキスト"
    assert(dec(jp.getBytes("windows-31j"), "shift_jis") === jp)
    assert(dec(jp.getBytes("windows-31j"), "Shift-JIS") === jp)
    assert(dec(jp.getBytes("windows-31j"), "x-sjis") === jp)
    assert(dec(jp.getBytes("EUC-JP"), "euc-jp") === jp)
    assert(dec(jp.getBytes("ISO-2022-JP"), "iso-2022-jp") === jp)
    val zh = "简体中文测试"
    assert(dec(zh.getBytes("GBK"), "gbk") === zh)
    assert(dec(zh.getBytes("GBK"), "gb2312") === zh) // WHATWG alias
    assert(dec(zh.getBytes("GB18030"), "gb18030") === zh)
    val tw = "繁體中文測試"
    assert(dec(tw.getBytes("Big5"), "big5") === tw)
    val kr = "한국어 텍스트"
    assert(dec(kr.getBytes("x-windows-949"), "euc-kr") === kr)
    assert(dec(kr.getBytes("x-windows-949"), "ks_c_5601-1987") === kr)
    // windows-31j superset codepoints (NEC/IBM extensions) — the
    // reason shift_jis maps to windows-31j, not the narrow JVM SJIS
    assert(dec(b(0x87, 0x40), "shift_jis") === "①")
  }

  test("legacy single-byte families: cyrillic, greek, thai, turkish") {
    val ru = "русский текст"
    assert(dec(ru.getBytes("windows-1251"), "windows-1251") === ru)
    assert(dec(ru.getBytes("KOI8-R"), "koi8-r") === ru)
    assert(dec(ru.getBytes("ISO-8859-5"), "cyrillic") === ru)
    val el = "ελληνικά"
    assert(dec(el.getBytes("windows-1253"), "cp1253") === el)
    assert(dec(el.getBytes("ISO-8859-7"), "greek") === el)
    val th = "ภาษาไทย"
    assert(dec(th.getBytes("x-windows-874"), "windows-874") === th)
    assert(dec(th.getBytes("x-windows-874"), "tis-620") === th)
    val tr = "ğüşöçİı"
    // WHATWG: iso-8859-9 aliases to windows-1254
    assert(dec(tr.getBytes("windows-1254"), "iso-8859-9") === tr)
    assert(dec("žāļū".getBytes("ISO-8859-13"), "iso-8859-13") === "žāļū")
    assert(dec("œŸ€".getBytes("ISO-8859-15"), "iso-8859-15") === "œŸ€")
  }

  test("malformed bytes under a routed label become U+FFFD, never a throw") {
    // 0x82 opens a two-byte shift_jis sequence; 0xFF can't close it
    val got = dec(b(0x61, 0x82, 0xFF, 0x62), "shift_jis")
    assert(got.startsWith("a") && got.endsWith("b") && got.contains("�"))
    assert(dec(b(0x80), "gb18030").contains("�"))
  }

  test("replacement-encoding labels decode the whole stream to one U+FFFD") {
    assert(dec("anything at all".getBytes("UTF-8"), "iso-2022-kr") === "�")
    assert(dec("x".getBytes("UTF-8"), "hz-gb-2312") === "�")
    assert(dec(Array.empty[Byte], "iso-2022-kr") === "")
  }

  test("x-user-defined maps high bytes to the U+F780 block") {
    assert(dec(b(0x61, 0x80, 0xFF), "x-user-defined") === "a")
  }

  test("isKnownLabel separates routed labels from the utf-8 fallback") {
    for (l <- Seq("utf-8", "windows-1252", "ASCII", "utf-16", "shift_jis",
        "gb18030", "euc-kr", "koi8-r", "iso-8859-7", "x-user-defined",
        "iso-2022-kr"))
      assert(DecodeCharset.isKnownLabel(l), l)
    for (l <- Seq("klingon-1", "utf-9", "x-ebcdic-ish", ""))
      assert(!DecodeCharset.isKnownLabel(l), l)
  }

  test("charset_detect: the recovery ladder over planted fixtures") {
    def det(bytes: Array[Byte]): (String, Long) = {
      val r = graft.expr.CharsetDetect.detect(bytes)
      (if (r.isNullAt(0)) null else r.getUTF8String(0).toString, r.getLong(1))
    }
    val ru = "\u0440\u0443\u0441\u0441\u043a\u0438\u0439 \u0442\u0435\u043a\u0441\u0442 \u0432 \u0438\u043d\u0442\u0435\u0440\u043d\u0435\u0442\u0435"
    // strict utf-8 first (pure ASCII included)
    assert(det("plain ascii page 123".getBytes("UTF-8"))._1 === "utf-8")
    assert(det((ru + " r7").getBytes("UTF-8"))._1 === "utf-8")
    // BOMs are definitive
    assert(det(Array(0xEF, 0xBB, 0xBF, 0x41).map(_.toByte))._1 === "utf-8")
    assert(det(Array(0xFF, 0xFE, 0x41, 0x00).map(_.toByte))._1 === "utf-16le")
    assert(det(Array(0xFE, 0xFF, 0x00, 0x41).map(_.toByte))._1 === "utf-16be")
    // single-byte Cyrillic: BOTH layouts, distinguished by case+frequency
    assert(det((ru + " r7").getBytes("windows-1251"))._1 === "windows-1251")
    assert(det((ru + " r7").getBytes("KOI8-R"))._1 === "koi8-r")
    // multibyte structure + typicality
    val ja = "\u30c6\u30b9\u30c8\u30c7\u30fc\u30bf\u3067\u3059"
    val ja2 = "\u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8\u3067\u3059"
    val zh = "\u7b80\u4f53\u4e2d\u6587\u6570\u636e"
    val ko = "\ud55c\uad6d\uc5b4 \ub370\uc774\ud130 \ud14c\uc2a4\ud2b8"
    assert(det((ja + " j7").getBytes("Shift_JIS"))._1 === "shift_jis")
    assert(det((ja2 + " e7").getBytes("EUC-JP"))._1 === "euc-jp")
    assert(det((zh + " g7").getBytes("GBK"))._1 === "gbk")
    assert(det((ko + " k7").getBytes("EUC-KR"))._1 === "euc-kr")
    val tw = "\u7e41\u9ad4\u4e2d\u6587\u8cc7\u6599\u5eab\u7cfb\u7d71"
    assert(det((tw + " b7").getBytes("Big5"))._1 === "big5")
    // confidence is a real number in [0, 1e6] and recovery is confident
    val (_, conf) = det((ru + " r7").getBytes("windows-1251"))
    assert(conf >= 300000L && conf <= 1000000L)
    // junk stays quarantined: label null, confidence low
    val junk = Array(0x81, 0x00, 0x9F, 0xFF, 0x07, 0x03, 0x81, 0x00, 0xFE,
      0x11).map(_.toByte)
    val (jl, jc) = det(junk)
    assert(jl === null)
    assert(jc < 300000L)
    // KOI8-R text must never read as half-width-katakana Shift_JIS
    // (the 0xA1-0xDF singles are byte-identical) — typicality gates it
    assert(det((ru + " r7").getBytes("KOI8-R"))._1 !== "shift_jis")
    // empty payload: utf-8, trivially
    assert(det(Array.emptyByteArray)._1 === "utf-8")
  }

  test("charset_detect feeds decode_charset: recovered text round-trips") {
    def detLabel(bytes: Array[Byte]): String = {
      val r = graft.expr.CharsetDetect.detect(bytes)
      if (r.isNullAt(0)) null else r.getUTF8String(0).toString
    }
    val ru = "\u0440\u0443\u0441\u0441\u043a\u0438\u0439 \u0442\u0435\u043a\u0441\u0442 \u0432 \u0438\u043d\u0442\u0435\u0440\u043d\u0435\u0442\u0435"
    for (cs <- Seq("windows-1251", "KOI8-R")) {
      val bytes = (ru + " r7").getBytes(cs)
      val label = detLabel(bytes)
      assert(dec(bytes, label) === ru + " r7", cs)
    }
    val ja = "\u30c6\u30b9\u30c8\u30c7\u30fc\u30bf\u3067\u3059"
    val sjis = (ja + " j7").getBytes("Shift_JIS")
    assert(dec(sjis, detLabel(sjis)) === ja + " j7")
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
