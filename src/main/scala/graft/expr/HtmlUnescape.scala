package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `html_unescape(s)` — HTML character-reference decoding as a
  * codegen'd scalar expression: numeric decimal (`&#233;`), numeric
  * hex (`&#x27;` / `&#X27;`), and a bounded table of the named
  * entities crawl text actually contains (the HTML 4 Latin-1 set plus
  * the common punctuation/symbol references — see
  * [[HtmlUnescape.Named]]).
  *
  * Single-pass left-to-right, the semantics real HTML parsers share:
  * after a reference decodes, scanning resumes AFTER it, so
  * `&amp;lt;` yields the literal text `&lt;` — never double-decoded.
  * Anything that does not parse as a reference — unknown name, bad
  * digits, missing `;`, bare `&`, codepoint out of Unicode range or a
  * surrogate — passes through as literal text, the right failure mode
  * for crawl bytes (a decoder that drops or throws on the web's
  * malformed tail corrupts more than it fixes). Semicolon-terminated
  * references only: the legacy bare-`&amp`-style forms are ambiguous
  * (they swallow following text) and rare in post-2000 markup.
  *
  * `&nbsp;` decodes to the real U+00A0 (callers that want whitespace
  * semantics, e.g. [[graft.ops.HtmlExtract.extractText]], fold it into
  * the space class explicitly — decode and whitespace policy are
  * separate concerns).
  *
  * Scale shape: pure scan-side expression (no UDF, no shuffle), one
  * allocation only when the input actually contains `&`; ASCII-safe
  * byte scan on the UTF8String. Replayable cross-engine: each specific
  * reference's decode is deterministic, so a DuckDB oracle replays a
  * fixture's gauntlet as chr()/replace chains (q146).
  */
case class HtmlUnescape(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_unescape requires a STRING argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "html_unescape"

  override protected def nullSafeEval(input: Any): Any =
    HtmlUnescape.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.HtmlUnescape.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlUnescape =
    copy(child = newChild)
}

object HtmlUnescape {

  /** Bounded named-entity table: the 5 XML predefined + nbsp, the full
    * HTML 4 Latin-1 block (accented letters crawls in European
    * languages hit constantly), and the general-punctuation / symbol
    * set (smart quotes, dashes, ellipsis, currency, math comparisons).
    * Deliberately NOT the full HTML5 list (2k+ names, mostly math
    * alphabets never seen in crawl text) — unknown names stay literal,
    * which is also what a validating decoder reports for them.
    */
  val Named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](256)
    def put(name: String, cp: Int): Unit = m.put(name, new String(Character.toChars(cp)))
    // XML core + nbsp
    put("amp", '&'); put("lt", '<'); put("gt", '>')
    put("quot", '"'); put("apos", '\''); put("nbsp", 0xA0)
    // HTML 4 Latin-1 supplement (ISO 8859-1 0xA1-0xFF, standard names)
    val latin1 = Seq(
      "iexcl" -> 0xA1, "cent" -> 0xA2, "pound" -> 0xA3, "curren" -> 0xA4,
      "yen" -> 0xA5, "brvbar" -> 0xA6, "sect" -> 0xA7, "uml" -> 0xA8,
      "copy" -> 0xA9, "ordf" -> 0xAA, "laquo" -> 0xAB, "not" -> 0xAC,
      "shy" -> 0xAD, "reg" -> 0xAE, "macr" -> 0xAF, "deg" -> 0xB0,
      "plusmn" -> 0xB1, "sup2" -> 0xB2, "sup3" -> 0xB3, "acute" -> 0xB4,
      "micro" -> 0xB5, "para" -> 0xB6, "middot" -> 0xB7, "cedil" -> 0xB8,
      "sup1" -> 0xB9, "ordm" -> 0xBA, "raquo" -> 0xBB, "frac14" -> 0xBC,
      "frac12" -> 0xBD, "frac34" -> 0xBE, "iquest" -> 0xBF,
      "Agrave" -> 0xC0, "Aacute" -> 0xC1, "Acirc" -> 0xC2, "Atilde" -> 0xC3,
      "Auml" -> 0xC4, "Aring" -> 0xC5, "AElig" -> 0xC6, "Ccedil" -> 0xC7,
      "Egrave" -> 0xC8, "Eacute" -> 0xC9, "Ecirc" -> 0xCA, "Euml" -> 0xCB,
      "Igrave" -> 0xCC, "Iacute" -> 0xCD, "Icirc" -> 0xCE, "Iuml" -> 0xCF,
      "ETH" -> 0xD0, "Ntilde" -> 0xD1, "Ograve" -> 0xD2, "Oacute" -> 0xD3,
      "Ocirc" -> 0xD4, "Otilde" -> 0xD5, "Ouml" -> 0xD6, "times" -> 0xD7,
      "Oslash" -> 0xD8, "Ugrave" -> 0xD9, "Uacute" -> 0xDA, "Ucirc" -> 0xDB,
      "Uuml" -> 0xDC, "Yacute" -> 0xDD, "THORN" -> 0xDE, "szlig" -> 0xDF,
      "agrave" -> 0xE0, "aacute" -> 0xE1, "acirc" -> 0xE2, "atilde" -> 0xE3,
      "auml" -> 0xE4, "aring" -> 0xE5, "aelig" -> 0xE6, "ccedil" -> 0xE7,
      "egrave" -> 0xE8, "eacute" -> 0xE9, "ecirc" -> 0xEA, "euml" -> 0xEB,
      "igrave" -> 0xEC, "iacute" -> 0xED, "icirc" -> 0xEE, "iuml" -> 0xEF,
      "eth" -> 0xF0, "ntilde" -> 0xF1, "ograve" -> 0xF2, "oacute" -> 0xF3,
      "ocirc" -> 0xF4, "otilde" -> 0xF5, "ouml" -> 0xF6, "divide" -> 0xF7,
      "oslash" -> 0xF8, "ugrave" -> 0xF9, "uacute" -> 0xFA, "ucirc" -> 0xFB,
      "uuml" -> 0xFC, "yacute" -> 0xFD, "thorn" -> 0xFE, "yuml" -> 0xFF)
    // punctuation / symbols (HTML 4 "special" + frequent symbols)
    val special = Seq(
      "OElig" -> 0x152, "oelig" -> 0x153, "Scaron" -> 0x160, "scaron" -> 0x161,
      "Yuml" -> 0x178, "fnof" -> 0x192, "circ" -> 0x2C6, "tilde" -> 0x2DC,
      "ensp" -> 0x2002, "emsp" -> 0x2003, "thinsp" -> 0x2009,
      "ndash" -> 0x2013, "mdash" -> 0x2014,
      "lsquo" -> 0x2018, "rsquo" -> 0x2019, "sbquo" -> 0x201A,
      "ldquo" -> 0x201C, "rdquo" -> 0x201D, "bdquo" -> 0x201E,
      "dagger" -> 0x2020, "Dagger" -> 0x2021, "bull" -> 0x2022,
      "hellip" -> 0x2026, "permil" -> 0x2030, "prime" -> 0x2032,
      "Prime" -> 0x2033, "lsaquo" -> 0x2039, "rsaquo" -> 0x203A,
      "oline" -> 0x203E, "frasl" -> 0x2044, "euro" -> 0x20AC,
      "trade" -> 0x2122, "larr" -> 0x2190, "uarr" -> 0x2191,
      "rarr" -> 0x2192, "darr" -> 0x2193, "harr" -> 0x2194,
      "minus" -> 0x2212, "lowast" -> 0x2217, "radic" -> 0x221A,
      "infin" -> 0x221E, "cap" -> 0x2229, "cup" -> 0x222A,
      "ne" -> 0x2260, "equiv" -> 0x2261, "le" -> 0x2264, "ge" -> 0x2265)
    (latin1 ++ special).foreach { case (n, cp) => put(n, cp) }
    m
  }

  /** Static entry shared by the interpreted and generated paths. Fast
    * path: no `&` byte → the input passes through untouched (no String
    * materialization) — on real pages most VALUES (post-strip text
    * chunks) contain no reference at all.
    */
  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = str.indexOf('&')
    if (i < 0) return s
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    sb.append(str, 0, i)
    while (i < n) {
      val c = str.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val end = decodeAt(str, i, sb)
        if (end > i) i = end
        else { sb.append('&'); i += 1 }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Try to decode one reference starting at `str(at) == '&'`; on
    * success append the replacement and return the index AFTER the
    * `;`, else return `at` (caller emits the literal `&`).
    */
  private def decodeAt(str: String, at: Int, sb: java.lang.StringBuilder): Int = {
    val n = str.length
    var j = at + 1
    if (j >= n) return at
    if (str.charAt(j) == '#') {
      j += 1
      var hex = false
      if (j < n && (str.charAt(j) == 'x' || str.charAt(j) == 'X')) { hex = true; j += 1 }
      val digitsStart = j
      var cp = 0L
      while (j < n && j - digitsStart <= 7 && isDigit(str.charAt(j), hex)) {
        cp = cp * (if (hex) 16 else 10) + digitVal(str.charAt(j))
        j += 1
      }
      // require 1..7 digits, a closing ';', a valid non-surrogate
      // scalar value; NUL (0) is invalid in HTML, keep it literal too
      if (j == digitsStart || j - digitsStart > 7 || j >= n || str.charAt(j) != ';')
        return at
      if (cp <= 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) return at
      sb.appendCodePoint(cp.toInt)
      j + 1
    } else {
      val nameStart = j
      while (j < n && j - nameStart <= 10 && isAlnum(str.charAt(j))) j += 1
      if (j == nameStart || j >= n || str.charAt(j) != ';') return at
      val rep = Named.get(str.substring(nameStart, j))
      if (rep == null) return at
      sb.append(rep)
      j + 1
    }
  }

  private def isDigit(c: Char, hex: Boolean): Boolean =
    (c >= '0' && c <= '9') ||
      (hex && ((c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))
  private def digitVal(c: Char): Int =
    if (c <= '9') c - '0'
    else if (c >= 'a') c - 'a' + 10
    else c - 'A' + 10
  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
}
