package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `decode_charset(payload, charset)` — fetched payload BYTES to text
  * under a sniffed charset label: the consumer of
  * [[graft.ops.HtmlExtract.sniffCharset]]'s verdict (r11 verdict ask
  * #2 — detection existed, nothing applied it, so non-UTF-8 crawl
  * HTML extracted as mojibake).
  *
  * Supported labels, per the WHATWG Encoding spec's label table — the
  * set that covers real crawl HTML:
  *   - `utf-8` (+ ascii aliases): pass-through with BOM strip;
  *   - `windows-1252` and every latin1-family label (`iso-8859-1`,
  *     `latin1`, `cp1252`, ...): decoded by the WHATWG windows-1252
  *     index — the spec ALIASES iso-8859-1 to windows-1252, the
  *     behavior browsers (and therefore faithful corpora) exhibit;
  *     the five undefined bytes map to their C1 controls, exactly as
  *     the published index says;
  *   - `utf-16le` / `utf-16be` / bare `utf-16` (BOM decides, LE
  *     default): code-unit pairs, surrogate pairs combined, unpaired
  *     surrogates and odd tail bytes to U+FFFD — never a throw;
  *   - any other label: utf-8 pass-through (the decoder must not kill
  *     a 100 TB job over one exotic page; the label survives in the
  *     sniff column for auditing).
  *
  * Scale shape: scan-side scalar, codegen'd via a static call; one
  * output allocation per row; no UDF, no shuffle. Deterministic
  * byte-in/text-out, so a DuckDB oracle replays planted fixtures
  * analytically (q166).
  */
case class DecodeCharset(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "decode_charset requires (BINARY payload, STRING charset), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = StringType
  override def prettyName: String = "decode_charset"

  override protected def nullSafeEval(payload: Any, charset: Any): Any =
    DecodeCharset.decode(payload.asInstanceOf[Array[Byte]],
      charset.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, c) => s"graft.expr.DecodeCharset.decode($p, $c)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DecodeCharset = copy(left = newLeft, right = newRight)
}

object DecodeCharset {

  /** WHATWG windows-1252 index for bytes 0x80-0x9F (0xA0-0xFF are the
    * identity Latin-1 block). Published spec data, shared by every
    * conforming decoder.
    */
  private val Cp1252Hi: Array[Char] = Array(
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178
  ).map(_.toChar)

  def decode(bytes: Array[Byte], label: UTF8String): UTF8String = {
    val cs = label.toString.trim.toLowerCase(java.util.Locale.ROOT)
    cs match {
      case "windows-1252" | "cp1252" | "x-cp1252" | "iso-8859-1" |
          "iso8859-1" | "iso_8859-1" | "latin1" | "l1" | "cp819" =>
        cp1252(bytes)
      case "utf-16le" => utf16(bytes, bigEndian = false, sniffBom = true)
      case "utf-16be" => utf16(bytes, bigEndian = true, sniffBom = true)
      case "utf-16" => // BOM decides; LE is the WHATWG default
        if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
          utf16(bytes, bigEndian = true, sniffBom = true)
        else utf16(bytes, bigEndian = false, sniffBom = true)
      case _ => utf8(bytes) // utf-8 family and every unknown label
    }
  }

  private def utf8(b: Array[Byte]): UTF8String =
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
        b(2) == 0xBF.toByte)
      UTF8String.fromBytes(b, 3, b.length - 3)
    else UTF8String.fromBytes(b)

  private def cp1252(b: Array[Byte]): UTF8String = {
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xFF
      if (v < 0x80) sb.append(v.toChar)
      else if (v < 0xA0) sb.append(Cp1252Hi(v - 0x80))
      else sb.append(v.toChar) // Latin-1 identity block
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private def utf16(b: Array[Byte], bigEndian: Boolean,
      sniffBom: Boolean): UTF8String = {
    var i = 0
    if (sniffBom && b.length >= 2) {
      val bom = ((b(0) & 0xFF) << 8) | (b(1) & 0xFF)
      if (bom == 0xFEFF || bom == 0xFFFE) i = 2 // either-order BOM strips
    }
    val sb = new java.lang.StringBuilder((b.length - i) / 2 + 1)
    while (i + 1 < b.length) {
      val u =
        if (bigEndian) (((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)).toChar
        else (((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)).toChar
      i += 2
      if (Character.isHighSurrogate(u) && i + 1 < b.length) {
        val lo =
          if (bigEndian) (((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)).toChar
          else (((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)).toChar
        if (Character.isLowSurrogate(lo)) { sb.append(u).append(lo); i += 2 }
        else sb.append('�') // unpaired high surrogate
      } else if (Character.isSurrogate(u)) {
        sb.append('�') // unpaired either way
      } else sb.append(u)
    }
    if (i < b.length) sb.append('�') // odd trailing byte
    UTF8String.fromString(sb.toString)
  }
}
