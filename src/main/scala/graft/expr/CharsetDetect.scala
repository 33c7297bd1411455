package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType,
  StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `charset_detect(payload)` — content-based charset recovery for the
  * quarantined tail (r13 verdict ask #6): pages whose label is absent
  * or unrecognized (`decoded_ok = 0`) previously stayed utf-8
  * pass-through forever; this expression proposes a label from the
  * BYTES alone, so curation can recover much of the unlabeled tail
  * instead of just flagging it. Returns
  * `struct(label string, confidence_ppm long)` — `label` is null when
  * no candidate clears the confidence bar (the page STAYS quarantined;
  * a wrong recovery is worse than none).
  *
  * Decision ladder, all deterministic integer arithmetic:
  *   1. BOM → that encoding, full confidence.
  *   2. strict UTF-8 validity (overlongs, surrogates, truncated
  *      sequences all rejected — unlike the lenient decode path) →
  *      `utf-8`. Pure ASCII is valid UTF-8 and stays `utf-8`.
  *   3. multibyte STRUCTURE: shift_jis / euc-jp / euc-kr / gbk / big5
  *      walkers demand full-stream legality — any odd-length high-byte
  *      run (every real single-byte-charset text has one: a word with
  *      an odd letter count followed by an ASCII space breaks the pair
  *      grammar) disqualifies — then rank survivors by TYPICALITY, the
  *      share of pairs in each encoding's common zone (kana rows,
  *      level-1 kanji, hangul, GB2312 hanzi, Big5 common block). The
  *      hangul zone is a subset of the GB2312 zone, so ties prefer the
  *      tighter zone. Half-width-katakana-only Shift_JIS scores zero
  *      typicality by design: the 0xA1-0xDF singles are byte-identical
  *      to KOI8-R Cyrillic text, and mislabeling Russian as Japanese
  *      is the worse error.
  *   4. single-byte FREQUENCY: windows-1251 / koi8-r / windows-1252
  *      candidates decode via the JVM and score by letter-frequency
  *      weight (Russian and Latin tables), a lowercase-dominance
  *      factor (cp1251 and koi8-r both map high bytes to Cyrillic, but
  *      each sees the other's LOWERCASE as scrambled uppercase), a
  *      script-coherence factor, and control/U+FFFD penalties. The
  *      winner needs both an absolute floor and a 1.5x margin over the
  *      runner-up; otherwise label = null.
  *
  * Labels returned are WHATWG-canonical and route through
  * [[DecodeCharset]] (`utf-8`, `utf-16le/be`, `shift_jis`, `euc-jp`,
  * `euc-kr`, `gbk`, `big5`, `windows-1251`, `koi8-r`, `windows-1252`).
  * Scale shape: scan-side scalar over quarantined rows only (the
  * decoded_ok = 0 subset), codegen'd static call, no shuffle.
  */
case class CharsetDetect(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"charset_detect requires a BINARY payload, got ${child.dataType.catalogString}")

  override def dataType: DataType = CharsetDetect.Schema
  override def prettyName: String = "charset_detect"

  override protected def nullSafeEval(payload: Any): Any =
    CharsetDetect.detect(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.expr.CharsetDetect.detect($p)")

  override protected def withNewChildInternal(newChild: Expression): CharsetDetect =
    copy(child = newChild)
}

object CharsetDetect {

  val Schema: StructType = StructType(Seq(
    StructField("label", StringType, nullable = true),
    StructField("confidence_ppm", LongType, nullable = false)))

  private def row(label: String, ppm: Long): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](if (label == null) null else UTF8String.fromString(label), ppm))

  // ------------------------------------------------------------- utf-8

  /** Strict UTF-8 validity: rejects overlong forms, surrogates,
    * out-of-range code points and truncated tails — stricter than the
    * decode path's replace-on-malformed, because here validity IS the
    * evidence.
    */
  private[graft] def validUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c < 0xC2) return false // continuation or overlong lead
      else if (c < 0xE0) { // 2-byte
        if (i + 1 >= b.length || (b(i + 1) & 0xC0) != 0x80) return false
        i += 2
      } else if (c < 0xF0) { // 3-byte
        if (i + 2 >= b.length) return false
        val t1 = b(i + 1) & 0xFF
        if ((t1 & 0xC0) != 0x80 || (b(i + 2) & 0xC0) != 0x80) return false
        if (c == 0xE0 && t1 < 0xA0) return false // overlong
        if (c == 0xED && t1 >= 0xA0) return false // surrogate
        i += 3
      } else if (c < 0xF5) { // 4-byte
        if (i + 3 >= b.length) return false
        val t1 = b(i + 1) & 0xFF
        if ((t1 & 0xC0) != 0x80 || (b(i + 2) & 0xC0) != 0x80 ||
            (b(i + 3) & 0xC0) != 0x80) return false
        if (c == 0xF0 && t1 < 0x90) return false // overlong
        if (c == 0xF4 && t1 >= 0x90) return false // > U+10FFFF
        i += 4
      } else return false
      ()
    }
    true
  }

  // -------------------------------------------- multibyte structure

  /** Full-stream legality walk result: `units` = double-byte pairs (+
    * single katakana for shift_jis), `typical` = pairs in the
    * encoding's common zone.
    */
  private final class Walk(var legal: Boolean = true, var units: Int = 0,
    var typical: Int = 0)

  private def okAsciiish(c: Int): Boolean =
    c == 0x09 || c == 0x0A || c == 0x0D || (c >= 0x20 && c < 0x7F)

  private def walkPairs(b: Array[Byte], isLead: Int => Boolean,
      isTrail: Int => Boolean, isTypical: (Int, Int) => Boolean,
      isSingle: Int => Boolean = _ => false,
      singleTypical: Boolean = false): Walk = {
    val w = new Walk()
    var i = 0
    while (i < b.length && w.legal) {
      val c = b(i) & 0xFF
      if (c < 0x80) {
        if (!okAsciiish(c)) w.legal = false
        i += 1
      } else if (isSingle(c)) {
        w.units += 1
        if (singleTypical) w.typical += 1
        i += 1
      } else if (isLead(c)) {
        if (i + 1 >= b.length) { w.legal = false }
        else {
          val t = b(i + 1) & 0xFF
          if (isTrail(t)) {
            w.units += 1
            if (isTypical(c, t)) w.typical += 1
            i += 2
          } else w.legal = false
        }
      } else { w.legal = false }
    }
    w
  }

  // -------------------------------------------- single-byte frequency

  /** Russian lowercase letter-frequency weights (published frequency
    * tables, scaled to integers).
    */
  private val RuFreq: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer]()
    val w = Seq('о' -> 3000, 'е' -> 2800, 'а' -> 2700, 'и' -> 2600,
      'н' -> 2500, 'т' -> 2400, 'с' -> 2300, 'р' -> 2200, 'в' -> 2100,
      'л' -> 2000, 'к' -> 1800, 'м' -> 1700, 'д' -> 1600, 'п' -> 1500,
      'у' -> 1400, 'я' -> 1200, 'ы' -> 1100, 'ь' -> 1000, 'г' -> 950,
      'з' -> 900, 'б' -> 850, 'ч' -> 800, 'й' -> 700, 'х' -> 600,
      'ж' -> 500, 'ш' -> 450, 'ю' -> 400, 'ц' -> 350, 'щ' -> 300,
      'э' -> 250, 'ф' -> 220, 'ъ' -> 200, 'ё' -> 200)
    w.foreach { case (c, v) => m.put(c, v) }
    m
  }

  /** English/Western lowercase weights + a flat weight for the common
    * accented Latin-1 letters.
    */
  private val LatFreq: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer]()
    val w = Seq('e' -> 3000, 't' -> 2700, 'a' -> 2600, 'o' -> 2500,
      'i' -> 2400, 'n' -> 2300, 's' -> 2200, 'h' -> 2000, 'r' -> 2000,
      'd' -> 1500, 'l' -> 1400, 'u' -> 1000, 'c' -> 950, 'm' -> 900,
      'f' -> 700, 'w' -> 650, 'g' -> 600, 'y' -> 600, 'p' -> 550,
      'b' -> 500, 'v' -> 400, 'k' -> 350, 'j' -> 250, 'x' -> 220,
      'q' -> 200, 'z' -> 200)
    w.foreach { case (c, v) => m.put(c, v) }
    "àáâãäåæçèéêëìíîïñòóôõöùúûüýßœš".foreach(c => m.put(c, 700))
    m
  }

  private def freqOf(lower: Char): Int = {
    val r = RuFreq.get(lower)
    if (r != null) return r.intValue()
    val l = LatFreq.get(lower)
    if (l != null) l.intValue() else 150 // a letter, but off-model
  }

  /** Average milli-weight of `text` under the frequency/case/coherence
    * model; higher = more plausible human text.
    */
  private def textScore(text: String): Long = {
    if (text.isEmpty) return 0L
    var s = 0L
    var n = 0
    var cyr = 0
    var lat = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      if (ch == '�' || (Character.isISOControl(ch) &&
          ch != '\t' && ch != '\n' && ch != '\r')) {
        s -= 3000; n += 1
      } else if (Character.isLetter(ch)) {
        val base = freqOf(Character.toLowerCase(ch))
        s += (if (Character.isLowerCase(ch)) base else base / 4).toLong
        n += 1
        val blk = Character.UnicodeBlock.of(ch)
        if (blk == Character.UnicodeBlock.CYRILLIC) cyr += 1
        else if (blk == Character.UnicodeBlock.BASIC_LATIN ||
          blk == Character.UnicodeBlock.LATIN_1_SUPPLEMENT) lat += 1
      } else if (ch == ' ' || Character.isDigit(ch) || ch == '.' ||
          ch == ',' || ch == '-' || ch == '\'' || ch == '"' || ch == '!' ||
          ch == '?' || ch == ':' || ch == ';') {
        s += 350; n += 1
      } else { s -= 200; n += 1 } // symbol soup is evidence against
      i += 1
    }
    val avg = s / n
    // one coherent script reads as text; an even Latin/Cyrillic mix
    // reads as a wrong-charset artifact
    val letters = cyr + lat
    if (letters == 0) avg
    else avg * (500L + 500L * math.max(cyr, lat) / letters) / 1000L
  }

  private val SingleByteCandidates: Seq[(String, java.nio.charset.Charset)] =
    Seq("windows-1251" -> java.nio.charset.Charset.forName("windows-1251"),
      "koi8-r" -> java.nio.charset.Charset.forName("KOI8-R"),
      "windows-1252" -> java.nio.charset.Charset.forName("windows-1252"))

  // ------------------------------------------------------------ detect

  def detect(bytes: Array[Byte]): InternalRow = {
    if (bytes.length == 0) return row("utf-8", 1000000L)
    // BOMs are definitive
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
        bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return row("utf-8", 1000000L)
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return row("utf-16be", 1000000L)
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return row("utf-16le", 1000000L)
    if (validUtf8(bytes)) return row("utf-8", 1000000L)

    // multibyte structure; tie order matters (hangul zone is a subset
    // of the GB2312 zone, kana zones are disjoint from both)
    val mb = Seq(
      "shift_jis" -> walkPairs(bytes,
        c => (c >= 0x81 && c <= 0x9F) || (c >= 0xE0 && c <= 0xFC),
        t => t >= 0x40 && t <= 0xFC && t != 0x7F,
        (c, _) => c >= 0x82 && c <= 0x9F,
        c => c >= 0xA1 && c <= 0xDF, singleTypical = false),
      // typical = KANA leads only: the kanji zone overlaps hangul and
      // GB2312, but real Japanese text always carries kana and Korean/
      // Chinese text never does — the one unambiguous signal
      "euc-jp" -> walkPairs(bytes,
        c => (c >= 0xA1 && c <= 0xFE) || c == 0x8E,
        t => t >= 0xA1 && t <= 0xFE,
        (c, _) => c >= 0xA4 && c <= 0xA5),
      "euc-kr" -> walkPairs(bytes,
        c => c >= 0x81 && c <= 0xFE,
        t => (t >= 0x41 && t <= 0x5A) || (t >= 0x61 && t <= 0x7A) ||
          (t >= 0x81 && t <= 0xFE),
        (c, t) => c >= 0xB0 && c <= 0xC8 && t >= 0xA1),
      "gbk" -> walkPairs(bytes,
        c => c >= 0x81 && c <= 0xFE,
        t => t >= 0x40 && t <= 0xFE && t != 0x7F,
        (c, t) => c >= 0xB0 && c <= 0xF7 && t >= 0xA1),
      // typical = LOW-half trails: EUC-family bytes never trail below
      // 0xA1, while real Big5 text lands in the 0x40-0x7E trail half
      // for roughly a third of its pairs — the one signal Big5 has
      // that EUC text cannot fake (double-weighted below accordingly)
      "big5" -> walkPairs(bytes,
        c => c >= 0xA1 && c <= 0xF9,
        t => (t >= 0x40 && t <= 0x7E) || (t >= 0xA1 && t <= 0xFE),
        (c, t) => c >= 0xA4 && c <= 0xC6 && t <= 0x7E))
    mb.find(_._1 == "big5").foreach { case (_, w) =>
      w.typical = math.min(w.units, w.typical * 2)
    }
    val legalMb = mb.filter { case (_, w) => w.legal && w.units >= 4 }
    if (legalMb.nonEmpty) {
      val (label, w) = legalMb.maxBy { case (_, ww) =>
        1000L * ww.typical / ww.units } // stable order breaks exact ties
      val typ = 1000L * w.typical / w.units
      if (typ >= 500)
        return row(label, math.min(1000000L, 600000L + 400L * typ))
    }

    // single-byte frequency models
    val scored = SingleByteCandidates.map { case (label, cs) =>
      (label, textScore(new String(bytes, cs)))
    }.sortBy(-_._2)
    val (bestLabel, best) = scored.head
    val second = scored(1)._2
    val conf = math.max(0L, math.min(1000000L,
      300000L + (best - math.max(second, 0L)) * 400L))
    // absolute floor AND a 1.5x margin over the runner-up: a wrong
    // recovery is worse than staying quarantined
    if (best >= 900L && (second <= 0L || best * 2 >= second * 3))
      row(bestLabel, conf)
    else row(null, math.max(0L, math.min(conf, 299999L)))
  }
}
