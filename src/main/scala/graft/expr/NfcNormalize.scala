package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a codegen'd
  * scalar expression — the first step of text canonicalization in a
  * curation pipeline: crawls mix precomposed and decomposed forms of
  * the same grapheme (e + U+0301 vs é), and every downstream equality —
  * exact dedup fingerprints, shingles, token counts — silently treats
  * them as different documents unless normalized scan-side.
  *
  * NFC is a published Unicode standard (UAX #15), so independent
  * implementations agree byte-for-byte — the property the q92 oracle
  * leans on: the JDK's `java.text.Normalizer` here, ICU inside DuckDB's
  * `nfc_normalize` there, identical output.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a STRING argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NfcNormalize.norm($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by the interpreted and generated paths. ASCII
    * fast path: NFC is the identity on ASCII (no combining marks, no
    * composition targets), and crawl text is overwhelmingly ASCII —
    * skip the String round-trip entirely unless a high byte appears.
    */
  def norm(s: UTF8String): UTF8String = {
    if (s.isFullAscii) s
    else {
      val str = s.toString
      val out = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
      // avoid re-encoding when already composed
      if (out eq str) s else UTF8String.fromString(out)
    }
  }
}
