package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string — the canonical-composition
  * step every text pipeline needs before hashing, deduplication, or
  * tokenization (the same logical text arrives as composed é U+00E9
  * from one source and decomposed e+U+0301 from another; un-normalized,
  * exact dedup misses them and token counts disagree). Spark ships no
  * normalization function, so this is a native Catalyst expression
  * over `java.text.Normalizer` (JDK-built-in, no dependency) with
  * `doGenCode` so the cleaning pipeline stays inside whole-stage
  * codegen — the [[PolyHash]] pattern.
  *
  * Determinism note: normalization is defined by the Unicode standard
  * and STABLE for assigned codepoints (Unicode's normalization
  * stability policy), so JDK and DuckDB (`nfc_normalize`) agree on
  * everything the corpus can contain; the q217 oracle leans on that.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NfcNormalize.nfc(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
          graft.functions.NfcNormalize.nfc($c));
      """
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted and generated paths. A fast-path check
    * (`isNormalized`) skips the rebuild for already-NFC text — the
    * overwhelmingly common case on real corpora.
    */
  def nfc(s: UTF8String): String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) str
    else java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
  }

  import org.apache.spark.sql.graft.bridge
  def nfc_normalize(c: Column): Column =
    bridge.column(NfcNormalize(bridge.expression(c)))
}
