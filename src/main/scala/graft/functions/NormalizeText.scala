package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Corpus text normalization as ONE native codegen expression: Unicode
  * NFC composition, non-whitespace control-character removal (C0 minus
  * TAB/LF/VT/FF/CR, plus DEL), whitespace-run collapse to a single
  * space, and edge trim — the standard first cleaning pass of an LLM
  * data pipeline (mojibake-safe comparisons, stable token counts,
  * dedup-friendly byte streams).
  *
  * Everything after NFC is one fused scan of the string (no
  * intermediate regex passes), inside whole-stage codegen like
  * [[Fnv1a64]]. The semantics are deliberately mirrorable in ANSI SQL:
  * `trim(regexp_replace(regexp_replace(nfc_normalize(t),
  * '[\x00-\x08\x0e-\x1f\x7f]', '', 'g'), '[\t\n\x0b\f\r ]+', ' ',
  * 'g'))` — the `text_normalize` oracle states exactly that.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"normalize_text requires a string argument, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object NormalizeText {

  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def isStrippedControl(c: Char): Boolean =
    (c < 0x20 && !isSpace(c)) || c == 0x7f

  /** Static entry point shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      if (isSpace(c)) pendingSpace = true
      else if (!isStrippedControl(c)) {
        if (pendingSpace && started) sb.append(' ')
        sb.append(c)
        started = true
        pendingSpace = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Wrap as a user-facing Column (Spark 4 Column-node bridge). */
  def normalizeText(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NormalizeText(Bridge.expression(c)))
  }
}
