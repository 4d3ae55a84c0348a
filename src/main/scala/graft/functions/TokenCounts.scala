package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Both corpus token counts in ONE fused scan (r15): the whitespace
  * count (`size(split(trim(text), "\s+"))`) and the BPE-ish pre-token
  * count (`size(regexp_extract_all(text, "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"))`)
  * — the builtin compositions MATERIALIZE an array of every token /
  * pre-token string per document just to take its length. This
  * expression counts both in a single allocation-free character loop
  * (the [[PiiScan]] discipline), bit-identical to the builtins:
  *
  *  - ws: fields of the TRIMMED text split on `\s+` runs. Spark's
  *    split runs java's `split(regex, -1)` — leading AND trailing
  *    empty fields are KEPT — so the count is (number of `\s+` runs
  *    in the space-trimmed text) + 1: "" counts 1, "\t" counts 2,
  *    exactly like the builtin (spec-caught: Spark trim strips only
  *    0x20 spaces, and limit=-1 differs from bare java split);
  *  - bpe: leftmost-match runs of the alternation — a letter run, a
  *    digit run, or ONE other non-space char; java `\s` here is the
  *    ASCII six ([ \t\n\x0B\f\r]), no Unicode spaces.
  *
  * Both oracles replay the original regex formulations; CorpusSpec
  * pins bit-equality on adversarial fixtures. */
object TokenCounts {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  def counts(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length
    // bpe over the whole text (whitespace never matches the alternation):
    // letter run | digit run | one other non-space char
    var bpe = 0
    var i = 0
    while (i < n) {
      val d = s.charAt(i)
      if (isWs(d)) i += 1
      else {
        bpe += 1
        if (isAlpha(d)) { while (i < n && isAlpha(s.charAt(i))) i += 1 }
        else if (isDigit(d)) { while (i < n && isDigit(s.charAt(i))) i += 1 }
        // ONE code point, not one UTF-16 char: java regex classes match
        // code points, so a supplementary char (emoji, rare CJK — a
        // surrogate PAIR here) is a single `[^a-zA-Z0-9\s]` match
        // (r16 advice: the char-stepping loop counted it twice)
        else i += Character.charCount(s.codePointAt(i))
      }
    }
    // ws replicates size(split(trim(text), "\s+")) EXACTLY: Spark's trim
    // strips 0x20 SPACES only (not \t/\n), and Spark's split runs with
    // limit = -1 — leading AND trailing empty fields are KEPT — so the
    // field count is simply (number of \s+ runs in the trimmed text) + 1.
    var lo = 0; var hi = n
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    var ws = 1
    i = lo
    while (i < hi) {
      if (isWs(s.charAt(i))) { ws += 1; while (i < hi && isWs(s.charAt(i))) i += 1 }
      else i += 1
    }
    new GenericInternalRow(Array[Any](ws, bpe))
  }

  val structType: StructType = StructType(Seq(
    StructField("ws", IntegerType, nullable = false),
    StructField("bpe", IntegerType, nullable = false)))

  def col(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(TokenCountsExpr(Bridge.expression(c)))
  }
}

/** `token_counts(text)` -> struct(ws, bpe) — see [[TokenCounts]]. */
case class TokenCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TokenCounts.structType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_counts requires a string argument, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(input: Any): Any =
    TokenCounts.counts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCounts.counts($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenCountsExpr =
    copy(child = newChild)
  override def prettyName: String = "token_counts"
}
