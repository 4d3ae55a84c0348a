package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Leftmost URL match as one hand-rolled scan (r15): the per-domain cap
  * needs only the FIRST `https?://[A-Za-z0-9.-]+(?::[0-9]+)?(?:/[^\s]*)?`
  * match per document, but the builtin composition ran
  * `regexp_extract_all` TWICE (size + element_at), materializing every
  * URL in the document both times. This scan reproduces the
  * java.util.regex leftmost match exactly ([[PiiScan]] discipline):
  * the literal scheme is case-sensitive, `https?` needs no backtracking
  * (after consuming 's' the next char must be ':', never 's'), the host
  * run is maximal (`://` and `:port` characters are outside the host
  * class), the optional port consumes only `:` followed by >= 1 digit,
  * and the optional path takes `/` plus the maximal non-`\s` run (java
  * `\s` = the ASCII six). Returns NULL when no match — callers decide
  * the no-URL policy, exactly like `size(...) == 0`. */
object UrlScan {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isHost(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || isDigit(c) ||
      c == '.' || c == '-'

  /** Match end of the URL pattern anchored at `p`, or -1. */
  private def tryUrlAt(s: String, p: Int, n: Int): Int = {
    if (p + 4 > n || !s.regionMatches(p, "http", 0, 4)) return -1
    var q = p + 4
    if (q < n && s.charAt(q) == 's') q += 1
    if (q + 3 > n || s.charAt(q) != ':' || s.charAt(q + 1) != '/' ||
        s.charAt(q + 2) != '/') return -1
    q += 3
    val hs = q
    while (q < n && isHost(s.charAt(q))) q += 1
    if (q == hs) return -1
    if (q < n && s.charAt(q) == ':') {
      var d = q + 1
      while (d < n && isDigit(s.charAt(d))) d += 1
      if (d > q + 1) q = d
    }
    if (q < n && s.charAt(q) == '/') {
      q += 1
      while (q < n && !isWs(s.charAt(q))) q += 1
    }
    q
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def firstUrl(u: UTF8String): UTF8String = {
    val s = u.toString
    val n = s.length
    var i = 0
    while (i < n) {
      if (s.charAt(i) == 'h') {
        val e = tryUrlAt(s, i, n)
        if (e > 0) return UTF8String.fromString(s.substring(i, e))
      }
      i += 1
    }
    null
  }

  def firstUrlCol(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(FirstUrlExpr(Bridge.expression(c)))
  }
}

/** `first_url(text)` — leftmost URL or NULL; see [[UrlScan]]. */
case class FirstUrlExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"first_url requires a string argument, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(input: Any): Any =
    UrlScan.firstUrl(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlScan.firstUrl($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): FirstUrlExpr =
    copy(child = newChild)
  override def prettyName: String = "first_url"
}
