package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML/markup strip as four fused character scans (r15): replaces the
  * 8-pass regexp chain of [[TextFunctions.stripMarkup]] —
  * script/style block removal, comment removal, tag removal, the five
  * fixed entities, whitespace collapse + edge trim — with hand-rolled
  * scans that reproduce each java.util.regex pass EXACTLY (the
  * [[PiiScan]] discipline; the builtin chain stays as the spec twin
  * and the oracle formulation):
  *
  *  1. `(?is)<(script|style)\b[^>]*>.*?</(script|style)\s*>` -> " " —
  *     the open tag's `[^>]*` is bounded by the FIRST '>' (backtracking
  *     a shorter length would demand '>' at a position known non-'>'),
  *     the `\b` after the word uses the JDK's Unicode
  *     isLetterOrDigit-on-code-points test, `.*?` takes the EARLIEST
  *     closing tag (which may mismatch the opening kind, exactly like
  *     the independent regex groups), case-insensitive in ASCII.
  *  2. `(?s)<!--.*?-->` -> " " — earliest "-->" at or after open+4.
  *  3. `(?s)<[^>]*>` -> " " — each '<' to its first following '>'.
  *  4. entities (&lt; &gt; &quot; &#39; &amp; — one scan; replacements
  *     are single non-entity, non-space chars, so one left-to-right
  *     scan equals the builtin's five sequential passes) fused with
  *     `trim(regexp_replace(_, "\s+", " "))` (non-space runs joined by
  *     single spaces; Spark's space-only trim then drops the edge
  *     singles — NormalizeText's collapse shape).
  */
object StripMarkup {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  @inline private def isWordAt(s: String, idx: Int): Boolean = {
    val cp = s.codePointAt(idx)
    cp == '_' || Character.isLetterOrDigit(cp)
  }

  /** Case-insensitive "script"/"style" at `p`; returns the index after
    * the word, or -1. */
  private def tagWordEnd(s: String, p: Int): Int = {
    val n = s.length
    def matches(w: String): Boolean = {
      if (p + w.length > n) return false
      var i = 0
      while (i < w.length) {
        if (lower(s.charAt(p + i)) != w.charAt(i)) return false
        i += 1
      }
      true
    }
    if (matches("script")) p + 6
    else if (matches("style")) p + 5
    else -1
  }

  /** Pass 1: script/style blocks -> " ". */
  private def stripBlocks(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0; var last = 0
    while (i < n) {
      if (s.charAt(i) != '<') i += 1
      else {
        var matchEnd = -1
        val we = tagWordEnd(s, i + 1)
        // \b after the word: next char must be a non-word code point
        // (EOS fails later at the required '>')
        if (we > 0 && we < n && !isWordAt(s, we)) {
          val gt = s.indexOf('>', we)
          if (gt >= 0) {
            // earliest closing tag at or after the open tag's end
            var j = gt + 1
            while (matchEnd < 0 && j < n - 2) {
              if (s.charAt(j) == '<' && s.charAt(j + 1) == '/') {
                val cwe = tagWordEnd(s, j + 2)
                if (cwe > 0) {
                  var k = cwe
                  while (k < n && isWs(s.charAt(k))) k += 1
                  if (k < n && s.charAt(k) == '>') matchEnd = k + 1
                }
              }
              if (matchEnd < 0) j += 1
            }
          }
        }
        if (matchEnd > 0) {
          sb.append(s, last, i).append(' ')
          last = matchEnd
          i = matchEnd
        } else i += 1
      }
    }
    if (last == 0) s else { sb.append(s, last, n); sb.toString }
  }

  /** Pass 2: comments -> " ". */
  private def stripComments(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0; var last = 0
    while (i >= 0) {
      i = s.indexOf("<!--", i)
      if (i >= 0) {
        val close = s.indexOf("-->", i + 4)
        if (close >= 0) {
          sb.append(s, last, i).append(' ')
          last = close + 3
          i = close + 3
        } else i = -1
      }
    }
    if (last == 0) s else { sb.append(s, last, s.length); sb.toString }
  }

  /** Pass 3: any remaining tag -> " ". */
  private def stripTags(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0; var last = 0
    while (i >= 0) {
      i = s.indexOf('<', i)
      if (i >= 0) {
        val gt = s.indexOf('>', i + 1)
        if (gt >= 0) {
          sb.append(s, last, i).append(' ')
          last = gt + 1
          i = gt + 1
        } else i = -1
      }
    }
    if (last == 0) s else { sb.append(s, last, s.length); sb.toString }
  }

  private val Entities: Array[(String, Char)] = Array(
    "&lt;" -> '<', "&gt;" -> '>', "&quot;" -> '"', "&#39;" -> '\'',
    "&amp;" -> '&')

  /** Pass 4: entities + whitespace collapse + edge trim, one scan. */
  private def entitiesAndCollapse(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var started = false
    def emit(c: Char): Unit = {
      if (pendingSpace && started) sb.append(' ')
      sb.append(c)
      started = true
      pendingSpace = false
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) { pendingSpace = true; i += 1 }
      else if (c == '&') {
        var hit = -1
        var e = 0
        while (hit < 0 && e < Entities.length) {
          val (ent, _) = Entities(e)
          if (s.regionMatches(i, ent, 0, ent.length)) hit = e
          e += 1
        }
        if (hit >= 0) { emit(Entities(hit)._2); i += Entities(hit)._1.length }
        else { emit(c); i += 1 }
      } else { emit(c); i += 1 }
    }
    sb.toString
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def strip(u: UTF8String): UTF8String =
    UTF8String.fromString(
      entitiesAndCollapse(stripTags(stripComments(stripBlocks(u.toString)))))

  def col(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(StripMarkupExpr(Bridge.expression(c)))
  }
}

/** `strip_markup(text)` — see [[StripMarkup]]. */
case class StripMarkupExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"strip_markup requires a string argument, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(input: Any): Any =
    StripMarkup.strip(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StripMarkup.strip($c)")
  override protected def withNewChildInternal(newChild: Expression): StripMarkupExpr =
    copy(child = newChild)
  override def prettyName: String = "strip_markup"
}
