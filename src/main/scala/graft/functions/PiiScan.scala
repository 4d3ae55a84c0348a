package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass PII scan (r15, the r14 verdict's #1): the
  * email / IPv4 / phone detect-and-redact pipeline as hand-rolled
  * character scans instead of six `java.util.regex` traversals.
  *
  * The reference scrub (`text_pii` / `text_redact`) is a sequential
  * regexp chain — count each class on the ORIGINAL text, then
  * `regexp_replace(regexp_replace(regexp_replace(text, EMAIL,
  * '<EMAIL>'), IP, '<IP>'), PHONE, '<PHONE>')` — three full regex
  * traversals for the replaces plus three more for the counts, per
  * document. That cost is pure per-row constant (no shuffle), but it
  * is the engine's largest comparable constant left on the table: the
  * patterns are regular enough that each pass is a single forward
  * char loop with no backtracking state.
  *
  * These scanners reproduce `java.util.regex` leftmost-match semantics
  * EXACTLY (spec-checked against `Pattern` itself on adversarial
  * inputs, and against the builtin regexp chain through Spark):
  *
  *  - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}` — the
  *    local-part run is maximal (no '@' inside the class, so greedy
  *    backtracking never helps: '@' must sit exactly at the run end);
  *    the domain dot is the LARGEST position inside the maximal
  *    domain run with two letters after it (greedy `+` backtracking),
  *    and the TLD extends over the maximal letter run (greedy {2,}).
  *  - IPv4 `([0-9]{1,3}\.){3}[0-9]{1,3}` — each octet's length is
  *    forced (digits are contiguous, so exactly one quantifier choice
  *    is followed by the required '.'), which kills all cross-group
  *    backtracking; a >3-digit run can only host a match starting in
  *    its last three digits. The `\b`-anchored variant additionally
  *    requires a non-word predecessor (only a run START can satisfy
  *    it) and a non-word follower (any trailing word char fails every
  *    backtrack length, because shorter octets end on digits).
  *  - phone strict `\+[0-9]{7,15}` — a digit-run length check; greedy
  *    takes min(run, 15).
  *  - phone loose `\+[0-9][0-9 ()-]{7,}[0-9]` — the final digit is the
  *    LAST digit in the maximal middle-class run at distance >= 7
  *    (greedy `{7,}` backtracking surrenders trailing non-digits).
  *
  * Counts are taken on the ORIGINAL text and replacements on the
  * sequential intermediates, exactly like the builtin chain (the two
  * differ: an IPv4 inside an email's local part counts but never
  * shows as `<IP>` in the redaction). A naive "one combined
  * alternation scan" would NOT be equivalent — a loose-phone match
  * can start before an email match that the email-first chain
  * consumes (`"+1 (23) 456789a@b.cc"`) — so the fusion keeps the
  * pass ORDER and fuses the per-pass work instead.
  *
  * Scale shape: pure per-row scalar map inside WholeStageCodegen, no
  * shuffle, no regex engine allocation per row; cost is a handful of
  * forward scans of each document.
  *
  * Reference: the C4/Dolma-style scrub stage (reference corpus
  * pipelines run the same three regex classes); patterns stay in the
  * Java-regex ∩ RE2 common subset so the DuckDB oracle replays the
  * original chain bit-for-bit.
  */
object PiiScan {

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  /** java.util.regex's `\b` word test — NOT `\w`'s ASCII class: the
    * JDK's Bound node checks `_ | Character.isLetterOrDigit` on CODE
    * POINTS (the documented \b-vs-\w inconsistency), so 'é' and CJK
    * letters are word chars for boundaries. Spec-caught on adversarial
    * input; these helpers mirror the JDK exactly. */
  @inline private def isWordBefore(s: String, idx: Int): Boolean = {
    val cp = s.codePointBefore(idx)
    cp == '_' || Character.isLetterOrDigit(cp)
  }
  @inline private def isWordAt(s: String, idx: Int): Boolean = {
    val cp = s.codePointAt(idx)
    cp == '_' || Character.isLetterOrDigit(cp)
  }
  @inline private def isLocalCh(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'
  @inline private def isDomainCh(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '-'
  @inline private def isPhoneMid(c: Char): Boolean =
    isDigit(c) || c == ' ' || c == '(' || c == ')' || c == '-'

  /** Email scan: count matches; when `sb` is non-null also build the
    * text with every match replaced by `<EMAIL>`. */
  private[functions] def scanEmails(s: String, sb: java.lang.StringBuilder): Int = {
    val n = s.length
    var i = 0; var last = 0; var cnt = 0
    while (i < n) {
      if (!isLocalCh(s.charAt(i))) i += 1
      else {
        var r = i
        while (r < n && isLocalCh(s.charAt(r))) r += 1
        var advanced = false
        if (r < n && s.charAt(r) == '@') {
          val d0 = r + 1
          var e = d0
          while (e < n && isDomainCh(s.charAt(e))) e += 1
          // greedy `+` backtrack: largest dot with >=1 domain char
          // before and >=2 letters after, all inside the domain run
          var d = e - 3
          var hit = -1
          while (d >= d0 + 1 && hit < 0) {
            if (s.charAt(d) == '.' && isAlpha(s.charAt(d + 1)) &&
                isAlpha(s.charAt(d + 2))) hit = d
            else d -= 1
          }
          if (hit >= 0) {
            var me = hit + 3
            while (me < e && isAlpha(s.charAt(me))) me += 1
            cnt += 1
            if (sb != null) { sb.append(s, last, i).append("<EMAIL>"); last = me }
            i = me
            advanced = true
          }
        }
        // no match anchored on this run's '@' (or no '@'): every start
        // inside [i, r) shares the run end, so they all fail identically
        if (!advanced) i = r + 1
      }
    }
    if (sb != null) sb.append(s, last, n)
    cnt
  }

  /** `([0-9]{1,3}\.){3}[0-9]{1,3}` at exactly `p`; end index or -1. */
  private def tryIpv4(s: String, p: Int, n: Int): Int = {
    var pos = p
    var g = 0
    while (g < 3) {
      var m = 0
      while (pos + m < n && m <= 3 && isDigit(s.charAt(pos + m))) m += 1
      if (m == 0 || m > 3 || pos + m >= n || s.charAt(pos + m) != '.') return -1
      pos += m + 1
      g += 1
    }
    var m = 0
    while (pos + m < n && m < 3 && isDigit(s.charAt(pos + m))) m += 1
    if (m == 0) -1 else pos + m
  }

  /** Plain-IPv4 scan (no `\b`): count; replace with `<IP>` when `sb`
    * is non-null. */
  private[functions] def scanIpv4Plain(s: String, sb: java.lang.StringBuilder): Int = {
    val n = s.length
    var i = 0; var last = 0; var cnt = 0
    while (i < n) {
      if (!isDigit(s.charAt(i))) i += 1
      else {
        var re = i
        while (re < n && isDigit(s.charAt(re))) re += 1
        if (re >= n || s.charAt(re) != '.') i = re + 1
        else {
          // a match can only start where the first run's suffix is <= 3
          var p = if (re - 3 > i) re - 3 else i
          var mp = -1; var me = -1
          while (p < re && me < 0) {
            val t = tryIpv4(s, p, n)
            if (t > 0) { mp = p; me = t } else p += 1
          }
          if (me > 0) {
            cnt += 1
            if (sb != null) { sb.append(s, last, mp).append("<IP>"); last = me }
            i = me
          } else i = re + 1
        }
      }
    }
    if (sb != null) sb.append(s, last, n)
    cnt
  }

  /** `\b`-anchored IPv4 scan: only digit-run starts with a non-word
    * predecessor can satisfy the opening `\b`; the closing `\b` fails
    * for every backtrack length if a word char follows the run-capped
    * final octet. */
  private[functions] def scanIpv4Bounded(s: String, sb: java.lang.StringBuilder): Int = {
    val n = s.length
    var i = 0; var last = 0; var cnt = 0
    while (i < n) {
      if (!isDigit(s.charAt(i))) i += 1
      else {
        var re = i
        while (re < n && isDigit(s.charAt(re))) re += 1
        var me = -1; var mp = -1
        if (i == 0 || !isWordBefore(s, i)) {
          var pos = i
          var g = 0
          var ok = true
          while (ok && g < 3) {
            var m = 0
            while (pos + m < n && m <= 3 && isDigit(s.charAt(pos + m))) m += 1
            if (m == 0 || m > 3 || pos + m >= n || s.charAt(pos + m) != '.') ok = false
            else { pos += m + 1; g += 1 }
          }
          if (ok) {
            var m = 0
            while (pos + m < n && m <= 3 && isDigit(s.charAt(pos + m))) m += 1
            if (m >= 1 && m <= 3 &&
                (pos + m >= n || !isWordAt(s, pos + m))) {
              mp = i; me = pos + m
            }
          }
        }
        if (me > 0) {
          cnt += 1
          if (sb != null) { sb.append(s, last, mp).append("<IP>"); last = me }
          i = me
        } else i = re + 1
      }
    }
    if (sb != null) sb.append(s, last, n)
    cnt
  }

  /** Strict E.164 scan `\+[0-9]{7,15}`: count; replace with
    * `<PHONE>` when `sb` is non-null. */
  private[functions] def scanPhoneStrict(s: String, sb: java.lang.StringBuilder): Int = {
    val n = s.length
    var i = 0; var last = 0; var cnt = 0
    while (i < n) {
      if (s.charAt(i) != '+') i += 1
      else {
        var m = 0
        while (i + 1 + m < n && m < 16 && isDigit(s.charAt(i + 1 + m))) m += 1
        if (m >= 7) {
          val me = i + 1 + (if (m > 15) 15 else m)
          cnt += 1
          if (sb != null) { sb.append(s, last, i).append("<PHONE>"); last = me }
          i = me
        } else i = i + 1 + m // no '+' inside the scanned digits
      }
    }
    if (sb != null) sb.append(s, last, n)
    cnt
  }

  /** Loose phone scan `\+[0-9][0-9 ()-]{7,}[0-9]`: count; replace with
    * `<PHONE>` when `sb` is non-null. */
  private[functions] def scanPhoneLoose(s: String, sb: java.lang.StringBuilder): Int = {
    val n = s.length
    var i = 0; var last = 0; var cnt = 0
    while (i < n) {
      if (s.charAt(i) != '+') i += 1
      else if (i + 1 >= n || !isDigit(s.charAt(i + 1))) i += 1
      else {
        val i0 = i + 2
        var re = i0
        while (re < n && isPhoneMid(s.charAt(re))) re += 1
        // greedy {7,} backtrack: last digit in the run at distance >= 7
        var j = re - 1
        while (j >= i0 + 7 && !isDigit(s.charAt(j))) j -= 1
        if (j >= i0 + 7) {
          cnt += 1
          if (sb != null) { sb.append(s, last, i).append("<PHONE>"); last = j + 1 }
          i = j + 1
        } else i = re // no '+' inside [i+1, re)
      }
    }
    if (sb != null) sb.append(s, last, n)
    cnt
  }

  // ---- fused entry points (static: shared by eval and codegen) ------

  /** `text_pii` semantics (Corpus patterns: plain IPv4, strict phone):
    * counts on the ORIGINAL text, `clean` = the sequential
    * email -> IPv4 -> phone replacement chain. */
  def piiStats(u: UTF8String): InternalRow = {
    val s = u.toString
    val sb1 = new java.lang.StringBuilder(s.length + 16)
    val emails = scanEmails(s, sb1)
    val ipv4s = scanIpv4Plain(s, null)
    val phones = scanPhoneStrict(s, null)
    val s1 = if (emails == 0) s else sb1.toString
    val sb2 = new java.lang.StringBuilder(s1.length + 8)
    val ip1 = scanIpv4Plain(s1, sb2)
    val s2 = if (ip1 == 0) s1 else sb2.toString
    val sb3 = new java.lang.StringBuilder(s2.length + 8)
    val ph2 = scanPhoneStrict(s2, sb3)
    val clean = if (ph2 == 0) s2 else sb3.toString
    new GenericInternalRow(Array[Any](emails, ipv4s, phones,
      UTF8String.fromString(clean)))
  }

  /** `text_redact` semantics (TextFunctions patterns: `\b`-anchored
    * IPv4, loose phone): `red` = the sequential replacement chain,
    * counts of emails/IPv4s on the ORIGINAL text. */
  def redactStats(u: UTF8String): InternalRow = {
    val s = u.toString
    val sb1 = new java.lang.StringBuilder(s.length + 16)
    val nEmail = scanEmails(s, sb1)
    val nIp = scanIpv4Bounded(s, null)
    val s1 = if (nEmail == 0) s else sb1.toString
    val sb2 = new java.lang.StringBuilder(s1.length + 8)
    val ip1 = scanIpv4Bounded(s1, sb2)
    val s2 = if (ip1 == 0) s1 else sb2.toString
    val sb3 = new java.lang.StringBuilder(s2.length + 8)
    val ph2 = scanPhoneLoose(s2, sb3)
    val red = if (ph2 == 0) s2 else sb3.toString
    new GenericInternalRow(Array[Any](UTF8String.fromString(red), nEmail, nIp))
  }

  val piiStatsType: StructType = StructType(Seq(
    StructField("emails", IntegerType, nullable = false),
    StructField("ipv4s", IntegerType, nullable = false),
    StructField("phones", IntegerType, nullable = false),
    StructField("clean", StringType, nullable = false)))

  val redactStatsType: StructType = StructType(Seq(
    StructField("red", StringType, nullable = false),
    StructField("n_email", IntegerType, nullable = false),
    StructField("n_ip", IntegerType, nullable = false)))

  /** Column face of [[PiiStatsExpr]]. */
  def piiStatsCol(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(PiiStatsExpr(Bridge.expression(c)))
  }

  /** Column face of [[RedactStatsExpr]]. */
  def redactStatsCol(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(RedactStatsExpr(Bridge.expression(c)))
  }
}

/** `pii_stats(text)` -> struct(emails, ipv4s, phones, clean) — see
  * [[PiiScan]]. */
case class PiiStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PiiScan.piiStatsType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pii_stats requires a string argument, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(input: Any): Any =
    PiiScan.piiStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScan.piiStats($c)")
  override protected def withNewChildInternal(newChild: Expression): PiiStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "pii_stats"
}

/** `redact_stats(text)` -> struct(red, n_email, n_ip) — see
  * [[PiiScan]]. */
case class RedactStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PiiScan.redactStatsType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"redact_stats requires a string argument, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(input: Any): Any =
    PiiScan.redactStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScan.redactStats($c)")
  override protected def withNewChildInternal(newChild: Expression): RedactStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "redact_stats"
}
