package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Gopher quality metrics over a text column — the native twin
  * of the builtin composition in [[TextFunctions]] (`split` +
  * `filter(isInCollection)` + two `regexp_replace`/`length` passes):
  * one tokenization, one character scan, zero intermediate arrays.
  * BIT-IDENTICAL formulas: `len` counts codepoints of the UNTRIMMED
  * text, `avg_token_len = (len - (n-1)) / n`, `punct_ratio` counts the
  * ASCII `\p{Punct}` class exactly as the regex does, and stop hits are
  * exact string membership — all spec-checked against the HOF twin on
  * the real corpus. */
case class QualityStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("len", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("avg_token_len", DoubleType, nullable = false),
    StructField("stop_ratio", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quality_stats requires string, got ${other.catalogString}")
    }

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  override protected def nullSafeEval(v: Any): Any =
    QualityStats.compute(v.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the stop set once per generated class, not per row
    val setRef = ctx.addReferenceObj("stopSet", stopSet, classOf[java.util.HashSet[String]].getName)
    defineCodeGen(ctx, ev, v => s"graft.functions.QualityStats.compute($v, $setRef)")
  }

  override protected def withNewChildInternal(c: Expression): QualityStats =
    copy(child = c)

  override def prettyName: String = "quality_stats"
}

object QualityStats {
  /** ASCII POSIX punctuation, the exact `\p{Punct}` class. */
  private def isPunct(cp: Int): Boolean =
    (cp >= '!' && cp <= '/') || (cp >= ':' && cp <= '@') ||
    (cp >= '[' && cp <= '`') || (cp >= '{' && cp <= '~')

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String, stopSet: java.util.HashSet[String]): InternalRow = {
    val raw = text.toString
    // len + punct count over the UNTRIMMED text, codepoint-wise — same
    // as length(c) and the regexp_replace("[\p{Punct}]") subtraction
    var len = 0
    var punct = 0
    var ci = 0
    while (ci < raw.length) {
      val cp = raw.codePointAt(ci)
      len += 1
      if (isPunct(cp)) punct += 1
      ci += Character.charCount(cp)
    }
    // same tokenization as split(trim(text), "\s+"): SQL trim strips
    // spaces only; limit -1 keeps trailing empties; "" -> one empty token
    val toks = text.trim.toString.split("\\s+", -1)
    val n = toks.length
    var hits = 0
    var i = 0
    while (i < n) {
      if (stopSet.contains(toks(i))) hits += 1
      i += 1
    }
    val avgLen = if (n > 0) (len - (n - 1)).toDouble / n else 0.0
    val stopRatio = if (n > 0) hits.toDouble / n else 0.0
    val punctRatio = if (len > 0) punct.toDouble / len else 0.0
    InternalRow(len, n, avgLen, stopRatio, punctRatio, hits)
  }

  def col(c: Column, stopwords: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(QualityStats(Bridge.expression(c), stopwords))
  }
}
