package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Gopher repetition metrics over a text column — the native
  * twin of the builtin composition in
  * [[graft.operators.Corpus.repetitionMetricsHof]]: `split` +
  * `array_distinct` + `zip_with` evaluate interpreted lambdas per
  * element and materialize three intermediate arrays per row; this
  * expression tokenizes once and counts distinct tokens/bigrams with two
  * hash sets in a single pass. BIT-IDENTICAL results: tokenization is
  * the same `trim` + `\s+` split (trailing empties kept, empty text
  * yields one empty token), counts are exact integers, and the
  * fractions divide the same ints in the same order — spec-checked
  * against the HOF twin on real documents. */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("dup_token_frac", DoubleType, nullable = false),
    StructField("dup_bigram_frac", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_stats requires string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    RepetitionStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.RepetitionStats.compute($v)")

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String): InternalRow = {
    // same tokenization as split(trim(text), "\s+"): UTF8String.trim
    // strips SPACES only (exactly like SQL trim — Java's String.trim
    // would also strip tabs/newlines and diverge), then a Java regex
    // split with limit -1; "" yields a single empty token, like the
    // builtin
    val toks = text.trim.toString.split("\\s+", -1)
    val n = toks.length
    val distinctToks = new java.util.HashSet[String](math.max(16, n * 2))
    var i = 0
    while (i < n) { distinctToks.add(toks(i)); i += 1 }
    val dupTok = if (n > 0) (n - distinctToks.size).toDouble / n else 0.0
    val nb = n - 1
    var dupBig = 0.0
    if (nb > 0) {
      val distinctBigrams = new java.util.HashSet[String](math.max(16, nb * 2))
      i = 0
      while (i < nb) {
        // same join the HOF twin uses: tok + " " + next
        distinctBigrams.add(toks(i) + " " + toks(i + 1))
        i += 1
      }
      dupBig = (nb - distinctBigrams.size).toDouble / nb
    }
    InternalRow(n, dupTok, dupBig)
  }

  def col(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(RepetitionStats(Bridge.expression(c)))
  }
}
