package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a FIXED, ranked BPE merge table to text — the tokenizer-apply
  * half of byte-pair encoding (Sennrich et al. 2016; the greedy
  * lowest-rank loop of GPT-2's `bpe()`), as ONE native expression:
  *
  *  - pre-tokenize on ASCII whitespace (the Java-regex `\s` class;
  *    whitespace itself is dropped, so concatenating the output pieces
  *    reconstructs the whitespace-stripped input EXACTLY — the
  *    lossless-round-trip property the entry asserts);
  *  - each word starts as its code-point pieces (surrogate-pair safe);
  *  - repeatedly find the LOWEST-RANK adjacent piece pair present in
  *    the table and merge every non-overlapping occurrence left to
  *    right; stop when no adjacent pair is ranked.
  *
  * The merge table rides the expression tree (serialized once per task,
  * reached in generated code via `addReferenceObj` — no UDF, no
  * closure): learning the table is a separate, sampled concern; this
  * expression is the hot-path APPLY, the piece the token-budget
  * operators (C21/C27b) compose with. Cost per word is
  * O(pieces² · merges-fired) worst case — words are short; the scan is
  * embarrassingly parallel and shuffles nothing. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode requires string, got ${other.catalogString}")
    }

  /** rank map keyed with a control-char separator (it keeps ("ab","c")
    * distinct from ("a","bc")); first occurrence of a pair wins, so a
    * duplicated pair keeps its best (lowest) rank. */
  @transient private lazy val table: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + "\u0001" + r, Integer.valueOf(i))
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table,
      classOf[java.util.HashMap[String, Integer]].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeEncode.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeEncode {
  /** Column form. */
  def encode(c: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(BpeEncode(Bridge.expression(c), merges))
  }

  /** One word -> BPE pieces appended to `out`. */
  private def encodeWord(word: String, table: java.util.HashMap[String, Integer],
                         out: java.util.ArrayList[UTF8String]): Unit = {
    // code-point split (surrogate-safe)
    var pieces = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      pieces.add(word.substring(i, i + n))
      i += n
    }
    // greedy lowest-rank merge loop
    var done = pieces.size <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestKey: String = null
      var j = 0
      while (j < pieces.size - 1) {
        val r = table.get(pieces.get(j) + "\u0001" + pieces.get(j + 1))
        if (r != null && r.intValue < bestRank) {
          bestRank = r.intValue
          bestKey = pieces.get(j) + "\u0001" + pieces.get(j + 1)
        }
        j += 1
      }
      if (bestKey == null) done = true
      else {
        val sep = bestKey.indexOf('\u0001')
        val l = bestKey.substring(0, sep)
        val r = bestKey.substring(sep + 1)
        val merged = new java.util.ArrayList[String](pieces.size)
        var k = 0
        while (k < pieces.size) {
          if (k < pieces.size - 1 && pieces.get(k) == l && pieces.get(k + 1) == r) {
            merged.add(l + r); k += 2 // non-overlapping, left to right
          } else { merged.add(pieces.get(k)); k += 1 }
        }
        pieces = merged
        if (pieces.size <= 1) done = true
      }
    }
    var p = 0
    while (p < pieces.size) { out.add(UTF8String.fromString(pieces.get(p))); p += 1 }
  }

  def compute(text: UTF8String, table: java.util.HashMap[String, Integer]): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[UTF8String](s.length / 2 + 1)
    var start = -1
    var i = 0
    while (i <= s.length) {
      // the ASCII whitespace class of Java-regex \s — the exact set the
      // round-trip oracle strips, so concat(pieces) == strip(text) is a
      // well-defined equality (a production tokenizer plugs its own
      // pre-tokenizer; the merge loop below is the reusable part)
      val ws = i == s.length || {
        val c = s.charAt(i)
        c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      }
      if (!ws && start < 0) start = i
      else if (ws && start >= 0) { encodeWord(s.substring(start, i), table, out); start = -1 }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size)))
  }
}
