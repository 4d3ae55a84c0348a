package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word k-shingles of a token array, as ONE native loop.
  *
  * Bit-identical to the builtin composition it replaces
  * (`array_distinct(transform(sequence(1, n-k+1), i ->
  * xxhash64(concat_ws(" ", slice(toks, i, k)))))`, falling back to the
  * whole-document join when n < k): shingles join with a single space,
  * hash with XxHash64 seed 42 over the UTF-8 bytes, and de-duplicate in
  * first-occurrence order — but without `transform`'s per-window
  * interpreted lambda, slice allocation, and repeated concat.
  */
case class ShingleHashes(child: Expression, k: Int, fnv: Boolean = false)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes requires array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], k, fnv)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.compute($c, $k, $fnv)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  private val Space = UTF8String.fromString(" ")

  /** Join tokens [from, from+len) with single spaces (concat_ws skips
    * nulls) and hash the result: xxhash64 at seed 42 (production), or
    * FNV-1a over the UTF-8 bytes (`fnv = true`) — the latter is the
    * byte-fold DuckDB replays exactly, giving MinHash pipelines built on
    * these shingles a full SQL oracle. */
  private def hashWindow(toks: ArrayData, from: Int, len: Int, fnv: Boolean): Long = {
    val parts = new java.util.ArrayList[UTF8String](2 * len)
    var i = 0
    var first = true
    while (i < len) {
      val t = toks.getUTF8String(from + i)
      if (t != null) {
        if (!first) parts.add(Space)
        parts.add(t)
        first = false
      }
      i += 1
    }
    val joined = UTF8String.concat(parts.toArray(new Array[UTF8String](parts.size)): _*)
    if (fnv) Fnv1a64.hash(joined)
    else XxHash64Function.hash(joined, StringType, 42L)
  }

  def compute(toks: ArrayData, k: Int, fnv: Boolean): ArrayData = {
    val n = toks.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (n >= k) {
      var i = 0
      while (i <= n - k) {
        seen.add(hashWindow(toks, i, k, fnv))
        i += 1
      }
    } else {
      seen.add(hashWindow(toks, 0, n, fnv))
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def shingles(tokens: Column, k: Int, fnv: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ShingleHashes(Bridge.expression(tokens), k, fnv))
  }
}

/** Distinct hashed character k-gram shingles of a string, one native loop
  * — bit-identical to `array_distinct(transform(sequence(1, n-k+1), i ->
  * xxhash64(substr(s, i, k))))` with the n < k whole-string fallback.
  * Substrings index CHARACTERS (UTF8String.substringSQL semantics). */
case class CharShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_shingle_hashes requires string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CharShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharShingleHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "char_shingle_hashes"
}

object CharShingleHashes {
  def compute(s: UTF8String, k: Int): ArrayData = {
    val n = s.numChars()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (n >= k) {
      var i = 0
      while (i <= n - k) {
        seen.add(XxHash64Function.hash(s.substringSQL(i + 1, k), StringType, 42L))
        i += 1
      }
    } else {
      seen.add(XxHash64Function.hash(s, StringType, 42L))
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def shingles(str: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(CharShingleHashes(Bridge.expression(str), k))
  }
}
