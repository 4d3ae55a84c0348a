package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash sign bits of a token array, as one native Catalyst
  * expression: hashes each token once and accumulates all 64 bit
  * counters in a single loop — replacing the interpreted
  * `transform(tokens, xxhash64)` + 64-wide `aggregate`/`zip_with`
  * composition (bit-identical outputs: same per-token `xxhash64`, same
  * sign rule `sum((h>>j & 1) * 2 - 1) > 0`).
  *
  * `fnv = true` swaps the per-token hash to FNV-1a 64
  * ([[graft.functions.Fnv1a64]]) — slightly weaker mixing, but a plain
  * byte fold any engine reproduces, which gives the whole SimHash
  * pipeline an exact external oracle (the xxhash64 default has no
  * portable mirror).
  */
case class SimHash64(child: Expression, fnv: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData], fnv)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.SimHash64.compute($c, $fnv)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  def compute(tokens: ArrayData, fnv: Boolean): ArrayData = {
    val counts = new Array[Long](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val h =
        if (fnv) graft.functions.Fnv1a64.hash(t)
        else XxHash64Function.hash(t, StringType, 42L)
      var j = 0
      while (j < 64) {
        counts(j) += ((h >>> j) & 1L) * 2 - 1
        j += 1
      }
      i += 1
    }
    val bits = new Array[Int](64)
    var j = 0
    while (j < 64) {
      bits(j) = if (counts(j) > 0) 1 else 0
      j += 1
    }
    new GenericArrayData(bits)
  }

  /** Binary-compat shim for pre-fnv call sites (SQL registration). */
  def compute(tokens: ArrayData): ArrayData = compute(tokens, fnv = false)

  def bits(tokens: Column, fnv: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(SimHash64(Bridge.expression(tokens), fnv))
  }
}
