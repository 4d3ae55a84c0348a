package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash of a string column, as a native Catalyst expression.
  *
  * A custom `Expression` (not a Scala UDF) so it participates in
  * whole-stage codegen: `doGenCode` emits a direct static call on the
  * UTF8String bytes with no boxing or serialization penalty — the
  * preferred way to extend Spark with scalar functions the builtin
  * library lacks.
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv1a64 requires a string argument, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Fnv1a64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)

  override def prettyName: String = "fnv1a64"
}

object Fnv1a64 {
  private val Offset = 0xcbf29ce484222325L
  private val Prime = 0x100000001b3L

  /** Static entry point shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    hashBytes(bytes, bytes.length)
  }

  /** The same byte fold over the first `len` bytes of a reused buffer
    * (the [[WindowHasher]] shingle path — no per-window UTF8String). */
  def hashBytes(bytes: Array[Byte], len: Int): Long = {
    var h = Offset
    var i = 0
    while (i < len) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  /** Wrap as a user-facing Column (Spark 4 Column-node bridge). */
  def fingerprint(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(Fnv1a64(Bridge.expression(c)))
  }

  /** Mixing RE-HASH for order-statistic consumers (KMV sketches,
    * minima-based sampling): FNV-1a applied once more over the first
    * hash's UNSIGNED decimal digits. Raw FNV-1a of short keys has
    * biased low-order statistics (its final byte only multiplies once),
    * which skews anything that reads the smallest hashes as uniform;
    * the ~20-digit second pass runs twenty more multiply rounds and
    * restores uniformity, while staying replayable in any SQL engine
    * (digits → the same byte-fold chain). */
  def rehashUnsigned(hash: Column): Column = {
    import org.apache.spark.sql.functions.{lit, when}
    val d = hash.cast("decimal(20,0)")
    val u = when(hash < 0,
      d + lit(new java.math.BigDecimal("18446744073709551616"))).otherwise(d)
    fingerprint(u.cast("decimal(21,0)").cast("string"))
  }
}
