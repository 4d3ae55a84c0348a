package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native INT8 quantization over `array<float>` columns — the fused-loop
  * replacements for the higher-order-function formulation in
  * [[Ann.quantizeInt8]]: Spark's `transform`/`aggregate` interpret a
  * lambda per ELEMENT and break whole-stage codegen, which made the
  * write-once corpus quantization pass ~5x slower than necessary. Each
  * expression below runs one JVM loop per row, stays codegen-compatible,
  * and is BIT-IDENTICAL to the builtin composition it replaces (same
  * double arithmetic, same `floor(x*127/ma + 0.5)` rounding, same left
  * fold) — the spec cross-checks equality element-for-element. */
case class VecMaxAbs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_max_abs requires array<float>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    QuantizeInt8.maxAbs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.ann.QuantizeInt8.maxAbs($v)")

  override protected def withNewChildInternal(c: Expression): VecMaxAbs = copy(child = c)

  override def prettyName: String = "vec_max_abs"
}

/** `array<float> x max_abs -> array<int>` in one loop; a zero `max_abs`
  * yields zeros (the zero-vector contract of [[Ann.quantizeInt8]]). */
case class VecQuantizeInt8(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_quantize_int8 requires (array<float>, double), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(v: Any, ma: Any): Any =
    QuantizeInt8.quantize(v.asInstanceOf[ArrayData], ma.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, ma) => s"graft.ann.QuantizeInt8.quantize($v, $ma)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecQuantizeInt8 =
    copy(left = l, right = r)

  override def prettyName: String = "vec_quantize_int8"
}

/** Mean absolute reconstruction error, one fused left-fold loop. */
case class VecQuantizeMae(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), DoubleType, ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "vec_quantize_mae requires (array<float>, double, array<int>), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override protected def nullSafeEval(v: Any, ma: Any, q: Any): Any =
    QuantizeInt8.mae(v.asInstanceOf[ArrayData], ma.asInstanceOf[Double],
      q.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, ma, q) => s"graft.ann.QuantizeInt8.mae($v, $ma, $q)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): VecQuantizeMae =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "vec_quantize_mae"
}

object QuantizeInt8 {
  /** max |x_i| with the same double widening as `array_max(transform(abs))`. */
  def maxAbs(v: ArrayData): Double = {
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(v.getFloat(i).toDouble)
      if (x > m) m = x
      i += 1
    }
    m
  }

  def quantize(v: ArrayData, ma: Double): ArrayData = {
    val n = v.numElements()
    val out = new Array[Int](n)
    if (ma != 0.0) {
      var i = 0
      while (i < n) {
        out(i) = math.floor(v.getFloat(i).toDouble * 127.0 / ma + 0.5).toInt
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Left fold in element order — matches the `aggregate` composition's
    * floating-point addition order exactly. */
  def mae(v: ArrayData, ma: Double, q: ArrayData): Double = {
    val n = math.min(v.numElements(), q.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += math.abs(v.getFloat(i).toDouble - q.getInt(i).toDouble * ma / 127.0)
      i += 1
    }
    acc / n
  }

  def maxAbsCol(v: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(VecMaxAbs(Bridge.expression(v)))
  }

  def quantizeCol(v: Column, ma: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(VecQuantizeInt8(Bridge.expression(v), Bridge.expression(ma)))
  }

  def maeCol(v: Column, ma: Column, q: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(VecQuantizeMae(
      Bridge.expression(v), Bridge.expression(ma), Bridge.expression(q)))
  }
}
