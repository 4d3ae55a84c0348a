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
  * expression below runs one JVM loop per row and stays
  * codegen-compatible.
  *
  * Bit-identity contract (spec-verified against the builtin composition
  * kept as [[Ann.quantizeInt8Hof]]): for any array with at least one
  * non-null element the results are bit-identical — including NaN
  * elements (NaN is the maximum, matching Spark's `array_max` ordering;
  * the NaN scale then quantizes every element to 0 through the
  * double->int cast, like the HOF's `cast(NaN as int)`) and null
  * elements (skipped by max_abs like `array_max`, propagated per-element
  * by the quantizer like `transform`, and poisoning the error fold to
  * null like `aggregate`). The ONE narrowed case: an EMPTY or all-null
  * array yields null for all three outputs, where the HOF composition
  * yields (null, empty-or-all-null array, null). */
case class VecMaxAbs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  /** Null even for a non-null child: empty / all-null arrays have no
    * maximum (the `array_max` contract). */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_max_abs requires array<float>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    QuantizeInt8.maxAbsBoxed(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("maxAbs")
    nullSafeCodeGen(ctx, ev, v => s"""
      java.lang.Double $tmp = graft.ann.QuantizeInt8.maxAbsBoxed($v);
      if ($tmp == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $tmp.doubleValue();
      }""")
  }

  override protected def withNewChildInternal(c: Expression): VecMaxAbs = copy(child = c)

  override def prettyName: String = "vec_max_abs"
}

/** `array<float> x max_abs -> array<int>` in one loop; a zero `max_abs`
  * yields zeros (the zero-vector contract of [[Ann.quantizeInt8]]);
  * null elements pass through as null elements (the `transform`
  * contract). */
case class VecQuantizeInt8(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = left.dataType match {
    case ArrayType(_, n) => ArrayType(IntegerType, containsNull = n)
    case _               => ArrayType(IntegerType, containsNull = true)
  }

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

/** Mean absolute reconstruction error, one fused left-fold loop. Null
  * for empty arrays (the HOF's divide-by-zero null) and when any
  * element of either array is null (the poisoned-fold contract). */
case class VecQuantizeMae(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

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
    QuantizeInt8.maeBoxed(v.asInstanceOf[ArrayData], ma.asInstanceOf[Double],
      q.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("mae")
    nullSafeCodeGen(ctx, ev, (v, ma, q) => s"""
      java.lang.Double $tmp = graft.ann.QuantizeInt8.maeBoxed($v, $ma, $q);
      if ($tmp == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $tmp.doubleValue();
      }""")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): VecQuantizeMae =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "vec_quantize_mae"
}

object QuantizeInt8 {
  /** max |x_i| with the same double widening as `array_max(transform(abs))`:
    * null elements are skipped, NaN is the maximum (Spark's double
    * ordering), and an empty / all-null array has no maximum -> null. */
  def maxAbsBoxed(v: ArrayData): java.lang.Double = {
    val n = v.numElements()
    var m = 0.0
    var seen = false
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = math.abs(v.getFloat(i).toDouble)
        if (java.lang.Double.isNaN(x)) return java.lang.Double.valueOf(Double.NaN)
        if (x > m || !seen) { m = x; seen = true }
      }
      i += 1
    }
    if (seen) java.lang.Double.valueOf(m) else null
  }

  def quantize(v: ArrayData, ma: Double): ArrayData = {
    val n = v.numElements()
    // zero-vector branch: like the HOF's `transform(d, _ => lit(0))`,
    // every slot (null elements included) maps to 0
    if (ma == 0.0) return new GenericArrayData(new Array[Int](n))
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = v.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Int](n)
      i = 0
      while (i < n) {
        out(i) = math.floor(v.getFloat(i).toDouble * 127.0 / ma + 0.5).toInt
        i += 1
      }
      new GenericArrayData(out)
    } else {
      // rare path: propagate null elements like `transform`
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) =
          if (v.isNullAt(i)) null
          else Integer.valueOf(math.floor(v.getFloat(i).toDouble * 127.0 / ma + 0.5).toInt)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Left fold in element order — matches the `aggregate` composition's
    * floating-point addition order exactly. Null for an empty pair of
    * arrays (the HOF divides by size 0 -> Spark null) or any null
    * element (null poisons the fold). */
  def maeBoxed(v: ArrayData, ma: Double, q: ArrayData): java.lang.Double = {
    val n = math.min(v.numElements(), q.numElements())
    if (n == 0) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i) || q.isNullAt(i)) return null
      acc += math.abs(v.getFloat(i).toDouble - q.getInt(i).toDouble * ma / 127.0)
      i += 1
    }
    java.lang.Double.valueOf(acc / n)
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
