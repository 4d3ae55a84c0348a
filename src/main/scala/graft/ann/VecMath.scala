package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector math over `array<float>` columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate an
  * interpreted lambda per ELEMENT and break whole-stage codegen around
  * them; for 64-wide embeddings scored millions of times (brute-force
  * top-k, candidate re-ranking, pair verification) that per-element
  * interpretation dominates. These expressions run one fused JVM loop per
  * row and stay codegen-compatible, while remaining BIT-IDENTICAL to the
  * HOF compositions they replace: same element order, double
  * accumulation, `dot / (sqrt(dot_aa) * sqrt(dot_bb))` — the spec
  * cross-checks equality on real embeddings.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires (array<float>, array<float>), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ann.VecMath.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)

  override def prettyName: String = "vec_dot"
}

/** `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` in ONE loop. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim requires (array<float>, array<float>), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ann.VecMath.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)

  override def prettyName: String = "cosine_sim"
}

object VecMath {
  /** Shared by interpreted eval and generated code. Truncates to the
    * shorter array, like `zip_with`. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var ab = 0.0
    var i = 0
    while (i < n) {
      ab += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    // separate loops keep bit-identity with sqrt(dot(a,a)) over each
    // FULL array (zip_with truncates only the cross term)
    var aa = 0.0
    i = 0
    val na = a.numElements()
    while (i < na) { val x = a.getFloat(i).toDouble; aa += x * x; i += 1 }
    var bb = 0.0
    i = 0
    val nb = b.numElements()
    while (i < nb) { val x = b.getFloat(i).toDouble; bb += x * x; i += 1 }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  def dotCol(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))
  }

  def cosineCol(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
  }
}
