package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** All random-hyperplane LSH bucket ids of a vector, as one native
  * Catalyst expression: a single loop computes every (table, plane) dot
  * product and hashes each table's sign bits into its bucket id —
  * replacing `tables` interpreted higher-order-function pipelines.
  *
  * Bit-identical to the builtin composition it replaces
  * (`xxhash64(transform(dots, sign), lit(table))` over plan-time literal
  * planes): hyperplanes come from the same seeded generator, and the
  * bucket hash reproduces XxHash64's fold over an int array plus the
  * table literal.
  */
case class LshBuckets(child: Expression, tables: Int, planes: Int, dims: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets requires array<float>, got ${other.catalogString}")
    }

  @transient private lazy val planeTable: Array[Array[Array[Double]]] =
    LshBuckets.planeTable(tables, planes, dims)

  override protected def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], planeTable, tables, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("graftLshPlanes", planeTable,
      "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.ann.LshBuckets.compute($c, $planesRef, $tables, $planes)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)

  override def prettyName: String = "lsh_buckets"
}

object LshBuckets {

  /** Hyperplane components, [table][dim][plane], from the fixed seed used
    * since the LSH operators were introduced. */
  def planeTable(tables: Int, planes: Int, dims: Int): Array[Array[Array[Double]]] =
    Array.tabulate(tables) { t =>
      val rnd = new scala.util.Random(1000003L * t + 17)
      Array.fill(dims)(Array.fill(planes)(rnd.nextDouble() * 2 - 1))
    }

  /** Shared by interpreted eval and generated code. Reproduces
    * `xxhash64(transform(dots, d -> if (d >= 0) 1 else 0), lit(table))`:
    * seed 42, fold the int bits, then the int table id. */
  def compute(vec: ArrayData, planes3: Array[Array[Array[Double]]],
              tables: Int, planes: Int): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      val planeT = planes3(t)
      val dots = new Array[Double](planes)
      var d = 0
      val dmax = math.min(n, planeT.length)
      while (d < dmax) {
        val x = vec.getFloat(d).toDouble
        val row = planeT(d)
        var p = 0
        while (p < planes) {
          dots(p) += row(p) * x
          p += 1
        }
        d += 1
      }
      var h = 42L
      var p = 0
      while (p < planes) {
        val bit = if (dots(p) >= 0) 1 else 0
        h = XxHash64Function.hash(java.lang.Integer.valueOf(bit), IntegerType, h)
        p += 1
      }
      h = XxHash64Function.hash(java.lang.Integer.valueOf(t), IntegerType, h)
      out(t) = h
      t += 1
    }
    new GenericArrayData(out)
  }

  def buckets(vec: Column, tables: Int, planes: Int, dims: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(LshBuckets(Bridge.expression(vec), tables, planes, dims))
  }
}
