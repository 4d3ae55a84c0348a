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
  *
  * `probes > 0` adds 1-step MULTI-PROBE buckets (Lv et al., VLDB 2007):
  * after each table's main bucket, the buckets obtained by flipping each
  * of the first `probes` sign bits — the query side probes the adjacent
  * hypercube corners, trading a factor `1+probes` more (tiny) query
  * bucket rows for recall, instead of `1+probes` more tables over the
  * whole corpus. Output layout: `table * (1 + probes) + (0 | 1 + flip)`.
  */
case class LshBuckets(child: Expression, tables: Int, planes: Int, dims: Int,
                      probes: Int = 0)
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
    LshBuckets.compute(input.asInstanceOf[ArrayData], planeTable, tables, planes, probes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("graftLshPlanes", planeTable,
      "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.ann.LshBuckets.compute($c, $planesRef, $tables, $planes, $probes)")
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
    * seed 42, fold the int bits, then the int table id. `flip = -1` is the
    * main bucket; otherwise the bucket with that sign bit inverted. */
  def compute(vec: ArrayData, planes3: Array[Array[Array[Double]]],
              tables: Int, planes: Int, probes: Int): ArrayData = {
    val n = vec.numElements()
    val stride = 1 + probes
    val out = new Array[Long](tables * stride)
    val bits = new Array[Int](planes)
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
      var p = 0
      while (p < planes) {
        bits(p) = if (dots(p) >= 0) 1 else 0
        p += 1
      }
      out(t * stride) = foldHash(bits, -1, t)
      var f = 0
      while (f < probes) {
        out(t * stride + 1 + f) = foldHash(bits, f, t)
        f += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  private def foldHash(bits: Array[Int], flip: Int, table: Int): Long = {
    var h = 42L
    var p = 0
    while (p < bits.length) {
      val b = if (p == flip) 1 - bits(p) else bits(p)
      h = XxHash64Function.hash(java.lang.Integer.valueOf(b), IntegerType, h)
      p += 1
    }
    XxHash64Function.hash(java.lang.Integer.valueOf(table), IntegerType, h)
  }

  def buckets(vec: Column, tables: Int, planes: Int, dims: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(LshBuckets(Bridge.expression(vec), tables, planes, dims))
  }

  /** Main + 1-bit-flip probe buckets, `table * (1 + probes) + slot` layout. */
  def bucketsMultiProbe(vec: Column, tables: Int, planes: Int, dims: Int,
                        probes: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(LshBuckets(Bridge.expression(vec), tables, planes, dims, probes))
  }
}
