package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Fnv1a64

/** Session extensions registering graft's custom Catalyst expressions for
  * SQL use:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *   spark.sql("SELECT fnv1a64(text) FROM docs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("fnv1a64"),
      new ExpressionInfo(classOf[Fnv1a64].getName, "fnv1a64"),
      (exprs: Seq[Expression]) => Fnv1a64(exprs.head)))
  }
}

/** Runtime registration for sessions that already exist (extensions only
  * apply at builder time). */
object GraftExtensions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "fnv1a64", exprs => Fnv1a64(exprs.head))
}
