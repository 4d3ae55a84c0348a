package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression converters.
  *
  * Spark 4 removed the public `new Column(expr)` constructor in the Column
  * API unification; libraries extending Catalyst with custom expressions
  * use a same-package bridge to wrap them as user-facing Columns (the
  * extension pattern used by Spark-ecosystem libraries).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame. */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** `private[sql]` CatalogV2Util: V2 Column[] -> StructType for the
    * graft TableCatalog's CREATE TABLE. */
  def v2ColumnsToStructType(columns: Array[org.apache.spark.sql.connector.catalog.Column])
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util.v2ColumnsToStructType(columns)

  /** `private[sql]` PredicateUtils: V2 Predicate -> V1 source Filter
    * (None when the predicate has no V1 form). */
  def predicateToV1(p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(p)

  /** A V1 streaming Sink's `addBatch` DataFrame is backed by an
    * IncrementalExecution that must not be re-planned as a batch query —
    * the established sink pattern (Spark's own memory/console sinks)
    * re-wraps the executed InternalRow RDD as a plain batch DataFrame. */
  def fromInternalRows(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** `private[sql]` DataSourceStrategy: Catalyst predicate -> V1 source
    * Filter (None when untranslatable) — the SQL DML rule weakens row
    * predicates into the pruning domain with it. */
  def translateFilter(e: Expression): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = false)

  /** Register a temp SQL function on an ALREADY-RUNNING session (the
    * `spark.sql.extensions` path only applies at session construction). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
