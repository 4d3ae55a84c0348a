package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Minimal `private[sql]` bridge for graft's V1 streaming source.
  *
  * MicroBatchExecution requires the DataFrame a `Source.getBatch` returns
  * to carry `isStreaming = true` on its leaf nodes — the same flip Spark's
  * own FileStreamSource applies to the relation it builds. That flip and
  * `Dataset.ofRows` are package-private to `org.apache.spark.sql`, so this
  * one-method shim lives in a subpackage (the standard pattern for
  * third-party connectors building batch-backed micro-batches).
  */
object StreamingShim {

  /** Re-root `df`'s plan with its batch leaf relations marked streaming. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    val plan = df.queryExecution.logical.transform {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
      case lr: LogicalRDD =>
        new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          true, lr.stream)(spark, None, None)
    }
    Dataset.ofRows(spark, plan)
  }

  /** Collapse `df`'s WHOLE plan behind one streaming-flagged RDD leaf
    * (the KafkaSource `internalCreateDataFrame(..., isStreaming = true)`
    * shape). For batch plans that use operators the leaf-flip above
    * would turn into unsupported STREAMING operators — the change feed's
    * `exceptAll` would otherwise read as a stream-stream set op — the
    * computation still runs lazily and fully distributed inside the RDD
    * lineage; only the streaming planner sees a single leaf. */
  def batchPlanAsStreamingLeaf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
