package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.core._

/** User-facing factory functions, mirroring the reference's top-level API
  * (zcollection/api.py: create_collection / open_collection and the
  * package exports). See README.md for the full migration table.
  */
object api {

  /** Create a new collection (reference api.py create_collection). */
  def createCollection(
      spark: SparkSession,
      root: String,
      schema: StructType,
      axis: String,
      partitioning: Partitioning,
      catalogEnabled: Boolean = false,
      overwrite: Boolean = false,
      profile: String = "local-fast",
      attrs: Map[String, String] = Map.empty,
      retainGenerations: Int = 0,
  ): Collection =
    Collection.create(spark, root, schema, axis, partitioning, catalogEnabled,
      overwrite, profile, attrs, retainGenerations)

  /** Open an existing collection (reference api.py open_collection). */
  def openCollection(spark: SparkSession, root: String, readOnly: Boolean = false): Collection =
    Collection.open(spark, root, readOnly)

  /** Create a view over a base collection (reference view/base.py). */
  def createView(spark: SparkSession, root: String, base: Collection, overwrite: Boolean = false): View =
    View.create(spark, root, base, overwrite)

  def openView(spark: SparkSession, root: String): View = View.open(spark, root)

  /** Build a secondary index (reference indexing/parquet.py). */
  def buildIndex(spark: SparkSession, collection: Collection, keys: Seq[String],
                 root: String, filters: String = null): Indexer =
    Indexer.build(spark, collection, keys, root, filters)

  /** Register graft's SQL functions on a running session. */
  def registerFunctions(spark: SparkSession): Unit = GraftExtensions.register(spark)

  /** Shorthand partitioning constructors (reference partitioning/__init__). */
  def date(variable: String, resolution: String): Partitioning =
    DatePartitioning(variable, resolution)
  def sequence(variables: Seq[String], dimension: String): Partitioning =
    SequencePartitioning(variables, dimension)
  def groupedSequence(variables: Seq[String], dimension: String, size: Int, start: Int = 0): Partitioning =
    GroupedSequencePartitioning(variables, dimension, size, start)
}
