package graft.core

import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Fluent schema construction, mirroring the reference's
  * `zcollection/schema/builder.py` (`SchemaBuilder.with_variable /
  * with_group / with_attribute / build`): variables address nested groups
  * with dotted paths (`payload.ku.power`), which become nested
  * `StructType` columns — the parquet-native form of the reference's Zarr
  * group tree. Dimensions need no declaration here: Spark columns ARE the
  * reference's (dimension-tagged) arrays, and the collection's axis is
  * named at `Collection.create`.
  *
  * {{{
  *   val (schema, attrs) = new SchemaBuilder()
  *     .withVariable("ts", TimestampType)
  *     .withVariable("payload.ku.power", DoubleType)
  *     .withAttribute("mission", "demo")
  *     .build()
  * }}}
  */
final class SchemaBuilder {
  // fields are kept in insertion order, like the reference builder
  private val order = scala.collection.mutable.ArrayBuffer.empty[String]
  private val children = scala.collection.mutable.Map.empty[String, Either[DataType, SchemaBuilder]]
  private val attributes = scala.collection.mutable.LinkedHashMap.empty[String, String]

  /** Add a variable; a dotted path creates/extends nested groups. */
  def withVariable(path: String, dataType: DataType): SchemaBuilder = {
    val i = path.indexOf('.')
    if (i < 0) {
      require(!children.contains(path), s"variable '$path' already defined")
      order += path
      children(path) = Left(dataType)
    } else {
      val (head, rest) = (path.substring(0, i), path.substring(i + 1))
      val group = children.get(head) match {
        case Some(Right(g)) => g
        case Some(Left(_)) =>
          throw new IllegalArgumentException(s"'$head' is a variable, not a group")
        case None =>
          val g = new SchemaBuilder
          order += head
          children(head) = Right(g)
          g
      }
      group.withVariable(rest, dataType)
    }
    this
  }

  /** Add an explicit (possibly empty) nested group. */
  def withGroup(name: String)(f: SchemaBuilder => Unit): SchemaBuilder = {
    require(!children.contains(name), s"'$name' already defined")
    val g = new SchemaBuilder
    f(g)
    order += name
    children(name) = Right(g)
    this
  }

  /** Collection-level attribute (persisted in the root config). */
  def withAttribute(key: String, value: String): SchemaBuilder = {
    attributes(key) = value
    this
  }

  /** @return (schema, attrs) ready for `Collection.create`. */
  def build(): (StructType, Map[String, String]) = (toStruct, attributes.toMap)

  private def toStruct: StructType =
    StructType(order.toSeq.map { name =>
      children(name) match {
        case Left(dt)     => StructField(name, dt)
        case Right(group) => StructField(name, group.toStruct)
      }
    })
}
