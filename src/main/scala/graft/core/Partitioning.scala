package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Partitioning strategies, modeled on the reference's
  * `zcollection/partitioning/{date,sequence,grouped}.py` but expressed as
  * Catalyst column derivations: each strategy maps the partition axis to a
  * set of *partition columns* which Spark's parquet source turns into
  * Hive-style directories (`year=2024/month=3/...`) — so partition pruning,
  * dynamic partition overwrite, and discovery are all handled natively by
  * the engine instead of a bespoke directory walker.
  *
  *  - `identityCols` are real data columns used directly as partition keys
  *    (they are moved into the directory name by `partitionBy` and restored
  *    on read — `Collection.query` re-casts them to their declared types).
  *  - `derivedCols` are computed from the axis (e.g. `year(ts)`) and are
  *    dropped again on query so reads round-trip the original schema.
  */
sealed trait Partitioning extends Serializable {
  def name: String

  /** Column the collection is partitioned along (the unbounded axis). */
  def dimension: String

  /** Partition column names, in path order. */
  def axis: Seq[String]

  /** Partition columns that are plain data columns. */
  def identityCols: Seq[String]

  /** Partition columns computed from the axis (dropped on query). */
  def derivedCols: Seq[String] = axis.diff(identityCols)

  /** Data columns the strategy reads (guards schema evolution: these can
    * never be dropped). */
  def inputCols: Seq[String]

  /** Spark type of each partition column (used to re-cast after partition
    * discovery, which infers integers). */
  def colType(name: String, schema: org.apache.spark.sql.types.StructType): DataType

  /** Add the partition columns to `df`. */
  def assign(df: DataFrame): DataFrame

  /** Partition-key tuple containing the axis value `canonical` (the
    * [[Collection.AxisDomain]] long encoding: epoch micros for
    * timestamps, epoch days for dates, the value itself for integrals),
    * for strategies whose key derivation is MONOTONIC in the axis — then
    * an axis interval [lo, hi] maps to the lexicographic key interval
    * [axisKeyPrefix(lo), axisKeyPrefix(hi)] and partition pruning works
    * for axis-range filters. None: no monotonic derivation (pruning
    * falls back to zone maps alone). */
  def axisKeyPrefix(canonical: Long, axisType: DataType,
                    zone: java.time.ZoneId): Option[Seq[Long]] = None

  def toJsonMap: java.util.LinkedHashMap[String, Object]
}

/** Truncate a timestamp axis into calendar components, one directory level
  * per component (reference: partitioning/date.py:42-150, resolutions
  * Y/M/D/h/m/s). */
final case class DatePartitioning(variable: String, resolution: String) extends Partitioning {
  import DatePartitioning._
  require(Components.contains(resolution), s"unsupported resolution '$resolution'")

  override def name = "date"
  override def dimension: String = variable
  override val axis: Seq[String] = Components(resolution)
  override def identityCols: Seq[String] = Nil
  override def inputCols: Seq[String] = Seq(variable)
  override def colType(n: String, s: org.apache.spark.sql.types.StructType): DataType = IntegerType

  override def assign(df: DataFrame): DataFrame =
    axis.foldLeft(df) { (d, comp) =>
      val e = comp match {
        case "year"   => year(col(variable))
        case "month"  => month(col(variable))
        case "day"    => dayofmonth(col(variable))
        case "hour"   => hour(col(variable))
        case "minute" => minute(col(variable))
        case "second" => second(col(variable))
      }
      d.withColumn(comp, e.cast(IntegerType))
    }

  /** Calendar components are lexicographically monotonic in time. */
  override def axisKeyPrefix(canonical: Long, axisType: DataType,
                             zone: java.time.ZoneId): Option[Seq[Long]] = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    val ldt = axisType match {
      case TimestampType | TimestampNTZType =>
        val secs = Math.floorDiv(canonical, 1000000L)
        val nanos = Math.floorMod(canonical, 1000000L) * 1000L
        // NTZ canonical values are zone-free wallclock micros (see
        // Collection.AxisDomain): UTC is the identity decode; only true
        // instants (TimestampType) localize via the session zone, matching
        // what year()/month()/... computed in assign() at write time.
        val z = if (axisType == TimestampNTZType) java.time.ZoneOffset.UTC else zone
        java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochSecond(secs, nanos), z)
      case DateType => java.time.LocalDate.ofEpochDay(canonical).atStartOfDay
      case _        => return None
    }
    Some(axis.map {
      case "year"   => ldt.getYear.toLong
      case "month"  => ldt.getMonthValue.toLong
      case "day"    => ldt.getDayOfMonth.toLong
      case "hour"   => ldt.getHour.toLong
      case "minute" => ldt.getMinute.toLong
      case "second" => ldt.getSecond.toLong
    })
  }

  override def toJsonMap: java.util.LinkedHashMap[String, Object] = {
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("name", "date"); m.put("variable", variable); m.put("resolution", resolution)
    m
  }
}

object DatePartitioning {
  val Components: Map[String, Seq[String]] = Map(
    "Y" -> Seq("year"),
    "M" -> Seq("year", "month"),
    "D" -> Seq("year", "month", "day"),
    "h" -> Seq("year", "month", "day", "hour"),
    "m" -> Seq("year", "month", "day", "hour", "minute"),
    "s" -> Seq("year", "month", "day", "hour", "minute", "second"),
  )
}

/** One partition per unique value tuple of `variables`
  * (reference: partitioning/sequence.py:16-100). */
final case class SequencePartitioning(variables: Seq[String], dim: String) extends Partitioning {
  require(variables.nonEmpty, "Sequence requires at least one variable")
  override def name = "sequence"
  override def dimension: String = dim
  override def axis: Seq[String] = variables
  override def identityCols: Seq[String] = variables
  override def inputCols: Seq[String] = variables
  override def colType(n: String, s: org.apache.spark.sql.types.StructType): DataType =
    s.find(_.name == n).map(_.dataType).getOrElse(LongType)
  override def assign(df: DataFrame): DataFrame = df

  /** A single-variable sequence keyed on the axis itself is the
    * identity derivation (normally redundant — the axis is then a real
    * partition column and strict eval already prunes — but it keeps the
    * key-interval path uniform). */
  override def axisKeyPrefix(canonical: Long, axisType: DataType,
                             zone: java.time.ZoneId): Option[Seq[Long]] =
    if (variables == Seq(dim) && isIntegral(axisType)) Some(Seq(canonical)) else None

  private def isIntegral(t: DataType): Boolean = t match {
    case LongType | IntegerType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.ByteType => true
    case _ => false
  }

  override def toJsonMap: java.util.LinkedHashMap[String, Object] = {
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("name", "sequence")
    m.put("variables", new java.util.ArrayList[Object](java.util.Arrays.asList(variables: _*)))
    m.put("dimension", dim)
    m
  }
}

/** Like Sequence but the *last* variable is bucketed into runs of `size`
  * starting at `start`: value -> (value - start) / size * size + start
  * (reference: partitioning/grouped.py:23-110). The bucketed partition
  * column is named `<var>_group` so the original values stay in the data
  * files; filter expressions address the bucket via that name. */
final case class GroupedSequencePartitioning(
    variables: Seq[String], dim: String, size: Int, start: Int = 0) extends Partitioning {
  require(variables.nonEmpty, "GroupedSequence requires at least one variable")
  require(size >= 2, s"GroupedSequence requires size >= 2; got $size")

  val groupCol: String = s"${variables.last}_group"
  override def name = "grouped-sequence"
  override def dimension: String = dim
  override def axis: Seq[String] = variables.init :+ groupCol
  override def identityCols: Seq[String] = variables.init
  override def inputCols: Seq[String] = variables
  override def colType(n: String, s: org.apache.spark.sql.types.StructType): DataType =
    if (n == groupCol) s.find(_.name == variables.last).map(_.dataType).getOrElse(LongType)
    else s.find(_.name == n).map(_.dataType).getOrElse(LongType)

  override def assign(df: DataFrame): DataFrame = {
    val v = col(variables.last)
    df.withColumn(groupCol, (floor((v - lit(start)) / lit(size)) * lit(size) + lit(start)).cast(colType(groupCol, df.schema)))
  }

  /** Bucketing is monotonic when the sole partition variable is the
    * axis: value -> floor((v - start) / size) * size + start. */
  override def axisKeyPrefix(canonical: Long, axisType: DataType,
                             zone: java.time.ZoneId): Option[Seq[Long]] =
    axisType match {
      case LongType | IntegerType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType if variables == Seq(dim) =>
        Some(Seq(Math.floorDiv(canonical - start, size.toLong) * size + start))
      case _ => None
    }

  override def toJsonMap: java.util.LinkedHashMap[String, Object] = {
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("name", "grouped-sequence")
    m.put("variables", new java.util.ArrayList[Object](java.util.Arrays.asList(variables: _*)))
    m.put("dimension", dim)
    m.put("size", Integer.valueOf(size))
    m.put("start", Integer.valueOf(start))
    m
  }
}

object Partitioning {
  /** Rebuild a strategy from its `toJsonMap` form (root-config round-trip). */
  def fromJsonMap(m: java.util.Map[String, Object]): Partitioning = {
    def strs(key: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      m.get(key).asInstanceOf[java.util.List[Object]].asScala.map(_.toString).toSeq
    }
    m.get("name").toString match {
      case "date" =>
        DatePartitioning(m.get("variable").toString, m.get("resolution").toString)
      case "sequence" =>
        SequencePartitioning(strs("variables"), m.get("dimension").toString)
      case "grouped-sequence" =>
        GroupedSequencePartitioning(
          strs("variables"), m.get("dimension").toString,
          m.get("size").toString.toInt, m.get("start").toString.toInt)
      case other => throw new IllegalArgumentException(s"unknown partitioning '$other'")
    }
  }
}
