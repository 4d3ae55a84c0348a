package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables.
  *
  * The `events` table carries nanosecond parquet timestamps, which Spark's
  * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]); we read them via the
  * `nanosAsLong` escape hatch and truncate to microseconds — the same
  * floor-truncation DuckDB applies when casting TIMESTAMP_NS to TIMESTAMP,
  * so both engines observe identical values.
  */
object Tables {

  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  // NOTE: the test tables are single-row-group parquet files, so Spark
  // cannot parallelize the scan itself (row groups are the split unit);
  // operators that need post-scan parallelism repartition explicitly.
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** `events` with `ts` as a microsecond TimestampType column.
    *
    * The generator has shipped `ts` as nanosecond parquet timestamps
    * (readable only as int64 via the `nanosAsLong` escape hatch) and as
    * plain microsecond timestamps (which Spark reads as TIMESTAMP_NTZ);
    * branch on the physical type so either vintage loads. All sessions
    * run with timeZone=UTC, so the NTZ→TimestampType cast is
    * value-preserving and downstream code sees one schema either way. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val prev = spark.conf.getOption(NanosKey)
    spark.conf.set(NanosKey, "true")
    try {
      val df = spark.read.parquet(s"$sfDir/events.parquet")
      val ts = df.schema("ts").dataType match {
        case LongType         => expr("timestamp_micros(ts div 1000)")
        case TimestampNTZType => col("ts").cast(TimestampType)
        case _                => col("ts")
      }
      df.withColumn("ts", ts)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } finally prev match {
      case Some(v) => spark.conf.set(NanosKey, v)
      case None    => spark.conf.unset(NanosKey)
    }
  }
}
