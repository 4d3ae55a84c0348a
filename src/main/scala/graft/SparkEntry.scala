package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each entry maps to.
  *
  * Conventions shared by every query/oracle pair (driver hash-compares
  * DuckDB output against ours):
  *  - timestamps are emitted as epoch microseconds (`unix_micros` /
  *    `epoch_us`) so timezone-awareness and ns/us precision can't skew
  *    the comparison;
  *  - double aggregates are computed exactly in DECIMAL and cast to
  *    DOUBLE at the end, so summation order can't skew low bits;
  *  - every result is sorted on a unique key (hash compare may or may
  *    not be order sensitive — sorted is safe either way).
  */
object SparkEntry {

  /** Scratch root for collection round-trip queries (one per JVM). */
  private lazy val scratch: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-").toString
    sys.addShutdownHook {
      try {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(dir)).deleteRecursively()
      } catch { case _: Throwable => () }
    }
    dir
  }

  /** Collections are built once per (kind, sfDir) and shared by queries. */
  private val collCache = scala.collection.concurrent.TrieMap.empty[(String, String), Collection]

  /** The `events` table inserted into a Date(day)-partitioned collection. */
  private[graft] def eventsCollection(spark: SparkSession, sfDir: String): Collection =
    collCache.getOrElseUpdate(("events", sfDir), {
      val ev = Tables.events(spark, sfDir)
      val c = Collection.create(
        spark, s"$scratch/events-${sfDir.replaceAll("[^0-9.]", "")}",
        ev.schema, axis = "ts",
        partitioning = DatePartitioning("ts", "D"),
        catalogEnabled = true, overwrite = true)
      c.insert(ev)
      c
    })

  private def eventsOut(df: DataFrame): DataFrame =
    df.withColumn("ts_us", unix_micros(col("ts")))
      .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .orderBy("event_id")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("zc_insert_query")(spark, "/root/testdata/sf0.001")

  // --- decimal-exact aggregate helpers -----------------------------

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2: insert + full query round-trip through a Date(day) collection.
    "zc_insert_query" -> ((s, dir) => {
      eventsOut(eventsCollection(s, dir).query())
    }),

    // A3: partition-filter expression prunes the scan.
    "zc_query_filter" -> ((s, dir) => {
      eventsOut(eventsCollection(s, dir).query(
        filters = "month == 1 and day >= 10 and day <= 20"))
    }),

    // A4: variable projection reaches the parquet scan.
    "zc_query_project" -> ((s, dir) => {
      eventsCollection(s, dir)
        .query(filters = "day <= 5", variables = Seq("event_id", "value"))
        .orderBy("event_id")
    }),

    // B1: TPC-H Q1-style pricing summary.
    "q1_pricing" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      l.filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("decimal(38,2)").cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("decimal(38,2)").cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount"))))
            .cast("decimal(38,4)").cast("double").as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) *
              ((lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")) *
               (lit(1).cast("decimal(8,4)") + col("l_tax").cast("decimal(8,4)"))))
            .cast("decimal(38,6)").cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // B4: TPC-H Q6-style selective filter + aggregate.
    "q6_revenue" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      l.filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("decimal(38,4)").cast("double").as("revenue"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "zc_insert_query" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id, event_type, value, props
         FROM events ORDER BY event_id""",

    "zc_query_filter" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id, event_type, value, props
         FROM events
         WHERE month(CAST(ts AS TIMESTAMP)) = 1
           AND day(CAST(ts AS TIMESTAMP)) BETWEEN 10 AND 20
         ORDER BY event_id""",

    "zc_query_project" ->
      """SELECT event_id, value FROM events
         WHERE day(CAST(ts AS TIMESTAMP)) <= 5 ORDER BY event_id""",

    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * ((CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4))))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
                CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2000-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q6_revenue" ->
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""",
  )
}
