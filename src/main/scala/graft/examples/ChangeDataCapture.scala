package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._
import graft.sources.Tables
import graft.streaming.StreamOps

/** Round-6 CDC tour: the batch change feed, the streaming change feed,
  * and an incrementally-maintained aggregate (IVM) built on top of it.
  *
  * Run: `sbt "runMain graft.examples.ChangeDataCapture"`.
  */
object ChangeDataCapture {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    // CDC consumers need the FROM snapshot readable: size retention to
    // cover the consumer's lag
    val c = Collection.create(spark, s"$root/events", ev.schema, axis = "ts",
      partitioning = DatePartitioning("ts", "D"), retainGenerations = 8)
    c.insert(ev)

    // ---- batch change feed -----------------------------------------
    val g0 = c.generation
    c.updateWhere("event_type == 'click' and day >= 20",
      Map("event_type" -> "'late_click'"))
    println(s"changes($g0 -> ${c.generation}):")
    c.changes(g0, c.generation)
      .groupBy(Collection.ChangeTypeCol).count().show()

    // a compaction is CONTENT-preserving: the feed cancels to empty
    val g1 = c.generation
    c.compact()
    println(s"changes across a compaction: ${c.changes(g1, c.generation).count()} rows")

    // ---- incrementally-maintained aggregate (IVM) ------------------
    val tgtSchema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("n", LongType),
      StructField("sum_value", DecimalType(38, 4))))
    val agg = Collection.create(spark, s"$root/by-type", tgtSchema, "event_type",
      SequencePartitioning(Seq("event_type"), "event_type"))
    val q = StreamOps.maintainAggregate(spark, c, agg, Seq("event_type"), "n",
      Map("sum_value" -> "CAST(value AS DECIMAL(18,4))"))
    try {
      q.processAllAvailable() // snapshot seeds the aggregate
      c.updateWhere("event_type == 'view'", Map("event_type" -> "'seen'"))
      q.processAllAvailable() // the rename maintains through deltas:
      // 'view' empties (row deleted), 'seen' appears (row inserted)
      agg.query().orderBy("event_type").show()
    } finally q.stop()

    spark.stop()
  }
}
