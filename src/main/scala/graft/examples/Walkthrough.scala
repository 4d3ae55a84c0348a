package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.sources.Tables

/** End-to-end walkthrough, mirroring the reference's
  * examples/ex_walkthrough.py + ex_collection.py: create a collection,
  * insert with merge strategies, filter-query, update, drop.
  *
  * Run: `sbt "runMain graft.examples.Walkthrough"`.
  */
object Walkthrough {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft-walk").toString + "/events"

    // 1. create + insert (Date partitioning by day)
    val coll = graft.api.createCollection(spark, root, ev.schema, "ts",
      graft.api.date("ts", "D"), catalogEnabled = true)
    coll.insert(ev)
    println(s"partitions: ${coll.partitions().size}")

    // 2. pruned query through the filter mini-language
    val week2 = coll.query("day >= 8 and day <= 14", Seq("event_id", "ts", "value"))
    println(s"week-2 rows: ${week2.count()}")

    // 3. merge strategies: re-acquisition with jittered timestamps
    val reacq = ev.where(dayofmonth(col("ts")) === 10)
      .withColumn("ts", col("ts") + expr("INTERVAL 20 milliseconds"))
      .withColumn("value", col("value") + 1)
    coll.insert(reacq, MergeStrategy.Upsert(Some(50000L))) // 50ms tolerance
    println(s"after upsert: ${coll.query("day == 10").count()}")

    // 4. update in place (touched partitions only)
    coll.update(df => df.withColumn("value", col("value") * 2), filters = "day <= 2")

    // 5. drop old partitions
    val dropped = coll.dropPartitions("day <= 2")
    println(s"dropped: ${dropped.mkString(", ")}")
    spark.stop()
  }
}
