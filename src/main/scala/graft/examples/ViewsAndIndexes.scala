package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core._
import graft.sources.Tables

/** Views and secondary indexes, mirroring the reference's ex_view.py and
  * ex_indexing.py: overlay a computed variable on a read-only base
  * collection, then build an equality index for partition pruning.
  *
  * Run: `sbt "runMain graft.examples.ViewsAndIndexes"`.
  */
object ViewsAndIndexes {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("graft-view").toString
    val base = graft.api.createCollection(spark, s"$tmp/base", ev.schema, "ts",
      graft.api.date("ts", "D"))
    base.insert(ev)

    // Overlay: per-partition value rank, stored NEXT TO the base (base
    // files untouched), positionally joined on read.
    val view = graft.api.createView(spark, s"$tmp/view", base)
    view.update { df =>
      val w = Window.partitionBy(col("year"), col("month"), col("day"))
        .orderBy(col("value"), col("event_id"))
      df.withColumn("value_rank", row_number().over(w))
    }
    view.query("day == 1", Seq("event_id", "value", "value_rank")).show(5)

    // Secondary index on event_type: equality queries scan only the
    // partitions the index proves relevant.
    val idx = graft.api.buildIndex(spark, base, Seq("event_type"), s"$tmp/idx")
    println(s"index rows: ${idx.table.count()}")
    println(s"purchases: ${idx.query(Map("event_type" -> "purchase")).count()}")
    spark.stop()
  }
}
