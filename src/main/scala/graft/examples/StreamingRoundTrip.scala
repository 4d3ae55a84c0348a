package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.sources.Tables
import graft.streaming.StreamOps

/** Streaming both ways: a collection as a manifest-consistent SOURCE
  * (offsets are committed manifest generations — crash orphans and
  * retention-kept files are invisible) and as an exactly-once SINK
  * (each micro-batch is one atomic insert commit carrying its batch id,
  * so foreachBatch replays are skipped).
  *
  * Run: `sbt "runMain graft.examples.StreamingRoundTrip"`.
  */
object StreamingRoundTrip {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")

    // a source collection, filled by ordinary batch inserts
    val src = Collection.create(spark, s"$tmp/src", ev.schema, "ts",
      DatePartitioning("ts", "D"))
    src.insert(ev)

    // 1. stream it OUT — only committed files are ever discovered
    val windows = StreamOps.windowedAggAppendOnce(spark, src, "ts", "1 hour") {
      _.agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    }
    println(s"finalized hourly windows: ${windows.count()}")

    // 2. stream it INTO a second collection — exactly-once per batch
    val dst = Collection.create(spark, s"$tmp/dst", src.schema, "ts",
      DatePartitioning("ts", "D"))
    val q = StreamOps.insertStream(
      StreamOps.readStream(spark, src), dst, "roundtrip", s"$tmp/ckpt")
    try q.processAllAvailable() finally q.stop()
    println(s"ingested rows: ${dst.query().count()} (source: ${src.query().count()})")
    println(s"committed batch high-water mark: ${dst.streamHighWaterMark("roundtrip")}")

    // 3. new commits stream incrementally: insert more, the running
    // pattern would pick up exactly the new generation's files
    src.insert(ev.withColumn("event_id", col("event_id") + 1000000L),
      MergeStrategy.Concat)
    val q2 = StreamOps.insertStream(
      StreamOps.readStream(spark, src), dst, "roundtrip", s"$tmp/ckpt")
    try q2.processAllAvailable() finally q2.stop()
    println(s"after incremental commit: ${dst.query().count()} rows")

    spark.stop()
  }
}
