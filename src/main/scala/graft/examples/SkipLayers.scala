package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.sources.Tables

/** The five skip layers and the metadata ops, end to end on the events
  * table: declared hot-column zone maps, bloom filters, the root rollup,
  * metadata counts/bounds, and the `explainPruning` dry-run report.
  *
  * Run: `sbt "runMain graft.examples.SkipLayers"`.
  */
object SkipLayers {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft-skip").toString + "/events"

    // user_id: zone-mapped AND bloom-filtered; auto-compaction bounds
    // Concat fragmentation at 8 files per partition
    val c = Collection.create(spark, root, ev.schema, axis = "ts",
      partitioning = DatePartitioning("ts", "D"),
      statsColumns = Seq("user_id"),
      bloomColumns = Seq("user_id"), bloomNdv = Map("user_id" -> 100000L),
      autoCompactFiles = 8)
    c.insert(ev)

    // metadata ops: no scan, no Spark job
    println(s"rows (O(root)):            ${c.countRows()}")
    println(s"rows on Jan 5 (1 shard):   ${c.countRows("day == 5")}")
    println(s"user_id bounds:            ${c.columnBounds("user_id")}")

    // the dry-run report shows what each layer would eliminate
    println(s"axis range:   ${c.explainPruning("ts >= '2024-01-20 00:00:00'")}")
    println(s"hot column:   ${c.explainPruning("user_id >= 5 and user_id < 6")}")
    println(s"bloom equality: ${c.explainPruning("user_id in (7)")}")
    println(s"null filter:  ${c.explainPruning("user_id is not null and day == 3")}")

    // and the real scans match the report (inputFiles = scheduled files)
    val q = c.query("user_id in (7)")
    println(s"scan scheduled ${q.inputFiles.length} file(s), " +
      s"returned ${q.count()} row(s)")

    // time-travel reads prune with the snapshot's own stats
    val snap = c.snapshotAt(c.generation, "ts >= '2024-01-20 00:00:00'")
    println(s"snapshot scan: ${snap.inputFiles.length} file(s)")
    spark.stop()
  }
}
