package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.core._
import graft.sources.Tables

/** The round-2 durability surface, mirroring the reference's Icechunk
  * workflow (store/icechunk_store.py) and schema versioning
  * (schema/versioning.py): atomic commits, crash recovery via vacuum,
  * snapshot generations, schema evolution, compaction.
  *
  * Run: `sbt "runMain graft.examples.TransactionsAndEvolution"`.
  */
object TransactionsAndEvolution {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft-txn").toString + "/events"

    // every mutation is one atomic manifest commit; `generation` is the
    // snapshot counter views use to detect staleness. retainGenerations
    // keeps replaced history physically readable (compact() below is a
    // REPLACING commit — without retention its inputs would be GC'd and
    // the early snapshots below would no longer scan)
    val coll = Collection.create(spark, root, ev.schema, "ts",
      DatePartitioning("ts", "D"), retainGenerations = 8)
    coll.insert(ev.where(dayofmonth(col("ts")) <= 10))
    println(s"generation after load: ${coll.generation}")

    // incremental appends never rewrite existing files...
    coll.insert(ev.where(dayofmonth(col("ts")).between(11, 20)), MergeStrategy.Concat)
    // ...and compact() folds an accumulation of small append files back
    // into axis-sorted ones, atomically
    coll.compact("day <= 20")

    // schema evolution: old partitions read the fill, new inserts carry data
    coll.addVariable("score", DoubleType, fill = Some("0.0"))
    coll.insert(ev.where(dayofmonth(col("ts")) > 20)
      .withColumn("score", col("value") / 100.0))
    val byScore = coll.query().groupBy(col("score") > 0).count()
    byScore.show()

    // ...and RENAME (r11): metadata-only — files keep the pinned
    // physical name, the manifest maps it, every vintage reads under
    // the new logical name (old snapshots keep theirs via time travel)
    coll.renameVariable("score", "quality")
    println(s"renamed: ${coll.query("quality > 0", Seq("event_id")).count()} scored rows")

    // a writer that dies mid-insert leaves only invisible orphans
    // graceMs=0: we KNOW no other writer is running; the default 15-min
    // grace window protects concurrent writers' in-flight commits
    println(s"orphans reclaimed by vacuum: ${coll.vacuum(graceMs = 0).size}")
    println(s"rows visible: ${coll.query().count()} at generation ${coll.generation}")

    // time travel: every commit is a readable snapshot; with
    // retainGenerations = N even replaced history stays on disk until
    // vacuum() expires it
    println(s"history: generations ${coll.generations().mkString(", ")}")
    println(s"rows at generation 1: ${coll.snapshotAt(1).count()}")
    spark.stop()
  }
}
