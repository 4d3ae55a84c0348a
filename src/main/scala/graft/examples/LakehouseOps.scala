package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.sources.Tables

/** Round-6 lakehouse-operations tour: the plain-Spark DataSource surface,
  * CHECK constraints, commit history, TIMESTAMP AS OF, partition
  * evolution, and the vacuum dry run.
  *
  * Run: `sbt "runMain graft.examples.LakehouseOps"`.
  */
object LakehouseOps {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft-lake").toString + "/events"
    val c = Collection.create(spark, root, ev.schema, axis = "ts",
      partitioning = DatePartitioning("ts", "D"),
      statsColumns = Seq("user_id"), retainGenerations = 8)

    // constraints guard every write job — even the initial load
    c.addConstraint("value_nonneg", "value >= 0")
    c.insert(ev)

    // the registered "graft" format: plain Spark SQL with skip-stack
    // pushdown (partition keys are first-class columns)
    spark.read.format("graft").load(root)
      .createOrReplaceTempView("events_lake")
    spark.sql("""SELECT event_type, count(*) AS n
                 FROM events_lake WHERE day <= 5 AND user_id = 3
                 GROUP BY event_type ORDER BY n DESC""").show()

    // SQL writes too: a registered table accepts INSERT INTO (derived
    // partition columns are recomputed from the axis, whatever you pass)
    spark.sql(s"CREATE TABLE events_tbl USING graft OPTIONS (path '$root')")
    spark.sql("""INSERT INTO events_tbl
                 SELECT event_id + 1000000, ts, user_id, event_type, value,
                        props, CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT)
                 FROM events_tbl WHERE event_id <= 3""")
    println(s"rows after SQL INSERT: ${spark.table("events_tbl").count()}")
    spark.sql("DROP TABLE events_tbl")

    val t0 = System.currentTimeMillis()
    c.updateWhere("event_type == 'click' and day <= 3",
      Map("event_type" -> "'early_click'"))

    // commit ledger + time travel by wall clock
    c.describeHistory().show(truncate = false)
    println(s"rows before the update: ${c.snapshotAsOf(t0).count()}")

    // evolve the layout in place: day -> hour; old handles refuse
    val hourly = c.changePartitioning(DatePartitioning("ts", "h"))
    println(s"partitions now hour-keyed: ${hourly.partitions().take(3)}")

    // what would GC reclaim? (nothing is touched)
    println(s"vacuum dry run: ${hourly.vacuum(graceMs = 0L, dryRun = true).size} reclaimable file(s)")

    spark.stop()
  }
}
