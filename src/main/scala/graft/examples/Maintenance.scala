package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.sources.Tables

/** Round-6 operations tour: budgeted compaction planning, z-ordered
  * rewrites, the object-store commit-arbiter seam, and the
  * xarray-shaped per-partition array records.
  *
  * Run: `sbt "runMain graft.examples.Maintenance"`.
  */
object Maintenance {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft-maint").toString + "/events"
    val c = Collection.create(spark, root, ev.schema, axis = "ts",
      partitioning = DatePartitioning("ts", "D"),
      statsColumns = Seq("user_id"))
    // fragment a few partitions with small appends
    ev.where(dayofmonth(col("ts")) <= 10).collect() // force plan once
    (0 until 4).foreach { i =>
      c.insert(ev.where(pmod(col("event_id"), lit(4)) === i), MergeStrategy.Concat)
    }

    // 1. budgeted maintenance: plan the most-fragmented partitions under
    // a byte ceiling (metadata ranking; only candidates get stat'ed),
    // then rewrite exactly that plan in one atomic commit
    val plan = c.compactPlan(maxBytes = 8L << 20)
    println(s"compaction plan (${plan.size} partitions): ${plan.take(3).mkString(", ")} ...")
    c.compactPartitions(plan)

    // 2. Z-ORDER a hot partition set: per-file zone maps tighten on
    // user_id AND value simultaneously, so filters on either skip files
    c.compactPartitions(c.partitions("day <= 5"), clusterBy = Seq("user_id", "value"))
    val q = c.query("user_id < 100 and day <= 5")
    println(s"z-clustered scan: ${q.inputFiles.length} file(s), ${q.count()} row(s)")

    // 3. object-store deployments: filesystems without an exclusive
    // rename REFUSE to commit until an arbiter is registered — a
    // conditional-PUT/lock adapter, or the explicit single-writer
    // declaration below (shown for a hypothetical "s3x" scheme)
    Collection.registerCommitArbiter("s3x", Collection.UnsafeSingleWriterArbiter)
    Collection.unregisterCommitArbiter("s3x")

    // 4. the xarray escape hatch: one record per partition, each
    // variable an axis-ordered array (reference Dataset/to_xarray shape)
    val arr = c.queryArrays("day <= 3", Seq("event_id", "value"))
    arr.select(col("day"), col("n"), slice(col("value"), 1, 3).as("value_head"))
      .orderBy("day").show(3, truncate = false)
    // ... and back: arraysToRows inverts the packing exactly
    println(s"round trip rows: ${Collection.arraysToRows(arr,
      Seq("ts", "event_id", "value")).count()} == ${c.query("day <= 3").count()}")

    // 5. row-level DELETE: a targeted purge (PII takedown, contaminated
    // docs) rewrites ONLY the files whose zone maps admit a match —
    // everything else carries over by name. On a collection created
    // with attrs = Map(Collection.DvEnabledAttr -> "true"), the same
    // call writes DELETION VECTORS instead (r11): zero data files
    // rewritten, cost proportional to the deleted rows, and compact()
    // materializes the masks back into clean files whenever you choose.
    val touched = c.deleteWhere("user_id == 13 and day <= 5")
    println(s"deleteWhere rewrote ${touched.size} file(s); " +
      s"user 13 rows in days 1-5 now: ${c.query("user_id == 13 and day <= 5").count()}")

    // 6. metadata-only TTL: partitions whose recorded axis upper bound
    // predates the cutoff drop with zero data IO
    val expired = c.expirePartitions("2024-01-03 00:00:00")
    println(s"expired ${expired.size} partition(s): ${expired.mkString(", ")}")

    // 7. (r8) tag the current state, then branch a zero-copy sandbox:
    // the branch mutates freely (its rewrites DROP references to the
    // parent's files, never delete them), the tag pins this snapshot
    // against GC until released
    c.tag("pre-experiment")
    val dev = c.branch("exp-42")
    dev.updateWhere("event_type == 'click'", Map("value" -> "value * 2.0"))
    println(s"branch rows: ${dev.query().count()} (parent: ${c.query().count()}, " +
      s"branches: ${c.branches().mkString(",")}, tags: ${c.tags().keys.mkString(",")})")
    // the experiment worked: merge the branch's row diff back into the
    // parent (one atomic commit), then clean up
    val promoted = c.promoteBranch("exp-42")
    println(s"promoted exp-42: ${promoted.size} partition(s) touched")
    c.dropBranch("exp-42")
    c.deleteTag("pre-experiment")

    // 8. (r8) a standalone SHALLOW CLONE: same zero-copy fork at an
    // arbitrary root — the 100 TB dev/test sandbox (clone, experiment
    // destructively, drop; the source never learns it existed)
    val cloneRoot = java.nio.file.Files.createTempDirectory("graft-clone").toString + "/fork"
    val fork = c.cloneTo(cloneRoot)
    println(s"clone at generation ${fork.generation}: ${fork.query().count()} row(s), " +
      s"external refs: ${fork.isExternalClone}")

    spark.stop()
  }
}
