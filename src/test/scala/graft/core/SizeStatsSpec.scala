package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Manifest-recorded FILE SIZES (r8): captured off the FileStatus the
  * commit-time footer pass already opens (zero extra RPCs), rolled up
  * to a root-level byte total — so `sizeOnDisk()`, compaction planning
  * and the SQL relation's CBO `sizeInBytes` are all metadata-only.
  */
class SizeStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mk(n: Int) = (0 until n).map(i =>
    (i.toLong, f"2024-01-${i % 3 + 1}%02d 10:00:00", i.toDouble))
    .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))

  private def diskBytes(root: String): Long = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(root))
      .filter(f => f.getName.endsWith(".parquet") && !f.getPath.contains("/_"))
      .map(_.length).sum
  }

  private def fresh(root: String): Collection = {
    val df = mk(30)
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(df)
    c
  }

  test("sizeOnDisk matches the physical bytes and tracks mutations") {
    val root = SparkTestSession.tmp("size-basic")
    val c = fresh(root)
    assert(c.sizeOnDisk().contains(diskBytes(root)),
      s"recorded ${c.sizeOnDisk()} vs physical ${diskBytes(root)}")
    c.deleteWhere("id <= 4")
    assert(c.sizeOnDisk().contains(diskBytes(root)), "delete must re-roll the totals")
    c.insert(mk(10).withColumn("id", col("id") + 100L), MergeStrategy.Concat)
    c.compact()
    assert(c.sizeOnDisk().contains(diskBytes(root)), "compact must re-roll the totals")
    assert(c.backfillStats() == 0, "freshly written files need no backfill")
  }

  test("clones carry byte rollups; materialize keeps them") {
    val c = fresh(SparkTestSession.tmp("size-clone"))
    val dst = c.cloneTo(SparkTestSession.tmp("size-clone-dst"))
    assert(dst.sizeOnDisk() == c.sizeOnDisk(),
      "the zero-copy clone reports the referenced bytes")
    dst.materialize()
    assert(dst.sizeOnDisk() == c.sizeOnDisk(), "materialize preserves sizes by re-key")
  }

  test("CBO: a small registered graft table auto-broadcasts in a join") {
    val root = SparkTestSession.tmp("size-cbo")
    fresh(root)
    val dim = spark.read.format("graft").load(root)
    val fact = spark.range(0L, 200000L).select(
      (col("id") % 30).as("id"), (col("id") * 2).as("m"))
    val joined = fact.join(dim, "id")
    val planned = joined.queryExecution.sparkPlan.toString
    assert(planned.contains("BroadcastHashJoin"),
      s"a ~KB-sized graft relation must land on the broadcast side:\n$planned")
    assert(joined.count() == 200000L)
  }

  test("compactPlan budgets from recorded bytes (exact selection)") {
    val root = SparkTestSession.tmp("size-plan")
    val df = mk(30)
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    // fragment: 3 id-range inserts, each spanning every day partition
    // -> every partition holds 3 files
    (0 until 3).foreach(i => c.insert(
      df.where(col("id") >= i * 10 && col("id") < (i + 1) * 10), MergeStrategy.Concat))
    val all = c.compactPlan(maxBytes = Long.MaxValue / 2)
    assert(all.nonEmpty, "every partition is fragmented")
    // a one-byte budget selects nothing; a budget of exactly the first
    // candidate's recorded bytes selects exactly it
    assert(c.compactPlan(maxBytes = 1L).isEmpty)
    val firstBytes = {
      val m = c.describePartitions().where(col("partition") === all.head)
        .select("bytes").collect()
      if (m.nonEmpty && !m.head.isNullAt(0)) m.head.getLong(0) else -1L
    }
    if (firstBytes > 0)
      assert(c.compactPlan(maxBytes = firstBytes) == Seq(all.head))
  }
}
