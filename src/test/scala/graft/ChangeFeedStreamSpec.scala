package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Collection, DatePartitioning, MergeStrategy}
import graft.streaming.StreamOps

/** Streaming CHANGE FEED (round 6): the Delta-CDF-shaped streaming read
  * over a collection — first batch = starting snapshot as inserts, each
  * later batch = the exact row-level [[Collection.changes]] diff of its
  * generation range, delivered with `_change_type`.
  */
class ChangeFeedStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mk(vals: (Long, String, Double)*) = vals
    .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))

  private def fresh(root: String): Collection = {
    val df = mk((1L, "2024-01-01 10:00:00", 1.0), (2L, "2024-01-01 11:00:00", 2.0),
      (3L, "2024-01-02 10:00:00", 3.0))
    val c = Collection.create(spark, root, df.schema, "ts",
      DatePartitioning("ts", "D"), statsColumns = Seq("id"),
      retainGenerations = 8)
    c.insert(df)
    c
  }

  private def table(name: String) =
    spark.table(name).select("id", "v", Collection.ChangeTypeCol).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq

  test("snapshot as inserts, updates as delete+insert, compaction invisible") {
    val c = fresh(SparkTestSession.tmp("graft-cdcstream"))
    val name = "graft_cdc_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamOps.readChangeFeed(spark, c)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(table(name) == Seq((1L, 1.0, "insert"), (2L, 2.0, "insert"), (3L, 3.0, "insert")),
        s"first batch must be the snapshot as inserts: ${table(name)}")

      c.updateWhere("id == 2", Map("v" -> "v + 10.0"))
      q.processAllAvailable()
      val afterUpdate = table(name)
      assert(afterUpdate.contains((2L, 2.0, "delete")) && afterUpdate.contains((2L, 12.0, "insert")),
        s"update must stream as delete-old + insert-new: $afterUpdate")
      assert(afterUpdate.count(t => t._1 == 1L || t._1 == 3L) == 2,
        s"carried rows must not re-deliver: $afterUpdate")

      // fragment + compact: a content-preserving rewrite cancels
      c.insert(mk((4L, "2024-01-01 12:00:00", 4.0)), MergeStrategy.Concat)
      q.processAllAvailable()
      val preCompact = table(name)
      c.compact()
      q.processAllAvailable()
      assert(table(name) == preCompact,
        s"compaction must stream nothing: ${table(name)} vs $preCompact")

      // deleteWhere streams the removed rows as deletes
      c.deleteWhere("id == 1")
      q.processAllAvailable()
      assert(table(name).contains((1L, 1.0, "delete")),
        s"deleteWhere must stream a delete record: ${table(name)}")
    } finally q.stop()
  }

  test("startingGeneration / startingTimestamp: streams tail from an offset, no snapshot backfill") {
    val c = fresh(SparkTestSession.tmp("graft-startgen"))
    val gHead = c.generation
    val tHead = c.manifestAt(gHead).committedAtMs.get

    // append mode from the current head: only post-head commits arrive
    val n1 = "graft_sg_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q1 = StreamOps.readStream(spark, c,
        Map("startingGeneration" -> gHead.toString))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(n1).start()
    try {
      q1.processAllAvailable()
      assert(spark.table(n1).count() == 0, "nothing before the offset may stream")
      c.insert(mk((50L, "2024-01-03 12:00:00", 50.0)), MergeStrategy.Concat)
      q1.processAllAvailable()
      assert(spark.table(n1).select("id").collect().map(_.getLong(0)).toSeq == Seq(50L))
    } finally q1.stop()

    // CDC mode from a timestamp at the head: the update streams as a
    // diff, never as a snapshot
    val n2 = "graft_st_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q2 = StreamOps.readChangeFeed(spark, c,
        Map("startingTimestamp" -> tHead.toString))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(n2).start()
    try {
      q2.processAllAvailable()
      val first = spark.table(n2).select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(first == Seq(50L), s"only the post-timestamp insert may arrive: $first")
      c.updateWhere("id == 50", Map("v" -> "51.0"))
      q2.processAllAvailable()
      val t2 = spark.table(n2)
        .select("id", "v", Collection.ChangeTypeCol).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
      assert(t2.contains((50L, 50.0, "delete")) && t2.contains((50L, 51.0, "insert")),
        s"update must arrive as a diff: $t2")
    } finally q2.stop()

    // both options together refuse
    intercept[Exception] {
      val q3 = StreamOps.readStream(spark, c, Map(
        "startingGeneration" -> "1", "startingTimestamp" -> "0")).writeStream
        .format("memory")
        .queryName("graft_both_" + java.util.UUID.randomUUID().toString.replace("-", ""))
        .start()
      try q3.processAllAvailable() finally q3.stop()
    }
  }

  test("maintainAggregate: IVM target tracks GROUP BY through inserts, moves, and group deletion") {
    import org.apache.spark.sql.types._
    val mkk = (vals: Seq[(Long, String, Long, Double)]) => vals
      .toDF("id", "ts", "k", "v").withColumn("ts", col("ts").cast("timestamp"))
    val df0 = mkk((1L to 9L).map(i => (i, "2024-01-01 10:00:00", i % 3, i.toDouble)))
    val root = SparkTestSession.tmp("graft-ivm")
    val src = Collection.create(spark, root, df0.schema, "ts",
      DatePartitioning("ts", "D"), statsColumns = Seq("k"), retainGenerations = 8)
    src.insert(df0)
    val tgtSchema = StructType(Seq(StructField("k", LongType),
      StructField("n", LongType), StructField("s", DecimalType(38, 4))))
    val tgt = Collection.create(spark, root + "-agg", tgtSchema, "k",
      graft.core.SequencePartitioning(Seq("k"), "k"))

    def direct(): Seq[(Long, Long, BigDecimal)] = src.query()
      .groupBy("k").agg(count(lit(1)).as("n"),
        sum(expr("CAST(v AS DECIMAL(18,4))")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
      .sortBy(_._1).toSeq
    def maintained(): Seq[(Long, Long, BigDecimal)] = tgt.query()
      .collect().map(r => (r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
      .sortBy(_._1).toSeq

    val ckpt = SparkTestSession.tmp("graft-ivm-ckpt")
    def start() = StreamOps.maintainAggregate(spark, src, tgt, Seq("k"), "n",
      Map("s" -> "CAST(v AS DECIMAL(18,4))"),
      queryName = "ivm-spec", checkpoint = Some(ckpt))
    val q = start()
    try {
      q.processAllAvailable()
      assert(maintained().map(t => (t._1, t._2)) == Seq((0L, 3L), (1L, 3L), (2L, 3L)),
        s"snapshot must seed the aggregate: ${maintained()}")

      src.insert(mkk(Seq((10L, "2024-01-02 10:00:00", 0L, 100.0))), MergeStrategy.Concat)
      q.processAllAvailable()
      assert(maintained().map(_._2).sum == direct().map(_._2).sum &&
        maintained() == direct(), s"insert delta: ${maintained()} vs ${direct()}")

      // a value update maintains the sum through the delete+insert pair
      src.updateWhere("id == 5", Map("v" -> "v + 1000.0"))
      q.processAllAvailable()
      assert(maintained() == direct(), s"value update: ${maintained()} vs ${direct()}")

      // emptying a group must REMOVE its row (delete-when clause)
      src.deleteWhere("k == 1")
      q.processAllAvailable()
      assert(maintained().map(_._1) == Seq(0L, 2L),
        s"emptied group must disappear: ${maintained()}")
      assert(maintained() == direct(), s"after group deletion: ${maintained()} vs ${direct()}")
    } finally q.stop()

    // exactly-once across a RESTART: the checkpoint resumes offsets and
    // the per-batch mark in the target manifest dedupes any replays —
    // the aggregate neither double-counts nor misses the new commit
    assert(tgt.streamHighWaterMark("ivm-spec").isDefined,
      "merges must record their batch high-water mark")
    src.insert(mkk(Seq((20L, "2024-01-03 10:00:00", 2L, 7.0))), MergeStrategy.Concat)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(maintained() == direct(),
        s"restarted IVM must stay exact: ${maintained()} vs ${direct()}")
    } finally q2.stop()
  }

  test("replicateChanges: the mirror tracks inserts, updates, and deletes row-for-row") {
    val src = fresh(SparkTestSession.tmp("graft-repl-src"))
    val tgt = Collection.create(spark, SparkTestSession.tmp("graft-repl-tgt"),
      src.schema, "ts", DatePartitioning("ts", "D"), statsColumns = Seq("id"))

    def rows(c: Collection) = c.query().select("id", "v")
      .as[(Long, Double)].collect().sorted.toSeq
    val q = StreamOps.replicateChanges(spark, src, tgt, Seq("id"))
    try {
      q.processAllAvailable()
      assert(rows(tgt) == rows(src), s"snapshot seed: ${rows(tgt)} vs ${rows(src)}")

      src.insert(mk((10L, "2024-01-03 12:00:00", 10.0)), MergeStrategy.Concat)
      src.updateWhere("id == 2", Map("v" -> "v + 100.0"))
      q.processAllAvailable()
      assert(rows(tgt) == rows(src), s"insert+update: ${rows(tgt)} vs ${rows(src)}")

      src.deleteWhere("id == 1")
      q.processAllAvailable()
      assert(rows(tgt) == rows(src), s"delete: ${rows(tgt)} vs ${rows(src)}")
      assert(!rows(tgt).exists(_._1 == 1L))

      // a compaction on the source is invisible to the replica
      src.insert(mk((11L, "2024-01-03 13:00:00", 11.0)), MergeStrategy.Concat)
      src.compact()
      q.processAllAvailable()
      assert(rows(tgt) == rows(src), s"post-compaction: ${rows(tgt)} vs ${rows(src)}")
    } finally q.stop()
  }

  test("filters apply to rows of the diff; partition-derived names refuse at start") {
    val c = fresh(SparkTestSession.tmp("graft-cdcstream-filter"))
    val name = "graft_cdcf_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamOps.readChangeFeed(spark, c, Map("filters" -> "id >= 2"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(table(name).map(_._1).toSet == Set(2L, 3L),
        s"row filter must apply to the feed: ${table(name)}")
    } finally q.stop()

    val ex = intercept[Exception] {
      val q2 = StreamOps.readChangeFeed(spark, c, Map("filters" -> "day == 1"))
        .writeStream.format("memory")
        .queryName("graft_cdcref_" + java.util.UUID.randomUUID().toString.replace("-", ""))
        .start()
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(ex.getMessage.contains("DATA columns only") ||
      Option(ex.getCause).exists(_.getMessage.contains("DATA columns only")),
      s"partition-derived filter must refuse loudly: ${ex.getMessage}")
  }
}
