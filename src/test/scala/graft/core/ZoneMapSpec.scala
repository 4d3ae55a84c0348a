package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Manifest zone maps (SURVEY r4 #4): commits record each new file's
  * axis [min,max] (from parquet FOOTER stats only) in the shard entries;
  * axis-range filters drop non-overlapping files from the scan BEFORE
  * the driver schedules them — pruning below partition granularity,
  * where previously only parquet row-group stats applied post-listing.
  */
class ZoneMapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkTs(rows: Seq[(Long, String, Double)]) = rows
    .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))

  test("timestamp axis: an axis-range filter scans only overlapping files") {
    val root = SparkTestSession.tmp("graft-zone-ts")
    val h10 = mkTs(Seq((1L, "2024-01-01 10:05:00", 1.0), (2L, "2024-01-01 10:55:00", 2.0)))
    val c = Collection.create(spark, root, h10.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(h10, MergeStrategy.Concat)                                        // file 1: 10:xx
    c.insert(mkTs(Seq((3L, "2024-01-01 11:05:00", 4.0))), MergeStrategy.Concat) // file 2: 11:xx
    c.insert(mkTs(Seq((4L, "2024-01-01 12:05:00", 8.0))), MergeStrategy.Concat) // file 3: 12:xx
    c.insert(mkTs(Seq((5L, "2024-01-02 09:00:00", 16.0))), MergeStrategy.Concat) // other day

    // stats were recorded for every committed file
    val man = c.currentManifest()
    assert(man.statsForFiles(man.files).size == man.files.size,
      "every committed file must carry an axis zone map")

    // one partition (day 1) holds three files; the range wants only one
    val q = c.query("ts >= '2024-01-01 12:00:00' and ts < '2024-01-02 00:00:00'")
    assert(q.inputFiles.length == 1,
      s"zone maps should prune to 1 file, scanned ${q.inputFiles.length}")
    assert(q.select("id").collect().map(_.getLong(0)).toSeq == Seq(4L))

    // a filter overlapping two files keeps exactly those two (the day-2
    // file dies by ITS stats even though partition pruning kept nothing out)
    val q2 = c.query("ts >= '2024-01-01 11:00:00' and ts <= '2024-01-01 23:00:00'")
    assert(q2.inputFiles.length == 2, s"want 2 files, got ${q2.inputFiles.length}")
    assert(q2.count() == 2)

    // correctness: pruned result == unpruned result with the same predicate
    val all = c.query().where(col("ts") >= lit("2024-01-01 11:00:00").cast("timestamp"))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val pruned = c.query("ts >= '2024-01-01 11:00:00'")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(pruned == all)

    // unknown columns still fail fast (tolerant pruning is not a typo hole)
    intercept[FilterExpr.ParseException](c.query("tz >= 5"))
    // partitions() keeps the strict partition-key-only contract
    intercept[FilterExpr.ParseException](c.partitions("ts > '2024-01-01'"))
  }

  test("axis-range filters prune PARTITIONS via the monotonic key derivation") {
    // two months of day-partitioned data => two shard subtrees
    // (year=2024/month=M); an axis range inside ONE month must load only
    // that month's shard — layer 1 working for a non-partition column
    val root = SparkTestSession.tmp("graft-zone-part")
    val rows = (1 to 9).map(d => (d.toLong, f"2024-01-$d%02d 10:00:00", 1.0)) ++
               (1 to 9).map(d => (d.toLong + 100, f"2024-02-$d%02d 10:00:00", 2.0))
    val df = mkTs(rows)
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(df)

    val c2 = Collection.open(spark, root, readOnly = true)
    val man2 = c2.currentManifest()
    assert(man2.shards.size == 2)
    assert(man2.loadedShardCount == 0)

    val q = c2.query("ts >= '2024-02-03 00:00:00' and ts < '2024-02-07 00:00:00'")
    assert(man2.loadedShardCount == 1,
      s"axis range inside February must load 1 shard, loaded ${man2.loadedShardCount}")
    assert(q.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(103L, 104L, 105L, 106L))

    // equality bounds both sides of the key interval
    assert(c2.query("ts == '2024-01-05 10:00:00'").count() == 1)
    assert(man2.loadedShardCount == 2) // January's shard loads now

    // the monotonic derivations themselves
    val utc = java.time.ZoneId.of("UTC")
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val feb3 = java.time.LocalDateTime.of(2024, 2, 3, 4, 5)
      .atZone(utc).toInstant
    val micros = feb3.getEpochSecond * 1000000L + feb3.getNano / 1000L
    assert(DatePartitioning("ts", "D").axisKeyPrefix(micros, TimestampType, utc)
      .contains(Seq(2024L, 2L, 3L)))
    assert(GroupedSequencePartitioning(Seq("seq"), "seq", 100)
      .axisKeyPrefix(750L, LongType, utc).contains(Seq(700L)))
    assert(GroupedSequencePartitioning(Seq("seq"), "seq", 100)
      .axisKeyPrefix(-1L, LongType, utc).contains(Seq(-100L)))
    assert(SequencePartitioning(Seq("a"), "a").axisKeyPrefix(5L, LongType, utc)
      .contains(Seq(5L)))
    assert(SequencePartitioning(Seq("a", "b"), "b").axisKeyPrefix(5L, LongType, utc).isEmpty,
      "multi-variable sequence has no monotonic axis derivation")
  }

  test("long axis: range filters prune by stats; equality uses both bounds") {
    val root = SparkTestSession.tmp("graft-zone-seq")
    val df = Seq((0L, 1L, 1.0)).toDF("a", "seq", "v")
    val c = Collection.create(spark, root, df.schema, "seq",
      SequencePartitioning(Seq("a"), "seq"))
    // partition a=0 accumulates 4 files with disjoint seq ranges
    c.insert((1L to 100L).map(i => (0L, i, i.toDouble)).toDF("a", "seq", "v"), MergeStrategy.Concat)
    c.insert((101L to 200L).map(i => (0L, i, i.toDouble)).toDF("a", "seq", "v"), MergeStrategy.Concat)
    c.insert((201L to 300L).map(i => (0L, i, i.toDouble)).toDF("a", "seq", "v"), MergeStrategy.Concat)
    c.insert((301L to 400L).map(i => (0L, i, i.toDouble)).toDF("a", "seq", "v"), MergeStrategy.Concat)

    // expected scan set per predicate, derived from the recorded stats
    // (each insert may split into several files — the zone map must keep
    // exactly the overlapping ones, never more)
    val man0 = c.currentManifest()
    val stats0 = man0.statsForFiles(man0.files)
    assert(stats0.size == man0.files.size, "every file needs a zone map")
    def overlapping(lo: Long, hi: Long): Int =
      stats0.count { case (_, byCol) =>
        val st = byCol("seq"); st.lo.toLong <= hi && st.hi.toLong >= lo
      }

    val q = c.query("seq > 305")
    assert(q.inputFiles.length == overlapping(306, Long.MaxValue))
    assert(q.inputFiles.length < man0.files.size, "nothing was pruned")
    assert(q.count() == 95)

    val qe = c.query("seq == 150")
    assert(qe.inputFiles.length == overlapping(150, 150))
    assert(qe.inputFiles.length < man0.files.size)
    assert(qe.select("v").collect().map(_.getDouble(0)).toSeq == Seq(150.0))

    // a filter over partition key AND axis composes all three layers
    val qb = c.query("a == 0 and seq <= 100")
    assert(qb.inputFiles.length == overlapping(Long.MinValue, 100))
    assert(qb.count() == 100)

    // drop + reinsert keeps stats consistent (shards rebuild with maps)
    c.insert((150L to 160L).map(i => (0L, i, 0.0)).toDF("a", "seq", "v"),
      MergeStrategy.Upsert())
    val man = c.currentManifest()
    assert(man.statsForFiles(man.files).size == man.files.size)
    assert(c.query("seq == 155").select("v").collect().map(_.getDouble(0)).toSeq == Seq(0.0))
  }

  test("NTZ axis: zone maps prune in the wallclock domain regardless of session zone") {
    // NTZ parquet footer stats are zone-free wallclock micros
    // (isAdjustedToUTC=false); decoding filter literals via the SESSION
    // zone would skew every comparison by the zone offset and silently
    // drop files that contain matching rows. Run the whole lifecycle in
    // UTC+8 to prove the domain is zone-free end to end.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
    try {
      val root = SparkTestSession.tmp("graft-zone-ntz")
      def mk(rows: Seq[(Long, String, Double)]) = rows.toDF("id", "ts", "v")
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
      val a = mk(Seq((1L, "2023-12-31 08:00:00", 1.0)))
      val c = Collection.create(spark, root, a.schema, "ts", DatePartitioning("ts", "D"))
      c.insert(a, MergeStrategy.Concat)                                          // file 1: 08:00
      c.insert(mk(Seq((2L, "2023-12-31 20:00:00", 2.0))), MergeStrategy.Concat)  // file 2: 20:00
      c.insert(mk(Seq((3L, "2024-01-01 10:00:00", 3.0))), MergeStrategy.Concat)  // next day

      val man = c.currentManifest()
      assert(man.statsForFiles(man.files).size == man.files.size,
        "NTZ files must carry zone maps (isAdjustedToUTC=false accepted)")

      // the session-zone decode bug in the concrete: in UTC+8 it mapped
      // '2024-01-01 00:00' to wallclock 2023-12-31 16:00 and pruned the
      // 20:00 file even though its row matches
      val q = c.query("ts <= '2024-01-01 00:00:00'")
      assert(q.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
        "wallclock-matching rows must survive pruning in a non-UTC session zone")

      // and pruning still bites, in the wallclock domain: day 2023-12-31
      // holds two files, an evening range keeps exactly the 20:00 one
      val q2 = c.query("ts >= '2023-12-31 18:00:00' and ts < '2024-01-01 00:00:00'")
      assert(q2.inputFiles.length == 1,
        s"want 1 overlapping file, scanned ${q2.inputFiles.length}")
      assert(q2.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))

      // partition pruning (layer 1) also derives wallclock calendar keys
      import org.apache.spark.sql.types.TimestampNTZType
      val wallclock = java.time.LocalDateTime.of(2023, 12, 31, 20, 0)
        .toInstant(java.time.ZoneOffset.UTC)
      val micros = wallclock.getEpochSecond * 1000000L
      assert(DatePartitioning("ts", "D")
        .axisKeyPrefix(micros, TimestampNTZType, java.time.ZoneId.of("Asia/Shanghai"))
        .contains(Seq(2023L, 12L, 31L)),
        "NTZ calendar keys must ignore the session zone")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
