package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Row-level DELETE with file-granular rewrites (round 6).
  *
  * The contract under test: `deleteWhere(filters)` removes exactly the
  * rows where the predicate is TRUE (SQL DELETE semantics — NULL keeps),
  * rewrites ONLY the files the skip layers cannot prove unaffected, and
  * carries every other file into the new manifest untouched.
  */
class DeleteWhereSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Three Concat inserts into ONE day-partition, each with a tight,
    * disjoint user_id range, so the zone maps discriminate per file. */
  private def threeSliceColl(root: String): Collection = {
    def mk(lo: Long, hi: Long, hour: String) = (lo until hi)
      .map(i => (i, s"2024-01-01 $hour:00:00", i, 1.0))
      .toDF("id", "ts", "user_id", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val b1 = mk(0, 50, "08")
    val c = Collection.create(spark, root, b1.schema, "ts",
      DatePartitioning("ts", "D"), statsColumns = Seq("user_id"))
    c.insert(b1, MergeStrategy.Concat)
    c.insert(mk(100, 150, "12"), MergeStrategy.Concat)
    c.insert(mk(200, 250, "16"), MergeStrategy.Concat)
    c
  }

  test("delete rewrites only files whose zone maps admit a match") {
    val c = threeSliceColl(SparkTestSession.tmp("graft-del-files"))
    val before = c.currentManifest().files
    val stats = c.currentManifest().statsForFiles(before)
    val mustTouch = before.filter { f =>
      val st = stats(f)("user_id"); st.lo.toLong <= 149 && st.hi.toLong >= 100
    }.toSet
    assert(mustTouch.nonEmpty && mustTouch.size < before.size,
      "test needs a discriminating layout")

    val touched = c.deleteWhere("user_id >= 100 and user_id < 150").toSet
    assert(touched == mustTouch,
      s"expected exactly the stats-admitting files, got $touched vs $mustTouch")

    val after = c.currentManifest().files.toSet
    // untouched files carried over BY NAME — no rewrite, no data IO
    (before.toSet -- mustTouch).foreach(f =>
      assert(after.contains(f), s"untouched file $f must survive the commit"))
    touched.foreach(f => assert(!after.contains(f), s"deleted-from file $f must be replaced"))

    val ids = c.query().select("id").as[Long].collect().sorted.toSeq
    assert(ids == ((0L until 50L) ++ (200L until 250L)).toSeq)
  }

  test("no-op delete: filter disjoint from every zone map commits nothing") {
    val c = threeSliceColl(SparkTestSession.tmp("graft-del-noop"))
    val gen = c.generation
    assert(c.deleteWhere("user_id >= 5000").isEmpty)
    assert(c.generation == gen, "a no-op delete must not commit")
  }

  test("NULL predicate rows are kept; is-null deletes exactly the null rows") {
    val root = SparkTestSession.tmp("graft-del-null")
    val df = Seq(
      (1L, "2024-01-01 08:00:00", Some(5L)),
      (2L, "2024-01-01 09:00:00", None),
      (3L, "2024-01-01 10:00:00", Some(7L)),
    ).toDF("id", "ts", "user_id").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(df)

    c.deleteWhere("user_id == 5") // NULL row must NOT be deleted
    assert(c.query().select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))

    c.deleteWhere("user_id is null")
    assert(c.query().select("id").as[Long].collect().sorted.toSeq == Seq(3L))
  }

  test("deleting every row of a partition removes the partition") {
    val root = SparkTestSession.tmp("graft-del-part")
    val df = Seq(
      (1L, "2024-01-01 08:00:00"), (2L, "2024-01-01 09:00:00"),
      (3L, "2024-01-02 08:00:00"),
    ).toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(df)
    assert(c.partitions().size == 2)

    c.deleteWhere("day == 1")
    assert(c.partitions() == Seq("year=2024/month=1/day=2"))
    assert(c.query().select("id").as[Long].collect().toSeq == Seq(3L))
    assert(c.countRows() == 1L)
  }

  test("delete on mixed data/axis filters matches NOT(predicate) of a full scan") {
    val c = threeSliceColl(SparkTestSession.tmp("graft-del-mixed"))
    c.deleteWhere("v > 0.0 and user_id >= 140 and user_id < 220")
    val got = c.query().select("id").as[Long].collect().sorted.toSeq
    assert(got == ((0L until 50L) ++ (100L until 140L) ++ (220L until 250L)).toSeq)
  }

  test("expirePartitions: metadata-only axis TTL on a partitioning with no time key") {
    val root = SparkTestSession.tmp("graft-expire")
    // Sequence-partitioned by an int key — dropPartitions has no key
    // filter that expresses a TIME cutoff; expiry must come from stats
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L), (2L, "2024-01-02 10:00:00", 1L), // grp 1: all old
      (3L, "2024-01-02 10:00:00", 2L), (4L, "2024-01-05 10:00:00", 2L), // grp 2: straddles
      (5L, "2024-01-06 10:00:00", 3L),                                  // grp 3: all new
    ).toDF("id", "ts", "grp").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts",
      SequencePartitioning(Seq("grp"), "ts"))
    c.insert(df)
    assert(c.partitions().size == 3)

    val dropped = c.expirePartitions("2024-01-03 00:00:00")
    assert(dropped == Seq("grp=1"), s"expected only the all-old partition, got $dropped")
    assert(c.partitions().sorted == Seq("grp=2", "grp=3"))
    assert(c.query().select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L, 5L))

    // idempotent: nothing else is provably old; no commit happens
    val gen = c.generation
    assert(c.expirePartitions("2024-01-03 00:00:00").isEmpty)
    assert(c.generation == gen)

    // a later cutoff takes the straddler once its newest row ages out
    assert(c.expirePartitions("2024-01-06 00:00:00") == Seq("grp=2"))
    assert(c.partitions() == Seq("grp=3"))
  }

  test("updateWhere rewrites only files whose zone maps admit a match") {
    val c = threeSliceColl(SparkTestSession.tmp("graft-upd-files"))
    val before = c.currentManifest().files
    val stats = c.currentManifest().statsForFiles(before)
    val mustTouch = before.filter { f =>
      val st = stats(f)("user_id"); st.lo.toLong <= 149 && st.hi.toLong >= 100
    }.toSet
    assert(mustTouch.nonEmpty && mustTouch.size < before.size)

    val touched = c.updateWhere("user_id >= 100 and user_id < 150",
      Map("v" -> "v * 10")).toSet
    assert(touched == mustTouch,
      s"expected exactly the stats-admitting files, got $touched vs $mustTouch")

    val after = c.currentManifest().files.toSet
    (before.toSet -- mustTouch).foreach(f =>
      assert(after.contains(f), s"untouched file $f must survive the commit"))

    // exactly the matching rows changed; everything else byte-identical
    val got = c.query().select("id", "v").as[(Long, Double)].collect().toMap
    ((0L until 50L) ++ (100L until 150L) ++ (200L until 250L)).foreach { i =>
      val want = if (i >= 100 && i < 150) 10.0 else 1.0
      assert(got(i) == want, s"row $i: expected v=$want got ${got(i)}")
    }
    assert(c.countRows() == 150L, "update must not add or remove rows")
  }

  test("updateWhere: NULL predicate rows keep their values; types preserved") {
    val root = SparkTestSession.tmp("graft-upd-null")
    val df = Seq(
      (1L, "2024-01-01 08:00:00", Some(5L), "a"),
      (2L, "2024-01-01 09:00:00", None, "b"),
      (3L, "2024-01-01 10:00:00", Some(7L), "c"),
    ).toDF("id", "ts", "user_id", "tag")
      .withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(df)

    c.updateWhere("user_id == 5", Map("tag" -> "'hit'", "user_id" -> "user_id + 100"))
    val rows = c.query().select("id", "user_id", "tag")
      .as[(Long, Option[Long], String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, Some(105L), "hit"), (2L, None, "b"), (3L, Some(7L), "c")))
    assert(c.schema("user_id").dataType.typeName == "long",
      "assignment must preserve the column's type")
  }

  test("updateWhere refuses axis/partition-column assignments and unknown columns") {
    val c = threeSliceColl(SparkTestSession.tmp("graft-upd-guard"))
    intercept[IllegalArgumentException](c.updateWhere("user_id == 1", Map("ts" -> "ts")))
    intercept[IllegalArgumentException](c.updateWhere("user_id == 1", Map("nope" -> "1")))
    intercept[IllegalArgumentException](c.updateWhere("user_id == 1", Map.empty))
    intercept[IllegalArgumentException](c.updateWhere(null, Map("v" -> "0.0")))
    val gen = c.generation
    assert(c.updateWhere("user_id >= 5000", Map("v" -> "0.0")).isEmpty)
    assert(c.generation == gen, "a no-op update must not commit")
  }

  test("deleteWhere refuses an empty filter") {
    val c = threeSliceColl(SparkTestSession.tmp("graft-del-guard"))
    intercept[IllegalArgumentException](c.deleteWhere(null))
    intercept[IllegalArgumentException](c.deleteWhere("  "))
  }
}
