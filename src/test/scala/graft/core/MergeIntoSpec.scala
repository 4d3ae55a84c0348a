package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** General MERGE INTO (round 6).
  *
  * Contract: SQL MERGE semantics on `on` equality (NULL keys never
  * match), file-granular — the source's key bounds prune through the
  * zone maps, unaffected files carry over by name — one atomic commit.
  */
class MergeIntoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Three Concat inserts into ONE day-partition with disjoint user_id
    * ranges (0-49, 100-149, 200-249), user_id zone maps per file. */
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

  private def src(rows: Seq[(Long, String, Long, Double)]) = rows
    .toDF("id", "ts", "user_id", "v")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("UpdateAll + insert: matched replaced, unmatched kept, new rows land; pruning by key bounds") {
    val c = threeSliceColl(SparkTestSession.tmp("graft-mrg-upd"))
    val before = c.currentManifest().files
    val stats = c.currentManifest().statsForFiles(before)
    // source keys span [120, 304]: the 0-49 file is provably unaffected
    val mustKeep = before.filter(f => stats(f)("user_id").hi.toLong < 120).toSet
    assert(mustKeep.nonEmpty)

    val source = src(
      (120L until 130L).map(i => (i + 9000, "2024-01-01 12:00:00", i, 99.0)) ++
      (300L until 305L).map(i => (i, "2024-01-02 10:00:00", i, 7.0)))
    val touched = c.mergeInto(source, on = Seq("user_id")).toSet
    assert(touched == before.toSet -- mustKeep,
      s"expected exactly the key-range-admitting files, got $touched")
    val after = c.currentManifest().files.toSet
    mustKeep.foreach(f => assert(after.contains(f), s"unaffected file $f must carry over"))

    val got = c.query().select("user_id", "v", "id")
      .as[(Long, Double, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got.size == 155, "150 original + 5 inserted")
    (120L until 130L).foreach(i => assert(got(i) == ((99.0, i + 9000)), s"key $i must take the source row"))
    (300L until 305L).foreach(i => assert(got(i) == ((7.0, i)), s"key $i must insert"))
    assert(got(110L) == ((1.0, 110L)) && got(200L)._1 == 1.0, "unmatched target rows unchanged")
    // inserted rows landed in their own partition (their axis decides)
    assert(c.partitions().contains("year=2024/month=1/day=2"))
  }

  test("Update(assignments): t./s. expressions, unassigned columns keep target values") {
    val c = threeSliceColl(SparkTestSession.tmp("graft-mrg-asg"))
    val source = src((100L until 110L).map(i => (i + 5000, "2024-01-01 12:00:00", i, 10.0)))
    c.mergeInto(source, on = Seq("user_id"),
      whenMatched = WhenMatched.Update(Map("v" -> "t.v + s.v")),
      insertUnmatched = false)
    val got = c.query().select("user_id", "v", "id")
      .as[(Long, Double, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    (100L until 110L).foreach { i =>
      assert(got(i) == ((11.0, i)), s"key $i: v = t.v + s.v, id stays the target's")
    }
    assert(got(120L) == ((1.0, 120L)))
    assert(got.size == 150, "insertUnmatched=false adds nothing")
  }

  test("Update deleteWhen: matched rows satisfying the clause are removed, NULL keeps") {
    val c = threeSliceColl(SparkTestSession.tmp("graft-mrg-delwhen"))
    // s.v = -t.v for user 100..104 (update drives v to 0 -> delete),
    // +10 for 105..109 (plain update)
    val source = src(
      (100L until 105L).map(i => (i + 5000, "2024-01-01 12:00:00", i, -1.0)) ++
      (105L until 110L).map(i => (i + 6000, "2024-01-01 12:00:00", i, 10.0)))
    c.mergeInto(source, on = Seq("user_id"),
      whenMatched = WhenMatched.Update(Map("v" -> "t.v + s.v"),
        deleteWhen = Some("t.v + s.v = 0")),
      insertUnmatched = false)
    val got = c.query().select("user_id", "v")
      .as[(Long, Double)].collect().toMap
    (100L until 105L).foreach(i => assert(!got.contains(i), s"key $i must be deleted"))
    (105L until 110L).foreach(i => assert(got(i) == 11.0, s"key $i must update"))
    assert(got.size == 145, "150 - 5 deleted")
  }

  test("Delete: matched rows removed; unmatched source dropped when insertUnmatched=false") {
    val c = threeSliceColl(SparkTestSession.tmp("graft-mrg-del"))
    val source = src(
      (140L until 150L).map(i => (i, "2024-01-01 12:00:00", i, 0.0)) ++
      Seq((999L, "2024-01-01 12:00:00", 999L, 0.0))) // matches nothing
    c.mergeInto(source, on = Seq("user_id"),
      whenMatched = WhenMatched.Delete, insertUnmatched = false)
    val ids = c.query().select("user_id").as[Long].collect().sorted.toSeq
    assert(ids == ((0L until 50L) ++ (100L until 140L) ++ (200L until 250L)).toSeq)
  }

  test("NULL source keys never match and insert under SQL semantics") {
    val root = SparkTestSession.tmp("graft-mrg-null")
    val df = Seq((1L, "2024-01-01 08:00:00", Some(5L), 1.0), (2L, "2024-01-01 09:00:00", Some(6L), 1.0))
      .toDF("id", "ts", "user_id", "v").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(df)
    val source = Seq((9L, "2024-01-01 10:00:00", None: Option[Long], 9.0))
      .toDF("id", "ts", "user_id", "v").withColumn("ts", col("ts").cast("timestamp"))
    c.mergeInto(source, on = Seq("user_id"))
    val rows = c.query().select("id", "user_id").as[(Long, Option[Long])].collect().toSet
    assert(rows == Set((1L, Some(5L)), (2L, Some(6L)), (9L, None)),
      "the NULL-key source row inserts; no target row is touched")
  }

  test("insertProjection (r12): explicit-column insert — mapped exprs, NULL unmapped, narrow source") {
    val c = threeSliceColl(SparkTestSession.tmp("graft-mrg-proj"))
    // NARROW source: only the key + the columns the projection reads —
    // a projected merge must not require target-shaped sources
    val s = Seq((30L, 5.0), (300L, 7.0), (301L, 8.0))
      .toDF("user_id", "nv")
    val touched = c.mergeInto(s, Seq("user_id"),
      whenMatched = WhenMatched.UpdateCols(Map("v" -> col("s.nv")), None),
      insertUnmatched = true,
      insertGate = Some(col("s.nv") > 7.0),
      insertProjection = Some(Map(
        "user_id" -> col("s.user_id"),
        "ts"      -> lit("2024-01-02 00:00:00").cast("timestamp"),
        "v"       -> (col("s.nv") * 10.0))))
    // matched 30 updates; 300 fails the gate; 301 inserts projected
    val rows = c.query().where(col("user_id").isin(30L, 300L, 301L))
      .select("user_id", "id", "v").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(rows == Seq((30L, 30L, 5.0), (301L, -1L, 80.0)),
      s"projected merge: update + gated projected insert with NULL id, got $rows")
    assert(touched.nonEmpty)
  }

  test("guards: duplicate source keys, unknown keys, axis assignment") {
    val c = threeSliceColl(SparkTestSession.tmp("graft-mrg-guard"))
    val dup = src(Seq((1L, "2024-01-01 08:00:00", 7L, 1.0), (2L, "2024-01-01 09:00:00", 7L, 2.0)))
    intercept[IllegalArgumentException](c.mergeInto(dup, on = Seq("user_id")))
    intercept[IllegalArgumentException](c.mergeInto(dup.limit(1), on = Seq("nope")))
    intercept[IllegalArgumentException](c.mergeInto(dup.limit(1), on = Seq("user_id"),
      whenMatched = WhenMatched.Update(Map("ts" -> "s.ts"))))
    intercept[IllegalArgumentException](c.mergeInto(dup.limit(1), on = Seq("user_id"),
      whenMatched = WhenMatched.Update(Map("user_id" -> "s.user_id"))))
  }
}
