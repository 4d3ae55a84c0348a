package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CDC change feed (round 6): [[Collection.changes]] computes the exact
  * row-level difference between two snapshots from the manifest file
  * diff alone — append commits surface as pure inserts with zero
  * diffing, rewrites pay one multiset difference bounded by their own
  * files, and content-preserving rewrites (compaction) cancel to an
  * empty feed.
  */
class ChangesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mk(lo: Long, hi: Long, day: Int, v: Double = 1.0) = (lo until hi)
    .map(i => (i, f"2024-01-$day%02d 08:00:00", i % 7, v))
    .toDF("id", "ts", "k", "v")
    .withColumn("ts", col("ts").cast("timestamp"))

  private def fresh(root: String, retain: Int = 4): Collection = {
    val c = Collection.create(spark, root, mk(0, 1, 1).schema, "ts",
      DatePartitioning("ts", "D"), statsColumns = Seq("id"),
      retainGenerations = retain)
    c.insert(mk(0, 100, 1), MergeStrategy.Concat)
    c
  }

  private def feed(c: Collection, g0: Long, g1: Long): Map[String, Seq[(Long, Double)]] =
    c.changes(g0, g1)
      .select(col(Collection.ChangeTypeCol), col("id"), col("v"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sortBy(_._1).toSeq }

  test("append-only commits: every new row an insert, no deletes, no old files read") {
    val c = fresh(SparkTestSession.tmp("graft-cdc-append"))
    val g0 = c.generation
    c.insert(mk(100, 150, 2), MergeStrategy.Concat)
    val g1 = c.generation

    val f = feed(c, g0, g1)
    assert(f.getOrElse("delete", Nil).isEmpty, "append must produce no deletes")
    assert(f("insert").map(_._1) == (100L until 150L).toSeq)

    // file-granular: the scan behind the feed reads ONLY the files the
    // range added — the 100 pre-existing rows' files never appear
    val planFiles = c.changes(g0, g1).queryExecution.executedPlan.toString
    val oldFiles = c.manifestAt(g0).files
    oldFiles.foreach(fname =>
      assert(!planFiles.contains(fname.split('/').last),
        s"append-range CDC must not read pre-existing file $fname"))
  }

  test("updateWhere surfaces exactly the changed rows as delete+insert; carried rows cancel") {
    val c = fresh(SparkTestSession.tmp("graft-cdc-update"))
    val g0 = c.generation
    c.updateWhere("id >= 40 and id < 45", Map("v" -> "v + 10.0"))
    val g1 = c.generation

    val f = feed(c, g0, g1)
    assert(f("delete") == (40L until 45L).map(i => (i, 1.0)).toSeq,
      s"deletes must carry the OLD values: ${f("delete")}")
    assert(f("insert") == (40L until 45L).map(i => (i, 11.0)).toSeq,
      s"inserts must carry the NEW values: ${f("insert")}")
  }

  test("compaction is invisible: a content-preserving rewrite yields an empty feed") {
    val c = fresh(SparkTestSession.tmp("graft-cdc-compact"))
    c.insert(mk(100, 130, 1), MergeStrategy.Concat) // fragment day 1
    val g0 = c.generation
    val compacted = c.compact()
    assert(compacted.nonEmpty, "test needs a real rewrite")
    val g1 = c.generation
    assert(g1 > g0 && c.manifestAt(g0).files != c.manifestAt(g1).files,
      "compaction must have replaced files")
    assert(c.changes(g0, g1).isEmpty, "a pure rewrite must cancel to an empty feed")
  }

  test("deleteWhere: deletes carry old rows; a range spanning several commits composes") {
    val c = fresh(SparkTestSession.tmp("graft-cdc-delete"))
    val g0 = c.generation
    c.insert(mk(100, 120, 3), MergeStrategy.Concat)
    c.deleteWhere("id >= 90 and id < 110")
    val g2 = c.generation

    // across the whole range: net effect = insert 110..119, delete 90..99
    val f = feed(c, g0, g2)
    assert(f("insert").map(_._1) == (110L until 120L).toSeq,
      s"net inserts must exclude rows deleted within the range: ${f("insert")}")
    assert(f("delete").map(_._1) == (90L until 100L).toSeq,
      s"net deletes are the pre-range rows that vanished: ${f("delete")}")
  }

  test("schema evolution inside the range: both sides read under the TO schema") {
    val c = fresh(SparkTestSession.tmp("graft-cdc-schema"))
    val g0 = c.generation
    c.addVariable("w", org.apache.spark.sql.types.DoubleType, fill = Some("0.5"))
    c.deleteWhere("id >= 95")
    val g1 = c.generation

    val del = c.changes(g0, g1)
      .where(col(Collection.ChangeTypeCol) === "delete")
      .select("id", "w").collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(del.map(_._1).toSeq == (95L until 100L).toSeq)
    // pre-evolution files lack `w` physically; the TO-side fill applies
    assert(del.forall(_._2 == 0.5), s"deletes must surface the fill value: ${del.toSeq}")
  }

  test("TIMESTAMP AS OF: commit stamps resolve generations; age window retains files") {
    val c = fresh(SparkTestSession.tmp("graft-asof"))
    val g1 = c.generation
    val t1 = c.manifestAt(g1).committedAtMs.get
    Thread.sleep(5)
    c.insert(mk(100, 110, 2), MergeStrategy.Concat)
    val g2 = c.generation
    val t2 = c.manifestAt(g2).committedAtMs.get
    assert(t2 >= t1, "commit stamps must not go backwards on one writer")

    // between the two commits -> the first snapshot; before both -> none
    assert(c.generationAsOf(t1).contains(g1))
    assert(c.generationAsOf(t2).contains(g2))
    if (t2 > t1) assert(c.generationAsOf(t2 - 1).contains(g1))
    assert(c.generationAsOf(t1 - 1000000).isEmpty)
    intercept[IllegalArgumentException](c.snapshotAsOf(t1 - 1000000))
    assert(c.snapshotAsOf(t1).count() == 100)
    assert(c.snapshotAsOf(t2).count() == 110)

    // age-based retention: files referenced ONLY by generations outside
    // the COUNT window survive vacuum while inside the TIME window
    val c2 = fresh(SparkTestSession.tmp("graft-asof-age"), retain = 1)
    val gBase = c2.generation
    c2.updateWhere("id < 5", Map("v" -> "9.0"))
    c2.updateWhere("id < 5", Map("v" -> "10.0"))
    val orig = c2.manifestAt(gBase).files.toSet -- c2.currentManifest().files.toSet
    assert(orig.nonEmpty, "the double update must have replaced files")
    def exists(f: String) =
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"${c2.root}/$f"))
    c2.vacuum(graceMs = 0L, retainMillis = 24L * 3600 * 1000)
    orig.foreach(f => assert(exists(f), s"age-retained file $f must survive"))
    // dry run names the victims without touching them
    val would = c2.vacuum(graceMs = 0L, dryRun = true).toSet
    assert(orig.subsetOf(would), s"dry run must report $orig, got $would")
    orig.foreach(f => assert(exists(f), "dry run must delete nothing"))
    c2.vacuum(graceMs = 0L)
    orig.foreach(f => assert(!exists(f), s"count-expired file $f must be reclaimed"))
  }

  test("restore rolls content back as a new commit; CDC sees the inverse; layout change refuses") {
    val c = fresh(SparkTestSession.tmp("graft-restore"))
    val g0 = c.generation
    val before = c.query().select("id", "v").as[(Long, Double)].collect().sorted.toSeq
    c.updateWhere("id >= 40 and id < 45", Map("v" -> "v + 10.0"))
    c.insert(mk(200, 210, 3), MergeStrategy.Concat)
    val gMut = c.generation

    c.restore(g0)
    val after = c.query().select("id", "v").as[(Long, Double)].collect().sorted.toSeq
    assert(after == before, "restore must reproduce the old snapshot exactly")
    assert(c.generation == gMut + 1, "restore is a NEW commit, history intact")
    assert(c.manifestAt(c.generation).op.contains("restore"))

    // CDC across the restore = the inverse of the undone mutations
    val f = feed(c, gMut, c.generation)
    assert(f("delete").map(_._1).toSeq == ((40L until 45L) ++ (200L until 210L)).toSeq,
      s"undone rows must surface as deletes: ${f("delete")}")
    assert(f("insert") == (40L until 45L).map(i => (i, 1.0)).toSeq,
      s"restored old values surface as inserts: ${f("insert")}")

    // post-restore writes mint FRESH row ids (taskBase never rolls back)
    c.insert(mk(300, 305, 4), MergeStrategy.Concat)
    assert(c.query().count() == 105)

    // refusals: future generation, non-past, cross-layout
    intercept[IllegalArgumentException](c.restore(c.generation))
    val evolved = c.changePartitioning(DatePartitioning("ts", "h"))
    intercept[IllegalArgumentException](evolved.restore(g0))
  }

  test("describeHistory: every commit carries its operation label and stamp") {
    val c = fresh(SparkTestSession.tmp("graft-history"))
    c.updateWhere("id == 1", Map("v" -> "2.0"))
    c.deleteWhere("id == 2")
    c.addVariable("w", org.apache.spark.sql.types.DoubleType)
    c.compact()
    c.insert(mk(500, 505, 4), MergeStrategy.Concat)

    val h = c.describeHistory().orderBy("generation").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getString(2)))
    // gen 0 = create (pre-label empty manifest), then the labeled ops
    assert(h.map(_._2).toSeq.drop(1) ==
      Seq("insert", "update", "delete", "add-column", "compact", "insert"),
      s"history labels: ${h.toSeq}")
    val stamps = c.describeHistory().where(col("generation") > 0)
      .select("committed_at_ms").collect()
    assert(stamps.forall(!_.isNullAt(0)), "every labeled commit is stamped")
  }

  test("changesSince targets the head; bad generations refuse loudly") {
    val c = fresh(SparkTestSession.tmp("graft-cdc-since"))
    val g0 = c.generation
    c.insert(mk(200, 210, 4), MergeStrategy.Concat)
    assert(c.changesSince(g0).count() == 10)
    intercept[IllegalArgumentException](c.changes(g0 + 999, c.generation))
    intercept[IllegalArgumentException](c.changes(c.generation, g0))
  }
}
