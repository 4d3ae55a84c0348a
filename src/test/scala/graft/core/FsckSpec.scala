package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** `fsck` — manifest ↔ filesystem integrity (round 6).
  *
  * Contract: shallow = one tree listing diffed both ways (missing /
  * orphan files) + statless count; deep = footer row counts re-read and
  * compared against the manifest's recorded counts. fsck never mutates.
  */
class FsckSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def coll(root: String): Collection = {
    // three day-partitions with different row counts (34/33/33)
    val df = (0 until 100)
      .map(i => (i.toLong, s"2024-01-0${1 + i % 3} 10:00:00", i.toDouble))
      .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val c = Collection.create(spark, root, df.schema, "ts", DatePartitioning("ts", "D"))
    c.insert(df)
    c
  }

  test("clean collection: clean report, deep included; fsck never commits") {
    val c = coll(SparkTestSession.tmp("graft-fsck-clean"))
    val gen = c.generation
    val r = c.fsck(deep = true)
    assert(r.clean, s"expected clean, got $r")
    assert(r.filesChecked > 0)
    assert(r.missingFiles.isEmpty && r.orphanFiles.isEmpty && r.rowCountMismatches.isEmpty)
    assert(c.generation == gen, "fsck must not commit")
  }

  test("a data file deleted behind the manifest's back is reported missing") {
    val c = coll(SparkTestSession.tmp("graft-fsck-missing"))
    val victim = c.currentManifest().files.head
    val fs = new Path(c.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new Path(s"${c.root}/$victim"), false))
    val r = c.fsck()
    assert(!r.clean)
    assert(r.missingFiles == Seq(victim))
  }

  test("a stray data file in a partition dir is an orphan; retained older generations are not") {
    val c = coll(SparkTestSession.tmp("graft-fsck-orphan"))
    val fs = new Path(c.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partDir = new Path(s"${c.root}/${c.partitions().head}")
    val stray = new Path(partDir, "part-stray-00000.parquet")
    val out = fs.create(stray)
    out.write("not parquet".getBytes); out.close()
    val r = c.fsck()
    assert(r.clean, "an orphan alone does not make the snapshot corrupt")
    assert(r.orphanFiles.exists(_.endsWith("part-stray-00000.parquet")))

    // files referenced only by a RETAINED older generation are not orphans:
    // compact() replaces every file but the old snapshot stays readable
    fs.delete(stray, false)
    c.compact()
    val r2 = c.fsck()
    assert(r2.clean && r2.orphanFiles.isEmpty,
      s"retained-generation files must not be flagged, got ${r2.orphanFiles}")
  }

  test("deep fsck catches a swapped file whose footer row count disagrees") {
    val c = coll(SparkTestSession.tmp("graft-fsck-deep"))
    val man = c.currentManifest()
    // pick two files with different recorded row counts and overwrite one
    // with the other's bytes — existence checks pass, the footer lies
    val rows = man.shards.flatMap(e => man.shardData(e).rows).toMap
    val (fa, ra) = rows.head
    val other = rows.find(_._2 != ra)
    assume(other.isDefined, "fixture needs two files with different row counts")
    val (fb, _) = other.get
    val fs = new Path(c.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"${c.root}/$fa"), false)
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new Path(s"${c.root}/$fb"), fs, new Path(s"${c.root}/$fa"),
      false, spark.sparkContext.hadoopConfiguration)

    assert(c.fsck().clean, "shallow check cannot see the swap")
    val deep = c.fsck(deep = true)
    assert(!deep.clean)
    assert(deep.rowCountMismatches.exists { case (f, rec, act) =>
      f == fa && rec == ra && act == rows(fb)
    }, s"expected $fa recorded=$ra actual=${rows(fb)}, got ${deep.rowCountMismatches}")
  }

  test("deep fsck reports a file whose footer cannot be opened at all (r10e)") {
    // truncation (or checksum damage) makes the footer read THROW; the
    // row-count compare would silently skip such a file — it must land
    // in unreadableFiles instead (every read touching it will fail)
    val c = coll(SparkTestSession.tmp("graft-fsck-trunc"))
    val man = c.currentManifest()
    val victim = man.shards.flatMap(e => man.shardData(e).files).sorted.head
    val p = java.nio.file.Paths.get(s"${c.root}/$victim")
    val ch = java.nio.file.Files.newByteChannel(p,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.truncate(10L) finally ch.close()
    assert(c.fsck().clean, "shallow check cannot see the truncation")
    val deep = c.fsck(deep = true)
    assert(!deep.clean)
    assert(deep.unreadableFiles == Seq(victim),
      s"expected $victim unreadable, got ${deep.unreadableFiles}")
    assert(deep.missingFiles.isEmpty && deep.rowCountMismatches.isEmpty,
      s"truncation must not double-report: $deep")
  }
}
