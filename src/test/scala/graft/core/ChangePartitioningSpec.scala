package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** In-place partition evolution (round 6): [[Collection.changePartitioning]]
  * rewrites the collection under a new layout in one atomic, rewrite-marked
  * commit whose manifest stamp is authoritative; stale handles refuse.
  */
object ChangePartitioningSpec {
  /** Driver-side collector for the restart test (foreachBatch runs on
    * the driver; a local-mode executor singleton would also work). */
  val seenIds: java.util.Set[java.lang.Long] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()
}

class ChangePartitioningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mk(vals: (Long, String, Long, Double)*) = vals
    .toDF("id", "ts", "k", "v").withColumn("ts", col("ts").cast("timestamp"))

  private def fresh(root: String, retain: Int = 4): Collection = {
    val df = mk(
      (1L, "2024-01-01 08:00:00", 0L, 1.0), (2L, "2024-01-01 12:00:00", 1L, 2.0),
      (3L, "2024-01-02 08:00:00", 2L, 3.0), (4L, "2024-01-03 16:00:00", 0L, 4.0))
    val c = Collection.create(spark, root, df.schema, "ts",
      DatePartitioning("ts", "D"), retainGenerations = retain)
    c.insert(df)
    c
  }

  private def rows(c: Collection): Seq[(Long, Long, Double)] =
    c.query().select("id", "k", "v").as[(Long, Long, Double)]
      .collect().sortBy(_._1).toSeq

  test("day -> hour: same rows, new paths, new partition keys queryable") {
    val root = SparkTestSession.tmp("graft-evolve")
    val c = fresh(root)
    val before = rows(c)
    val g0 = c.generation

    val c2 = c.changePartitioning(DatePartitioning("ts", "h"))
    assert(rows(c2) == before, "evolution must preserve every row")
    assert(c2.partitions().forall(_.contains("hour=")),
      s"paths must follow the new layout: ${c2.partitions()}")
    // the new partition keys drive pruning
    val got = c2.query("hour == 8").select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L), s"hour filter: $got")
    // the evolution is rewrite-marked and content-preserving: CDC cancels
    assert(c2.changes(g0, c2.generation).isEmpty,
      "a pure layout rewrite must produce an empty change feed")
  }

  test("stale handles refuse loudly; reopen resolves the new layout") {
    val root = SparkTestSession.tmp("graft-evolve-stale")
    val c = fresh(root)
    val c2 = c.changePartitioning(DatePartitioning("ts", "h"))

    val ex = intercept[IllegalStateException](c.query().count())
    assert(ex.getMessage.contains("repartitioned"), ex.getMessage)
    intercept[IllegalStateException](c.insert(mk((9L, "2024-01-04 10:00:00", 3L, 9.0))))

    val reopened = Collection.open(spark, root)
    assert(rows(reopened) == rows(c2))
    // and the reopened handle can write under the new layout
    reopened.insert(mk((9L, "2024-01-04 10:00:00", 3L, 9.0)), MergeStrategy.Concat)
    assert(reopened.partitions().exists(_.contains("day=4")))
  }

  test("manifest stamp is authoritative over a stale config (crash before repair)") {
    val root = SparkTestSession.tmp("graft-evolve-cfg")
    val c = fresh(root)
    val oldSpec = Collection.specJson(c.partitioning)
    c.changePartitioning(DatePartitioning("ts", "h"))

    // simulate the crash window: restore the config's OLD partitioning
    val fs = Collection.fileSystem(spark, root)
    val cfg = new org.apache.hadoop.fs.Path(s"$root/${Collection.ConfigFile}")
    val in: java.io.InputStream = fs.open(cfg)
    val doc =
      try new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(in, classOf[java.util.Map[String, Object]])
      finally in.close()
    doc.put("partitioning", new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(oldSpec, classOf[java.util.Map[String, Object]]))
    Collection.writeJson(fs, cfg, doc)

    val reopened = Collection.open(spark, root)
    assert(Collection.specJson(reopened.partitioning) != oldSpec,
      "open must trust the head manifest's layout stamp over the config")
    assert(reopened.query("hour == 8").count() == 2)
  }

  test("streams fail LOUDLY on a repartition; a restarted stream skips the rewrite") {
    val root = SparkTestSession.tmp("graft-evolve-stream")
    val ckpt = SparkTestSession.tmp("graft-evolve-ckpt")
    val c = fresh(root)
    val seen = ChangePartitioningSpec.seenIds
    seen.clear()
    def start(coll: Collection) = graft.streaming.StreamOps.readStream(spark, coll)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.select("id").collect().foreach(r =>
          seen.add(java.lang.Long.valueOf(r.getLong(0)))); ()
      }.start()

    val q = start(c)
    val c2 =
      try {
        q.processAllAvailable()
        assert(seen.size == 4)
        // an old-layout handle cannot interpret the new paths: the live
        // stream must DIE with the reopen error, never mis-read
        val evolved = c.changePartitioning(DatePartitioning("ts", "h"))
        val ex = intercept[Exception](q.processAllAvailable())
        assert(ex.getMessage.contains("repartitioned"), ex.getMessage)
        evolved
      } finally q.stop()

    // a RESTARTED stream (fresh source handle, new layout) resumes from
    // the checkpoint: the all-rewrites + global-row-total check keeps
    // the evolution batch empty — no re-delivery — and later commits
    // stream normally
    val before = seen.size
    val q2 = start(c2)
    try {
      q2.processAllAvailable()
      assert(seen.size == before,
        s"repartition must not re-deliver: ${seen.size} vs $before")
      c2.insert(mk((9L, "2024-01-04 10:00:00", 1L, 9.0)), MergeStrategy.Concat)
      q2.processAllAvailable()
      assert(seen.contains(java.lang.Long.valueOf(9L)) && seen.size == before + 1,
        s"post-evolution commit must stream: $seen")
    } finally q2.stop()
  }

  test("a non-date layout: day tree re-bucketed by a data column") {
    val root = SparkTestSession.tmp("graft-evolve-seq")
    val c = fresh(root)
    val before = rows(c)
    val c2 = c.changePartitioning(GroupedSequencePartitioning(Seq("k"), "ts", size = 2))
    assert(rows(c2) == before)
    assert(c2.partitions().forall(_.contains("k_group=")), s"${c2.partitions()}")
    // identical spec refuses; wrong axis refuses
    intercept[IllegalArgumentException](
      c2.changePartitioning(GroupedSequencePartitioning(Seq("k"), "ts", size = 2)))
    intercept[IllegalArgumentException](
      c2.changePartitioning(DatePartitioning("v", "D")))
  }
}
