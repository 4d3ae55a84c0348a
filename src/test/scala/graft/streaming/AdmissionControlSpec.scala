package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.{Collection, SequencePartitioning}

/** r12: admission control BELOW generation granularity —
  * `maxFilesPerBatch` / `maxBytesPerBatch` split one bulk commit into k
  * bounded micro-batches over [[GraftStreamOffset]] `(generation,
  * fileOrdinal)` positions, exactly-once across restarts. */
class AdmissionControlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // ---- offset codec ------------------------------------------------

  test("offset json: complete form is the bare legacy long; partial round-trips") {
    assert(GraftStreamOffset.complete(7L).json == "7")
    assert(GraftStreamOffset.parse("7") == GraftStreamOffset.complete(7L))
    assert(GraftStreamOffset.parse(" 42\n") == GraftStreamOffset.complete(42L))
    val p = GraftStreamOffset(3L, 5L, snap = true)
    assert(GraftStreamOffset.parse(p.json) == p)
    val d = GraftStreamOffset(9L, 0L, snap = false)
    assert(GraftStreamOffset.parse(d.json) == d)
    // position order: partial inside a generation precedes its complete form
    assert(GraftStreamOffset.complete(3L) >= p)
    assert(!(p >= GraftStreamOffset.complete(3L)))
    assert(GraftStreamOffset(3L, 6L, snap = true) >= p)
    assert(GraftStreamOffset.complete(4L) >= GraftStreamOffset.complete(3L))
  }

  // ---- engine-level pacing (deterministic, no streaming query) -----

  /** One BULK commit spread over `n` partitions (one file each). */
  private def bulkCollection(n: Int, tag: String): Collection = {
    val root = SparkTestSession.tmp(s"admission-$tag")
    import spark.implicits._
    val df = (1 to n).map(i => (i.toLong, i.toDouble)).toDF("cargo", "v")
    val c = Collection.create(spark, root, df.schema, "cargo",
      SequencePartitioning(Seq("cargo"), "cargo"))
    c.insert(df)
    c
  }

  private def src(c: Collection, maxFiles: Option[Long] = None,
                  maxBytes: Option[Long] = None): GraftCollectionSource =
    new GraftCollectionSource(spark, c.root,
      maxFilesPerBatch = maxFiles, maxBytesPerBatch = maxBytes)

  test("nextPaced splits one bulk snapshot into ceil(files/cap) batches; slices reassemble exactly") {
    val c = bulkCollection(6, "split")
    val s = src(c, maxFiles = Some(2L))
    val snapshot = s.genList(1L, snap = true)
    assert(snapshot.size == 6, s"expected one file per partition, got $snapshot")

    var cur = GraftStreamOffset.Initial
    var batches = Vector.empty[Seq[String]]
    var steps = 0
    while (steps < 20 && { val n = s.nextPaced(cur, None); n.exists(_ != cur) && {
      val next = n.get
      val (_, files) = s.batchFilesAt(
        if (cur.gen < 0) None else Some(cur), next)
      batches :+= files
      cur = next
      true
    }}) steps += 1

    assert(batches.size == 3, s"6 files / cap 2 = 3 batches, got ${batches.size}")
    assert(batches.forall(_.size <= 2), s"every batch within the cap: $batches")
    assert(batches.flatten == snapshot,
      "slices must reassemble the exact sorted snapshot, no loss, no dup")
    assert(cur == GraftStreamOffset.complete(1L), s"drain ends complete, got $cur")
    assert(s.nextPaced(cur, None).isEmpty, "no progress past the head")
  }

  test("restart mid-split resumes at the checkpointed ordinal (fresh source instance)") {
    val c = bulkCollection(5, "restart")
    val s1 = src(c, maxFiles = Some(2L))
    val o1 = s1.nextPaced(GraftStreamOffset.Initial, None).get
    val (_, b1) = s1.batchFilesAt(None, o1)
    assert(o1 == GraftStreamOffset(1L, 2L, snap = true) && b1.size == 2)

    // crash here; a NEW source re-seeds from the checkpointed o1
    val s2 = src(c, maxFiles = Some(2L))
    s2.paceTo(o1)
    val o2 = s2.nextPaced(s2.pacedPosition, None).get
    val (_, b2) = s2.batchFilesAt(Some(o1), o2)
    val o3 = s2.nextPaced(o2, None).get
    val (_, b3) = s2.batchFilesAt(Some(o2), o3)
    assert(o3 == GraftStreamOffset.complete(1L))
    assert((b1 ++ b2 ++ b3) == s2.genList(1L, snap = true),
      "restart mid-commit must deliver the remaining files exactly once")
  }

  test("maxBytesPerBatch paces by manifest sizes; an oversized single file still admits") {
    val c = bulkCollection(4, "bytes")
    // every parquet file here is a few hundred bytes: cap 1 byte forces
    // one file per batch (progress guarantee), never zero
    val s = src(c, maxBytes = Some(1L))
    var cur = GraftStreamOffset.Initial
    var batches = 0
    var delivered = Vector.empty[String]
    var guard = 0
    while (guard < 20 && { val n = s.nextPaced(cur, None); n.isDefined && {
      val next = n.get
      delivered ++= s.batchFilesAt(if (cur.gen < 0) None else Some(cur), next)._2
      cur = next; batches += 1; true
    }}) guard += 1
    assert(batches == 4, s"1-byte cap = one file per batch, got $batches")
    assert(delivered == s.genList(1L, snap = true))
  }

  test("post-snapshot commits: a small commit passes whole, an oversized one splits") {
    val c = bulkCollection(2, "incr")
    val s = src(c, maxFiles = Some(2L))
    val o1 = s.nextPaced(GraftStreamOffset.Initial, None).get
    assert(o1 == GraftStreamOffset.complete(1L), "2 files fit the cap whole")

    import spark.implicits._
    // gen 2: one partition -> 1 file (under cap, passes complete)
    c.insert(Seq((10L, 10.0)).toDF("cargo", "v"))
    // gen 3: three partitions -> 3 files (over cap, splits)
    c.insert(Seq((20L, 20.0), (21L, 21.0), (22L, 22.0)).toDF("cargo", "v"))

    val o2 = s.nextPaced(o1, None).get
    assert(o2 == GraftStreamOffset.complete(2L),
      s"small commit delivers whole (and never merges into the oversized next), got $o2")
    val o3 = s.nextPaced(o2, None).get
    assert(o3 == GraftStreamOffset(3L, 2L, snap = false), s"oversized commit splits, got $o3")
    val o4 = s.nextPaced(o3, None).get
    assert(o4 == GraftStreamOffset.complete(3L))
    val all = s.batchFilesAt(Some(o2), o3)._2 ++ s.batchFilesAt(Some(o3), o4)._2
    assert(all == s.genList(3L, snap = false), "split commit reassembles exactly")
  }

  test("multiple small commits coalesce into one batch up to the cap") {
    val c = bulkCollection(1, "coalesce")
    val s = src(c, maxFiles = Some(3L))
    assert(s.nextPaced(GraftStreamOffset.Initial, None).get ==
      GraftStreamOffset.complete(1L))
    import spark.implicits._
    c.insert(Seq((10L, 1.0)).toDF("cargo", "v")) // gen 2: 1 file
    c.insert(Seq((11L, 1.0)).toDF("cargo", "v")) // gen 3: 1 file
    c.insert(Seq((12L, 1.0)).toDF("cargo", "v")) // gen 4: 1 file
    c.insert(Seq((13L, 1.0)).toDF("cargo", "v")) // gen 5: 1 file
    val o = s.nextPaced(GraftStreamOffset.complete(1L), None).get
    assert(o == GraftStreamOffset.complete(4L),
      s"3 one-file commits coalesce under cap 3, the 4th waits, got $o")
  }

  test("startingGeneration + file caps: a fresh DSv2-face stream paces from the base (r13)") {
    val c = bulkCollection(2, "startgen")
    import spark.implicits._
    // gen 2: three partitions -> 3 files (over the cap of 2, must split)
    c.insert(Seq((10L, 1.0), (11L, 1.0), (12L, 1.0)).toDF("cargo", "v"))
    val s = new GraftCollectionSource(spark, c.root,
      startingGeneration = Some(1L), maxFilesPerBatch = Some(2L))
    // The DSv2 face seeds its position at Initial (gen -1), not at
    // complete(startBase): the pacer must clamp to the base instead of
    // walking the boundary path into manifestAt(-1) (r13 regression).
    val o1 = s.nextPaced(GraftStreamOffset.Initial, None).get
    assert(o1 == GraftStreamOffset(2L, 2L, snap = false),
      s"first paced batch = first 2 files of the diff AFTER gen 1, got $o1")
    val o2 = s.nextPaced(o1, None).get
    assert(o2 == GraftStreamOffset.complete(2L), s"drain completes gen 2, got $o2")
    val files = s.batchFilesAt(None, o1)._2 ++ s.batchFilesAt(Some(o1), o2)._2
    assert(files == s.genList(2L, snap = false),
      "no snapshot backfill: exactly the post-base diff, split across batches")
    assert(s.nextPaced(o2, None).isEmpty, "no progress past the head")
  }

  test("file/byte caps refuse the change feed; non-positive caps refuse") {
    val c = bulkCollection(1, "refuse")
    intercept[IllegalArgumentException] {
      new GraftCollectionSource(spark, c.root, changeFeed = true,
        maxFilesPerBatch = Some(2L))
    }
    intercept[IllegalArgumentException] {
      new GraftCollectionSource(spark, c.root, maxFilesPerBatch = Some(0L))
    }
    intercept[IllegalArgumentException] {
      new GraftCollectionSource(spark, c.root, maxBytesPerBatch = Some(-1L))
    }
  }

  // ---- end-to-end through the V1 face -------------------------------

  test("format(graft) streams one bulk commit in k bounded batches, exactly once") {
    val c = bulkCollection(6, "e2e")
    val q = StreamOps.readStream(spark, c, Map("maxFilesPerBatch" -> "2"))
      .writeStream.format("memory").queryName("admission_e2e")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("admission-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("admission_e2e").collect()
        .map(_.getAs[Long]("cargo")).sorted.toSeq
      assert(rows == (1L to 6L), s"exactly-once across split batches, got $rows")
      val fed = q.recentProgress.filter(_.numInputRows > 0)
      assert(fed.length == 3,
        s"6 files / cap 2 = 3 non-empty micro-batches, got ${fed.length}")
      assert(fed.forall(_.numInputRows == 2))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains a paced V1-face stream to the head in one trigger (r13)") {
    val c = bulkCollection(5, "anv1")
    val q = StreamOps.readStream(spark, c, Map("maxFilesPerBatch" -> "2"))
      .writeStream.format("memory").queryName("admission_anv1")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("admission-anv1-ckpt").toString)
      .start()
    assert(q.awaitTermination(120000), "AvailableNow must self-terminate")
    val rows = spark.table("admission_anv1").collect()
      .map(_.getAs[Long]("cargo")).sorted.toSeq
    assert(rows == (1L to 5L),
      s"the V1 face must drain ALL paced batches in one trigger, got $rows")
  }

  test("unpaced streams emit byte-identical legacy offsets (bare generation numbers)") {
    val c = bulkCollection(2, "legacy")
    val q = StreamOps.readStream(spark, c)
      .writeStream.format("memory").queryName("admission_legacy")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("admission-legacy-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val end = q.lastProgress.sources.head.endOffset
      assert(end.trim == "1", s"legacy offset must stay a bare generation, got '$end'")
    } finally q.stop()
  }
}
