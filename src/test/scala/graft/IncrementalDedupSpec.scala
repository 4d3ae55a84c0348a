package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Persisted fingerprint index + incremental exact dedup (round 6).
  *
  * The contract: [[Dedup.buildFingerprintIndex]] stores one
  * `(bucket, fp, doc_id)` row per distinct normalized-text fingerprint;
  * [[Dedup.dedupAgainstIndex]] drops batch docs whose fingerprint is
  * indexed (keep-first within the batch) while reading ONLY the buckets
  * the batch hashes into; [[Dedup.appendFingerprints]] admits only new
  * fingerprints, preserving original representatives.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("end-to-end: indexed texts drop, fresh texts survive keep-first") {
    val idx = Dedup.buildFingerprintIndex(spark,
      SparkTestSession.tmp("graft-fpidx-e2e"),
      docs(1L -> "alpha beta", 2L -> "gamma delta", 3L -> "epsilon"),
      "doc_id", "text", nBuckets = 4)

    val batch = docs(
      10L -> "ALPHA   beta", // normalizes to an indexed text -> drop
      11L -> "fresh one",
      12L -> "fresh one",    // within-batch dup -> keep 11 only
      13L -> "epsilon",      // indexed -> drop
      14L -> "fresh two")
    val out = Dedup.dedupAgainstIndex(idx, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(11L, 14L), s"survivors: $out")
  }

  test("the index read is partition-pruned to the batch's buckets") {
    // 40 distinct texts spread over 8 buckets; a one-doc batch touches
    // exactly the bucket its fingerprint hashes into
    val corpus = docs((1L to 40L).map(i => i -> s"document number $i"): _*)
    val idx = Dedup.buildFingerprintIndex(spark,
      SparkTestSession.tmp("graft-fpidx-prune"), corpus, "doc_id", "text",
      nBuckets = 8)
    val allParts = idx.partitions().length
    assert(allParts > 4, s"test needs a spread index, got $allParts partitions")

    val one = docs(99L -> "document number 7")
    val fp = one.select(graft.functions.TextFunctions.fingerprint(col("text")))
      .collect()(0).getLong(0)
    val bucket = java.lang.Math.floorMod(fp, 8L)
    val report = idx.explainPruning(s"bucket in ($bucket)")
    assert(report.partitionsKept == 1,
      s"one-bucket filter must keep exactly one partition: $report")
    assert(Dedup.dedupAgainstIndex(idx, one, "doc_id", "text").count() == 0)
  }

  test("appendFingerprints: new fps land, existing keep their original representative") {
    val idx = Dedup.buildFingerprintIndex(spark,
      SparkTestSession.tmp("graft-fpidx-append"),
      docs(5L -> "kept text"), "doc_id", "text", nBuckets = 4)

    Dedup.appendFingerprints(idx,
      docs(50L -> "kept text", 51L -> "new text"), "doc_id", "text")

    val rows = idx.query().select("fp", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.size == 2, s"exactly two fingerprints expected: $rows")
    assert(rows.values.toSet == Set(5L, 51L),
      s"'kept text' must keep representative 5, got ${rows.values.toSet}")

    // idempotent: a replayed append admits nothing
    Dedup.appendFingerprints(idx, docs(60L -> "new text"), "doc_id", "text")
    assert(idx.query().count() == 2)
  }

  test("minhash index: exact copies and close paraphrases drop, fresh docs survive") {
    val words = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 60).map(i => s"tok$i") :+ "extra").mkString(" ") // j ~ 0.95
    val far = (1 to 60).map(i => s"other$i word$i").mkString(" ")
    val root = SparkTestSession.tmp("graft-mhidx")
    Dedup.buildMinhashIndex(spark, root,
      docs(1L -> words, 2L -> far), "doc_id", "text", nBuckets = 8)

    val batch = docs(
      10L -> words,                 // exact re-ingest: est = 1.0 -> drop
      11L -> near,                  // close paraphrase: est ~0.95 -> drop
      12L -> (1 to 60).map(i => s"fresh$i piece$i").mkString(" "))
    val out = Dedup.dedupNearAgainstIndex(spark, root, batch, "doc_id", "text",
        minEstJaccard = 0.8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(12L), s"survivors: $out")

    // a batch with no banding collision reads nothing and keeps all
    val none = docs(20L -> (1 to 40).map(i => s"qq$i rr$i").mkString(" "))
    assert(Dedup.dedupNearAgainstIndex(spark, root, none, "doc_id", "text")
      .count() == 1)
  }

  test("fnv hash mode: attr-dispatched, bit-identical to the reference chain") {
    // driver-side reference of the FNV chain: shingle string -> FNV-1a
    // byte fold -> perm p folds byte p -> signed min per position
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    def refSig(text: String, k: Int, perms: Int): Seq[Long] = {
      val t = text.trim.split("\\s+").toSeq
      val shingles =
        (if (t.length >= k) t.sliding(k).map(_.mkString(" ")).toSeq.distinct
         else Seq(t.mkString(" "))).map(fnv)
      (0 until perms).map(p => shingles.map(h => (h ^ p) * 0x100000001b3L).min)
    }
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val got = docs(1L -> text)
      .select(graft.dedup.MinHashSig.signature(
        graft.functions.ShingleHashes.shingles(
          split(trim(col("text")), "\\s+"), 3, fnv = true), 64, fnv = true).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(got == refSig(text, 3, 64), "fnv signature must match the reference chain")

    // an index built with fnvHash=true records the attr and the batch
    // side follows it — same drop verdicts as the xxhash64 spec above
    val words = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 60).map(i => s"tok$i") :+ "extra").mkString(" ")
    val root = SparkTestSession.tmp("graft-mhidx-fnv")
    val (bc, _) = Dedup.buildMinhashIndex(spark, root,
      docs(1L -> words, 2L -> (1 to 60).map(i => s"other$i word$i").mkString(" ")),
      "doc_id", "text", nBuckets = 8, fnvHash = true)
    assert(bc.attrs(Dedup.MinhashHashAttr) == "fnv1a")
    val out = Dedup.dedupNearAgainstIndex(spark, root,
        docs(10L -> words, 11L -> near,
             12L -> (1 to 60).map(i => s"fresh$i piece$i").mkString(" ")),
        "doc_id", "text", minEstJaccard = 0.8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(12L), s"survivors: $out")
  }

  test("containment index: both prefix directions, append growth, threshold guard, randomized completeness (r10e)") {
    val root = SparkTestSession.tmp("graft-cnidx")
    def ds(rows: (Long, Seq[Long])*) = rows.toDF("doc_id", "sh")
    val corpus = ds(
      1L -> (1L to 10L),          // C1
      2L -> (100L to 104L),       // C2 (small: tests the index-prefix direction)
      3L -> Seq(200L, 201L))
    Dedup.buildContainmentIndex(spark, root, corpus, "doc_id", col("sh"),
      threshold = 0.9, nBuckets = 4)
    val batch = ds(
      10L -> (1L to 9L),          // subset of C1: batch side smaller, 9/9 = 1.0
      11L -> ((100L to 104L) ++ Seq(900L, 901L, 902L)), // superset of C2: 5/5 = 1.0
      12L -> ((1L to 5L) ++ (300L to 304L)),            // 5/10 = 0.5 < 0.9
      13L -> Seq(400L, 401L))                           // unrelated
    val got = Dedup.containmentAgainstIndex(spark, root, batch, "doc_id",
        col("sh"), threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((10L, 1L, 1.0), (11L, 2L, 1.0)), s"got $got")
    // append: a later batch matches the appended doc — fixed hash order
    // keeps stored prefixes recall-complete as the corpus grows
    Dedup.appendContainment(spark, root, ds(4L -> (500L to 509L)), "doc_id", col("sh"))
    val got2 = Dedup.containmentAgainstIndex(spark, root,
        ds(20L -> (500L to 508L)), "doc_id", col("sh"), threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == Set((20L, 4L)), s"got2 $got2")
    // a query threshold BELOW the build threshold needs longer prefixes
    // than the index stores: refused, not silently incomplete
    intercept[IllegalArgumentException](
      Dedup.containmentAgainstIndex(spark, root, batch, "doc_id", col("sh"), 0.8))
    // seeded randomized completeness vs brute force, small hot universe
    val rnd = new scala.util.Random(4242)
    def randSets(ids: Range) = ids.map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(10))(rnd.nextInt(30).toLong).distinct))
    val corp2 = randSets(0 until 40)
    val bat2 = randSets(100 until 130)
    val root2 = SparkTestSession.tmp("graft-cnidx-rnd")
    Dedup.buildContainmentIndex(spark, root2, corp2.toDF("doc_id", "sh"),
      "doc_id", col("sh"), threshold = 0.7, nBuckets = 8)
    val got3 = Dedup.containmentAgainstIndex(spark, root2,
        bat2.toDF("doc_id", "sh"), "doc_id", col("sh"), threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want3 = (for {
      (b, sb) <- bat2; (c, sc) <- corp2
      inter = sb.toSet.intersect(sc.toSet).size
      if inter.toDouble / math.min(sb.size, sc.size) >= 0.7
    } yield (b, c)).toSet
    assert(got3 == want3, s"missed=${want3 -- got3} extra=${got3 -- want3}")
    // SELF-PAIR exclusion (r11 ADVICE): a batch doc whose id is already
    // in the index must not meet itself at containment 1.0 — an
    // append-then-query caller would otherwise drop every appended doc
    Dedup.appendContainment(spark, root, ds(30L -> (600L to 609L)), "doc_id", col("sh"))
    val again = Dedup.containmentAgainstIndex(spark, root,
        ds(30L -> (600L to 609L)), "doc_id", col("sh"), threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again.isEmpty, s"self-pairs leaked: $again")
  }

  test("over-cap batches skip the IN-list and stay exact (r14, r13 verdict #3)") {
    // force the bounded-keys cap to 0 so EVERY batch counts as
    // over-cap: the incremental paths must drop the collected
    // `bucket in (...)` pruning predicate, query the index unpruned,
    // and return bit-identical verdicts (the IN-list is a skip hint,
    // never correctness)
    val idx = Dedup.buildFingerprintIndex(spark,
      SparkTestSession.tmp("graft-fpidx-cap"),
      docs(1L -> "alpha beta", 2L -> "gamma delta", 3L -> "epsilon"),
      "doc_id", "text", nBuckets = 4)
    val batch = docs(
      10L -> "ALPHA   beta", 11L -> "fresh one", 12L -> "fresh one",
      13L -> "epsilon", 14L -> "fresh two")
    val pruned = Dedup.dedupAgainstIndex(idx, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    System.setProperty("graft.dedup.pruneCap", "0")
    try {
      assert(Dedup.pruneCap == 0)
      val unpruned = Dedup.dedupAgainstIndex(idx, batch, "doc_id", "text")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(unpruned == pruned, s"unpruned path must match: $unpruned vs $pruned")
      // append under the cap=0 regime: still lands only the new fps
      val appended = Dedup.appendFingerprints(idx,
        docs(20L -> "fresh one", 21L -> "epsilon"), "doc_id", "text")
      assert(appended.nonEmpty)
      assert(Dedup.dedupAgainstIndex(idx, docs(30L -> "fresh one"),
        "doc_id", "text").count() == 0, "appended fp must now dedup")
    } finally System.clearProperty("graft.dedup.pruneCap")
  }

  test("a non-index collection refuses loudly") {
    val df = docs(1L -> "x").withColumn("fp", lit(1L)).withColumn("bucket", lit(0L))
    val c = graft.core.Collection.create(spark,
      SparkTestSession.tmp("graft-fpidx-refuse"), df.schema, "fp",
      graft.core.SequencePartitioning(Seq("bucket"), "fp"))
    c.insert(df)
    intercept[IllegalArgumentException](
      Dedup.dedupAgainstIndex(c, docs(2L -> "y"), "doc_id", "text"))
  }
}
