package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.{Collection, SequencePartitioning}

/** Property harness for the r12 file/byte admission control: over
  * RANDOM histories (seeded — random commit sizes before AND after the
  * stream starts) and RANDOM caps, the paced drain must reassemble
  * EXACTLY the head snapshot plus every post-start diff: no loss, no
  * duplication, every batch within its caps (modulo the single-file
  * progress guarantee), and a restart from any intermediate offset must
  * deliver exactly the remainder. */
class AdmissionPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("paced drain reassembles exactly under random histories, caps, and restart points") {
    val rnd = new scala.util.Random(20260815L)
    for (round <- 1 to 4) {
      val root = SparkTestSession.tmp(s"admission-prop-$round")
      var next = 0L
      def mk(n: Int) = {
        val ids = (next until next + n); next += n
        ids.map(i => (i, i.toDouble)).toDF("cargo", "v")
      }
      val first = mk(1 + rnd.nextInt(6))
      val c = Collection.create(spark, root, first.schema, "cargo",
        SequencePartitioning(Seq("cargo"), "cargo"))
      c.insert(first)
      (1 to rnd.nextInt(3)).foreach(_ => c.insert(mk(1 + rnd.nextInt(5))))
      val startHead = c.generation

      val (maxF, maxB) =
        if (rnd.nextBoolean()) (Some(1L + rnd.nextInt(4)), None)
        else (None, Some(1L + rnd.nextInt(2000).toLong))
      def mkSource() = new GraftCollectionSource(spark, root,
        maxFilesPerBatch = maxF, maxBytesPerBatch = maxB)
      var src = mkSource()

      // fresh-start contract: the first batches drain the snapshot AT
      // THE HEAD the stream saw; post-start commits arrive as diffs
      var expected = src.genList(startHead, snap = true)

      var cur = GraftStreamOffset.Initial
      var delivered = Vector.empty[String]
      val restartAt = 1 + rnd.nextInt(4)
      val commitAt = 1 + rnd.nextInt(4)
      val postGens = 1 + rnd.nextInt(3)
      var committed = false
      var batch = 0
      var guard = 0
      var continue = true
      while (guard < 200 && continue) {
        src.nextPaced(cur, None) match {
          case Some(nx) =>
            val files = src.batchFilesAt(if (cur.gen < 0) None else Some(cur), nx)._2
            maxF.foreach(m => assert(files.size <= m,
              s"batch of ${files.size} exceeds file cap $m"))
            delivered ++= files
            cur = nx; batch += 1
            if (batch == restartAt) { // crash + recover mid-drain
              src = mkSource()
              src.paceTo(cur)
            }
            if (batch == commitAt && !committed) { // mid-stream commits
              committed = true
              (1 to postGens).foreach(_ => c.insert(mk(1 + rnd.nextInt(5))))
              expected ++= ((startHead + 1) to c.generation)
                .flatMap(g => src.genList(g, snap = false))
            }
          case None =>
            if (!committed) { // drained before the commit point fired
              committed = true
              (1 to postGens).foreach(_ => c.insert(mk(1 + rnd.nextInt(5))))
              expected ++= ((startHead + 1) to c.generation)
                .flatMap(g => src.genList(g, snap = false))
            } else continue = false
        }
        guard += 1
      }

      // multiset equality: a complete-to-complete range batch delivers
      // in shard-traversal order (the legacy diff), so only PARTIAL
      // batches promise sorted order — exactly-once is the invariant
      assert(delivered.distinct.size == delivered.size,
        s"round $round: a file was delivered twice")
      assert(delivered.sorted == expected.sorted,
        s"round $round (maxF=$maxF maxB=$maxB restart@$restartAt commit@$commitAt): " +
          s"paced drain must reassemble exactly — got ${delivered.size} of " +
          s"${expected.size} files")
      assert(cur == GraftStreamOffset.complete(c.generation))
    }
  }
}
